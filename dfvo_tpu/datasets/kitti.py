"""KITTI odometry / raw dataset loaders (ref libs/datasets/kitti.py:18-277)."""

import os
from glob import glob

import numpy as np

from ..utils.io import (
    convert_SE3_to_arr,
    load_kitti_odom_intrinsics,
    load_kitti_raw_intrinsics,
    load_poses_from_txt,
    read_depth,
    read_image,
    save_traj,
)
from .dataset import Dataset
from .oxts import load_poses_from_oxts


class KITTI(Dataset):
    """Shared KITTI behavior: integer frame ids, KITTI-format trajectories."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.stereo_baseline = 0.54

    def synchronize_timestamps(self):
        self.rgb_d_pose_pair = {}
        len_seq = len(
            glob(
                os.path.join(
                    self.data_dir["img"], f"*.{self.cfg.image.ext}"
                )
            )
        )
        for i in range(len_seq):
            self.rgb_d_pose_pair[i] = {"depth": i, "pose": i}

    def get_timestamp(self, img_id):
        return img_id

    def save_result_traj(self, traj_txt, poses):
        save_traj(traj_txt, convert_SE3_to_arr(poses), format="kitti")


class KittiOdom(KITTI):
    """KITTI odometry split (sequences 00-21, calib.txt intrinsics)."""

    def get_intrinsics_param(self):
        seq_dir = os.path.join(self.cfg.directory.img_seq_dir, self.cfg.seq)
        return load_kitti_odom_intrinsics(
            os.path.join(seq_dir, "calib.txt"),
            self.cfg.image.height,
            self.cfg.image.width,
        )[2]

    def get_data_dir(self):
        seq_dir = os.path.join(self.cfg.directory.img_seq_dir, self.cfg.seq)
        data_dir = {
            "img": os.path.join(seq_dir, "image_2"),
            "depth_src": self.cfg.depth.depth_src,
        }
        if data_dir["depth_src"] == "gt":
            data_dir["depth"] = os.path.join(
                str(self.cfg.directory.depth_dir), "gt", self.cfg.seq
            )
        elif data_dir["depth_src"] is None:
            data_dir["depth"] = None
        else:
            raise ValueError(
                f"Wrong depth src [{data_dir['depth_src']}] is given."
            )
        return data_dir

    def get_gt_poses(self):
        return load_poses_from_txt(
            os.path.join(
                self.cfg.directory.gt_pose_dir, f"{self.cfg.seq}.txt"
            )
        )

    def get_image_path(self, timestamp):
        return os.path.join(
            self.data_dir["img"],
            f"{timestamp:06d}.{self.cfg.image.ext}",
        )

    def get_image(self, timestamp):
        return read_image(
            self.get_image_path(timestamp),
            self.cfg.image.height,
            self.cfg.image.width,
        )

    def get_depth(self, timestamp):
        img_id = self.rgb_d_pose_pair[timestamp]["depth"]
        if self.data_dir["depth_src"] == "gt":
            img_name = f"{img_id:010d}.png"
            scale_factor = 500
        else:
            img_name = f"depth/{img_id:06d}.png"
            scale_factor = 1000
        return read_depth(
            os.path.join(self.data_dir["depth"], img_name),
            scale_factor,
            [self.cfg.image.height, self.cfg.image.width],
        )


class KittiRaw(KITTI):
    """KITTI raw recordings (drive dirs, OXTS GPS/IMU ground truth)."""

    def get_intrinsics_param(self):
        date_dir = os.path.join(
            self.cfg.directory.img_seq_dir, self.cfg.seq[:10]
        )
        return load_kitti_raw_intrinsics(
            os.path.join(date_dir, "calib_cam_to_cam.txt"),
            self.cfg.image.height,
            self.cfg.image.width,
        )[2]

    def get_data_dir(self):
        seq_dir = os.path.join(
            self.cfg.directory.img_seq_dir, self.cfg.seq[:10], self.cfg.seq
        )
        data_dir = {
            "img": os.path.join(seq_dir, "image_02/data"),
            "depth_src": self.cfg.depth.depth_src,
        }
        if data_dir["depth_src"] == "gt":
            data_dir["depth"] = os.path.join(
                str(self.cfg.directory.depth_dir), self.cfg.seq
            )
        elif data_dir["depth_src"] is None:
            data_dir["depth"] = None
        else:
            raise ValueError(
                f"Wrong depth src [{data_dir['depth_src']}] is given."
            )
        return data_dir

    def get_gt_poses(self):
        oxts_dir = os.path.join(
            self.cfg.directory.gt_pose_dir,
            self.cfg.seq[:10],
            self.cfg.seq,
            "oxts/data",
        )
        return load_poses_from_oxts(oxts_dir)

    def get_image_path(self, timestamp):
        return os.path.join(
            self.data_dir["img"],
            f"{timestamp:010d}.{self.cfg.image.ext}",
        )

    def get_image(self, timestamp):
        return read_image(
            self.get_image_path(timestamp),
            self.cfg.image.height,
            self.cfg.image.width,
        )

    def get_depth(self, timestamp):
        img_id = self.rgb_d_pose_pair[timestamp]["depth"]
        return read_depth(
            os.path.join(self.data_dir["depth"], f"{img_id:010d}.png"),
            500,
            [self.cfg.image.height, self.cfg.image.width],
        )
