"""Oxford RobotCar dataset loader (ref libs/datasets/oxford_robotcar.py:22-211).

Consumes pre-undistorted images (see tools/undistort_robotcar.py) in
``<seq>/undistorted_stereo/centre``, with intrinsics from the SDK model
files, bottom-20%-cropped frames (hood removal), and VO-interpolated GT.
"""

import os
from glob import glob

import numpy as np

from ..utils.io import convert_SE3_to_arr, read_image, save_traj
from .dataset import Dataset
from .robotcar_sdk import interpolate_vo_poses

# camera-frame permutation between RobotCar VO frame and camera convention
_T_PERM = np.array(
    [
        [0, 1, 0, 0],
        [0, 0, 1, 0],
        [1, 0, 0, 0],
        [0, 0, 0, 1],
    ],
    dtype=np.float64,
)


class OxfordRobotCar(Dataset):
    def __init__(self, cfg):
        self.time_offset = 0
        # bottom 20% cropped away (vehicle hood), ref oxford_robotcar.py:102-104
        self.y_crop = [0.0, 0.8]
        self.x_crop = [0.0, 1.0]
        super().__init__(cfg)

    def get_intrinsics_param(self):
        ref_height, ref_width = 960, 1280
        intrinsic_txt = os.path.join(
            self.cfg.directory.img_seq_dir,
            "robotcar-dataset-sdk",
            "models",
            "stereo_narrow_left.txt",
        )
        fx, fy, cx, cy = np.loadtxt(intrinsic_txt)[0][:4]
        K = np.eye(3)
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy

        crop_h = int(ref_height * (self.y_crop[1] - self.y_crop[0]))
        crop_w = int(ref_width * (self.x_crop[1] - self.x_crop[0]))
        K[0, 2] -= int(ref_width * self.x_crop[0])
        K[1, 2] -= int(ref_height * self.y_crop[0])
        K[0] *= self.cfg.image.width / crop_w
        K[1] *= self.cfg.image.height / crop_h
        return [K[0, 2], K[1, 2], K[0, 0], K[1, 1]]

    def get_data_dir(self):
        return {
            "img": os.path.join(
                self.cfg.directory.img_seq_dir,
                self.cfg.seq,
                "undistorted_stereo",
                "centre",
            ),
            "depth": None,
            "depth_src": None,
        }

    def synchronize_timestamps(self):
        timestamp_txt = os.path.join(
            self.cfg.directory.img_seq_dir, self.cfg.seq, "stereo.timestamps"
        )
        timestamps = np.loadtxt(timestamp_txt)[:, 0].astype(np.int64)
        self.rgb_d_pose_pair = {}
        len_seq = len(
            glob(
                os.path.join(self.data_dir["img"], f"*.{self.cfg.image.ext}")
            )
        )
        for i in range(self.time_offset, len_seq):
            self.rgb_d_pose_pair[timestamps[i]] = {"depth": i, "pose": i}

    def get_timestamp(self, img_id):
        return sorted(self.rgb_d_pose_pair.keys())[img_id]

    def get_image(self, timestamp):
        img_path = os.path.join(
            self.data_dir["img"],
            f"{timestamp:016d}.{self.cfg.image.ext}",
        )
        crop = [self.y_crop, self.x_crop]
        return read_image(
            img_path, self.cfg.image.height, self.cfg.image.width, crop
        )

    def get_depth(self, timestamp):
        raise NotImplementedError("RobotCar provides no depth data")

    def get_gt_poses(self):
        timestamp_txt = os.path.join(
            self.cfg.directory.gt_pose_dir, self.cfg.seq, "stereo.timestamps"
        )
        timestamps = list(np.loadtxt(timestamp_txt)[:, 0].astype(np.int64))
        vo_path = os.path.join(
            self.cfg.directory.gt_pose_dir, self.cfg.seq, "vo", "vo.csv"
        )
        poses = interpolate_vo_poses(
            vo_path, timestamps, timestamps[self.time_offset]
        )
        gt_poses = {}
        inv_perm = np.linalg.inv(_T_PERM)
        for i in range(self.time_offset, len(poses)):
            gt_poses[i - self.time_offset] = (
                _T_PERM @ np.asarray(poses[i]) @ inv_perm
            )
        return gt_poses

    def save_result_traj(self, traj_txt, poses):
        save_traj(traj_txt, convert_SE3_to_arr(poses), format="kitti")
