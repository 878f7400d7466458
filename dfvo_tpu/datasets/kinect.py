"""Kinect capture loader (TUM RGB-D directory format with Kinect intrinsics
and integer frame naming; ref libs/datasets/kinect.py:22-250)."""

import os

import numpy as np

from ..evaluation.tum_tool import associate, read_file_list
from ..utils.io import (
    convert_SE3_to_arr,
    load_poses_from_txt_tum,
    read_depth,
    read_image,
    save_traj,
)
from .tum import TUM

# factory intrinsics at 1920x1080, delivered at 640x480
# (ref kinect.py:132-144)
_KINECT_PARAMS = [972.34, 532.64, 1032.66, 1033.17]  # cx, cy, fx, fy
_RAW = (1080.0, 1920.0)
_DELIVERED = (480.0, 640.0)


class Kinect(TUM):
    pose_file_name = "keyframe_trajectory_mono.txt"

    def get_intrinsics_param(self):
        cx, cy, fx, fy = _KINECT_PARAMS
        # raw -> delivered -> configured size
        cx = cx / _RAW[1] * _DELIVERED[1]
        cy = cy / _RAW[0] * _DELIVERED[0]
        fx = fx / _RAW[1] * _DELIVERED[1]
        fy = fy / _RAW[0] * _DELIVERED[0]
        sy = self.cfg.image.height / _DELIVERED[0]
        sx = self.cfg.image.width / _DELIVERED[1]
        return [cx * sx, cy * sy, fx * sx, fy * sy]

    def synchronize_timestamps(self):
        base = os.path.join(self.data_dir["img"], "..")
        rgb_list = read_file_list(os.path.join(base, "rgb.txt"))
        depth_list = read_file_list(os.path.join(base, "depth.txt"))
        pose_list = read_file_list(os.path.join(base, self.pose_file_name))

        self.rgb_d_pose_pair = {t: {} for t in rgb_list}
        for rgb_t, d_t in associate(rgb_list, depth_list, 0, 0.02):
            self.rgb_d_pose_pair[rgb_t]["depth"] = d_t
        for rgb_t, p_t in associate(rgb_list, pose_list, 0, 0.02):
            self.rgb_d_pose_pair[rgb_t]["pose"] = p_t
        self.rgb_d_pose_pair = {
            t: v
            for t, v in self.rgb_d_pose_pair.items()
            if "depth" in v and "pose" in v
        }

    def get_gt_poses(self):
        return load_poses_from_txt_tum(
            os.path.join(
                self.cfg.directory.gt_pose_dir,
                self.cfg.seq,
                self.pose_file_name,
            )
        )

    def get_image(self, timestamp):
        # kinect frames are named by integer index = timestamp / 0.1
        # (ref kinect.py:203-216)
        path = os.path.join(
            self.data_dir["img"],
            f"{int(timestamp / 0.1)}.{self.cfg.image.ext}",
        )
        return read_image(path, self.cfg.image.height, self.cfg.image.width)

    def get_depth(self, timestamp):
        d_t = self.rgb_d_pose_pair[timestamp]["depth"]
        if self.data_dir["depth_src"] != "gt":
            raise ValueError("Proper depth loader should be defined.")
        return read_depth(
            os.path.join(self.data_dir["depth"], f"{int(d_t / 0.1)}.png"),
            5000,
            [self.cfg.image.height, self.cfg.image.width],
        )
