"""TUM RGB-D dataset loader (ref libs/datasets/tum.py:21-235)."""

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
from .dataset import Dataset

TUM_INTRINSICS = {
    "tum-1": [318.6, 255.3, 517.3, 516.5],  # fr1
    "tum-2": [325.1, 249.7, 520.9, 521.0],  # fr2
    "tum-3": [320.1, 247.6, 535.4, 539.2],  # fr3
}
TUM_RAW_SIZE = (480.0, 640.0)  # (h, w)


class TUM(Dataset):
    """TUM RGB-D sequences: RGB/depth/pose timestamp association with 0.02 s
    tolerance, TUM-format trajectory output."""

    def __init__(self, cfg):
        super().__init__(cfg)
        if self.cfg.directory.gt_pose_dir is not None:
            self.update_gt_pose()

    def get_intrinsics_param(self):
        cx, cy, fx, fy = TUM_INTRINSICS[self.cfg.dataset]
        raw_h, raw_w = TUM_RAW_SIZE
        sy = self.cfg.image.height / raw_h
        sx = self.cfg.image.width / raw_w
        return [cx * sx, cy * sy, fx * sx, fy * sy]

    def get_data_dir(self):
        seq_dir = os.path.join(self.cfg.directory.img_seq_dir, self.cfg.seq)
        data_dir = {
            "img": os.path.join(seq_dir, "rgb"),
            "depth_src": self.cfg.depth.depth_src,
        }
        if data_dir["depth_src"] == "gt":
            data_dir["depth"] = os.path.join(
                str(self.cfg.directory.depth_dir), self.cfg.seq, "depth"
            )
        elif data_dir["depth_src"] is None:
            data_dir["depth"] = None
        else:
            raise ValueError(
                f"Wrong depth src [{data_dir['depth_src']}] is given."
            )
        return data_dir

    def synchronize_timestamps(self):
        """Associate RGB-depth and RGB-pose timestamps (max diff 0.02 s,
        ref tum.py:32-98); drop frames lacking either."""
        base = os.path.join(self.data_dir["img"], "..")
        rgb_list = read_file_list(os.path.join(base, "rgb.txt"))
        depth_list = read_file_list(os.path.join(base, "depth.txt"))
        pose_list = read_file_list(os.path.join(base, "groundtruth.txt"))

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

    def update_gt_pose(self):
        """Re-express GT poses over the synchronized frames, re-based to the
        first synchronized frame (ref tum.py:102-116)."""
        stamps = sorted(self.rgb_d_pose_pair.keys())
        pose_0 = self.gt_poses[self.rgb_d_pose_pair[stamps[0]]["pose"]]
        inv0 = np.linalg.inv(pose_0)
        new_poses = {}
        for i, t in enumerate(stamps):
            new_poses[i] = inv0 @ self.gt_poses[self.rgb_d_pose_pair[t]["pose"]]
        self.gt_poses = new_poses

    def get_gt_poses(self):
        return load_poses_from_txt_tum(
            os.path.join(
                self.cfg.directory.gt_pose_dir, self.cfg.seq, "groundtruth.txt"
            )
        )

    def get_timestamp(self, img_id):
        return sorted(self.rgb_d_pose_pair.keys())[img_id]

    def get_image(self, timestamp):
        path = os.path.join(
            self.data_dir["img"], f"{timestamp:.6f}.{self.cfg.image.ext}"
        )
        return read_image(path, self.cfg.image.height, self.cfg.image.width)

    def get_depth(self, timestamp):
        d_t = self.rgb_d_pose_pair[timestamp]["depth"]
        if self.data_dir["depth_src"] != "gt":
            raise ValueError("Proper depth loader should be defined.")
        return read_depth(
            os.path.join(self.data_dir["depth"], f"{d_t:.6f}.png"),
            5000,
            [self.cfg.image.height, self.cfg.image.width],
        )

    def save_result_traj(self, traj_txt, poses):
        timestamps = sorted(self.rgb_d_pose_pair.keys())
        save_traj(
            traj_txt, convert_SE3_to_arr(poses, timestamps), format="tum"
        )
