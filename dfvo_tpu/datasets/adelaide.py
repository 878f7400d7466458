"""Adelaide driving-sequence loader — the "run your own dataset" template
(ref libs/datasets/adelaide.py:19-151 and docs run_own_dataset.rst)."""

import os
from glob import glob

import numpy as np

from ..utils.io import convert_SE3_to_arr, read_image, save_traj
from .dataset import Dataset

# reference capture resolutions per camera (ref adelaide.py:70-80)
_RAW_SIZE = {"adelaide1": (256, 832), "adelaide2": (512, 1664)}


class Adelaide(Dataset):
    def get_intrinsics_param(self):
        raw_h, raw_w = _RAW_SIZE[self.cfg.dataset]
        seq_dir = os.path.join(self.cfg.directory.img_seq_dir, self.cfg.seq)
        K = np.loadtxt(os.path.join(seq_dir, "cam.txt"))
        K = K.copy()
        K[0] *= self.cfg.image.width / raw_w
        K[1] *= self.cfg.image.height / raw_h
        return [K[0, 2], K[1, 2], K[0, 0], K[1, 1]]

    def get_data_dir(self):
        seq_dir = os.path.join(self.cfg.directory.img_seq_dir, self.cfg.seq)
        return {"img": seq_dir, "depth": None, "depth_src": None}

    def synchronize_timestamps(self):
        self.rgb_d_pose_pair = {}
        n = len(
            glob(
                os.path.join(self.data_dir["img"], f"*.{self.cfg.image.ext}")
            )
        )
        for i in range(n):
            self.rgb_d_pose_pair[i] = {"depth": i, "pose": i}

    def get_gt_poses(self):
        # no ground truth available for Adelaide sequences (ref docs)
        return {0: np.eye(4)}

    def get_timestamp(self, img_id):
        return img_id

    def get_image(self, timestamp):
        path = os.path.join(
            self.data_dir["img"], f"{timestamp:06d}.{self.cfg.image.ext}"
        )
        return read_image(path, self.cfg.image.height, self.cfg.image.width)

    def get_depth(self, timestamp):
        raise NotImplementedError("Adelaide has no depth data")

    def save_result_traj(self, traj_txt, poses):
        save_traj(traj_txt, convert_SE3_to_arr(poses), format="kitti")
