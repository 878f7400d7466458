"""Abstract dataset loader (ref libs/datasets/dataset.py:15-121).

Loaders provide intrinsics, data directories, RGB/depth/pose timestamp
synchronization, GT poses, and trajectory saving in the dataset's native
format. All image IO stays on the host; arrays feed the jitted device step.
"""

import numpy as np

from ..geometry.camera import Intrinsics


class Dataset:
    def __init__(self, cfg):
        self.cfg = cfg
        self.cam_intrinsics = Intrinsics(self.get_intrinsics_param())
        self.data_dir = self.get_data_dir()
        self.synchronize_timestamps()
        if self.cfg.directory.gt_pose_dir is not None:
            self.gt_poses = self.get_gt_poses()
        else:
            self.gt_poses = {0: np.eye(4)}

    def __len__(self):
        return len(self.rgb_d_pose_pair)

    # -- interface ---------------------------------------------------------
    def get_intrinsics_param(self):
        """-> [cx, cy, fx, fy] at the configured image size."""
        raise NotImplementedError

    def synchronize_timestamps(self):
        """Populate self.rgb_d_pose_pair: {rgb_ts: {'depth': ts, 'pose': ts}}."""
        raise NotImplementedError

    def get_data_dir(self):
        """-> {'img': dir, 'depth': dir|None, 'depth_src': 'gt'|None}."""
        raise NotImplementedError

    def get_gt_poses(self):
        """-> {frame: [4x4] array}."""
        raise NotImplementedError

    def get_timestamp(self, img_id):
        raise NotImplementedError

    def get_image(self, timestamp):
        """-> [H x W x 3] RGB uint8 array at the configured size."""
        raise NotImplementedError

    def get_depth(self, timestamp):
        """-> [H x W] depth array."""
        raise NotImplementedError

    def save_result_traj(self, traj_txt, poses):
        """Save {frame: SE3} trajectory in the dataset's eval format."""
        raise NotImplementedError
