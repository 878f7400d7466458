"""Offline frame visualization.

Rebuild of /root/reference/libs/general/frame_drawer.py:102-582 for headless
TPU hosts: the same composite layout (trajectory map on the left; depth,
forward/backward flow, flow-consistency and keypoint-match tiles on the
right) rendered to per-frame JPEGs and a final map.png — without the
interactive cv2 window/keyboard UI (no display on TPU pods).
"""

import os

import cv2
import numpy as np

from ..flowlib import flow_to_image
from ..utils.io import mkdir_if_not_exists


class FrameDrawer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.vis_cfg = cfg.visualization
        h = self.vis_cfg.window_h
        w = self.vis_cfg.window_w
        self.img = np.zeros((h, w, 3), np.uint8)

        # trajectory occupies the left half (ref frame_drawer.py:135-147)
        self.traj_h, self.traj_w = h, w // 2
        self.traj = np.zeros((self.traj_h, self.traj_w, 3), np.uint8)
        self.traj_scale = float(self.vis_cfg.trajectory.vis_scale or 1)
        self.mono_scale = float(self.vis_cfg.trajectory.mono_scale or 1)

        self.save_dir = os.path.join(cfg.directory.result_dir, "img")
        if self.vis_cfg.save_img:
            mkdir_if_not_exists(self.save_dir)

    # ------------------------------------------------------------------
    def _traj_xy(self, x, z):
        draw_scale = 1.0 * self.traj_scale
        tx = int(x * draw_scale) + self.traj_w // 2
        ty = int(z * draw_scale) + self.traj_h * 2 // 3
        return tx, self.traj_h - ty

    def draw_traj_point(self, pose, color):
        x, z = pose[0, 3] * self.mono_scale, pose[2, 3] * self.mono_scale
        tx, ty = self._traj_xy(x, z)
        if 0 <= tx < self.traj_w and 0 <= ty < self.traj_h:
            cv2.circle(self.traj, (tx, ty), 1, color, 1)

    def draw_frame(self, vo, out):
        """Compose and save the visualization for the current frame.

        Args:
            vo: the DFVO instance (for poses, images, dataset GT).
            out: the device step outputs (numpy-convertible).
        """
        # trajectory
        if self.vis_cfg.trajectory.vis_traj:
            self.draw_traj_point(
                vo.global_poses[vo.cur_data["id"]].pose, (0, 255, 0)
            )
        if (
            self.vis_cfg.trajectory.vis_gt_traj
            and vo.cur_data["id"] in vo.dataset.gt_poses
        ):
            self.draw_traj_point(
                vo.dataset.gt_poses[vo.cur_data["id"]], (0, 0, 255)
            )

        img = vo.cur_data["img"]
        tiles = []

        # keypoint matches on the current image (temporal arrows,
        # ref frame_drawer.py:328-359); inliers green, outliers red when
        # inlier_plot is enabled
        vis = cv2.cvtColor(img, cv2.COLOR_RGB2BGR).copy()
        kp_ref = np.asarray(out["kp_ref"])
        kp_cur = np.asarray(out["kp_cur"])
        valid = np.asarray(out["kp_valid"])
        inliers = np.asarray(out.get("inliers", valid))
        n_vis = int(self.vis_cfg.kp_match.kp_num)
        idx = np.where(valid)[0][:n_vis]
        inlier_plot = bool(self.vis_cfg.kp_match.vis_side.inlier_plot)
        for i in idx:
            p1 = tuple(np.round(kp_ref[i]).astype(int))
            p2 = tuple(np.round(kp_cur[i]).astype(int))
            color = (
                ((0, 255, 0) if inliers[i] else (0, 0, 255))
                if inlier_plot
                else (0, 255, 0)
            )
            cv2.line(vis, p1, p2, color, 1)
        tiles.append(vis)

        # depth (magma-ish inverse depth; ref frame_drawer.py:410-444)
        depth = np.asarray(out["depth_cur"])
        disp = np.zeros_like(depth)
        disp[depth > 0] = 1.0 / depth[depth > 0]
        if disp.max() > 0:
            disp_vis = (disp / disp.max() * 255).astype(np.uint8)
        else:
            disp_vis = disp.astype(np.uint8)
        tiles.append(cv2.applyColorMap(disp_vis, cv2.COLORMAP_MAGMA))

        # forward flow (middlebury colors)
        if self.vis_cfg.flow.vis_forward_flow and "flow_fwd" in out:
            tiles.append(
                cv2.cvtColor(
                    flow_to_image(np.asarray(out["flow_fwd"])),
                    cv2.COLOR_RGB2BGR,
                )
            )

        # forward-backward flow inconsistency (ref frame_drawer.py:461-512)
        if self.vis_cfg.flow.vis_flow_diff and "flow_diff" in out:
            fd = np.asarray(out["flow_diff"])
            fd_vis = np.clip(fd / 0.5 * 255, 0, 255).astype(np.uint8)
            tiles.append(cv2.applyColorMap(fd_vis, cv2.COLORMAP_JET))

        # compose: left = traj, right = stacked tiles
        n_tiles = max(len(tiles), 1)
        h2 = self.img.shape[0] // n_tiles
        w2 = self.img.shape[1] - self.traj_w
        self.img[:] = 0
        self.img[:, : self.traj_w] = cv2.resize(
            self.traj, (self.traj_w, self.img.shape[0])
        )
        for i, tile in enumerate(tiles):
            y0 = i * h2
            self.img[y0 : y0 + h2, self.traj_w :] = cv2.resize(tile, (w2, h2))

        if self.vis_cfg.save_img:
            cv2.imwrite(
                os.path.join(self.save_dir, f"{vo.cur_data['id']:06d}.jpg"),
                self.img,
            )

    def save_traj_map(self, path):
        cv2.imwrite(path, self.traj)
