"""Evaluation-harness tests: self-consistency on real KITTI GT and parity
with the reference eval tool."""

import os
import sys

import numpy as np
import pytest

from dfvo_tpu.evaluation import KittiEvalOdom, umeyama_alignment
from dfvo_tpu.utils.io import load_poses_from_txt

REF_GT = "/root/reference/dataset/kitti_odom/gt_poses"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_GT), reason="reference GT not mounted"
)


def perturbed(poses, drift=0.001, seed=0):
    """GT with small accumulating drift — a plausible VO output."""
    rng = np.random.RandomState(seed)
    out = {}
    T_drift = np.eye(4)
    keys = sorted(poses.keys())
    prev = None
    for k in keys:
        if prev is not None:
            rel = np.linalg.inv(poses[prev]) @ poses[k]
            step = np.eye(4)
            step[:3, 3] = rng.randn(3) * drift
            T_drift = T_drift @ rel @ step
        out[k] = T_drift.copy()
        prev = k
    return out


class TestEval:
    def test_gt_vs_itself_zero_error(self, tmp_path):
        e = KittiEvalOdom()
        poses = load_poses_from_txt(os.path.join(REF_GT, "10.txt"))
        m = e.eval_seq(poses, poses, alignment="6dof")
        assert m["t_err_percent"] < 1e-6
        assert m["r_err_deg_per_100m"] < 1e-6
        assert m["ate"] < 1e-9

    def test_scaled_trajectory_fixed_by_scale_alignment(self):
        e = KittiEvalOdom()
        poses = load_poses_from_txt(os.path.join(REF_GT, "10.txt"))
        scaled = {k: p.copy() for k, p in poses.items()}
        for k in scaled:
            scaled[k][:3, 3] *= 0.5
        m_no = e.eval_seq(poses, scaled, alignment=None)
        m_scale = e.eval_seq(poses, scaled, alignment="scale")
        assert m_no["t_err_percent"] > 10
        assert m_scale["t_err_percent"] < 1e-6

    def test_matches_reference_eval_tool(self):
        """Numbers must match the reference KittiEvalOdom on the same data."""
        sys.path.insert(0, "/root/reference")
        from tools.evaluation.odometry.kitti_odometry import (
            KittiEvalOdom as RefEval,
        )

        poses = load_poses_from_txt(os.path.join(REF_GT, "10.txt"))
        pred = perturbed(poses, drift=0.02)

        ours = KittiEvalOdom()
        m = ours.eval_seq(poses, pred, alignment="6dof")

        ref = RefEval()
        gt_a, pred_a = ours.align_poses(poses, pred, "6dof")
        ref_err = ref.calc_sequence_errors(gt_a, pred_a)
        ref_t = np.mean(np.asarray(ref_err)[:, 2]) * 100
        ref_r = np.mean(np.asarray(ref_err)[:, 1]) / np.pi * 180 * 100
        ref_ate = ref.compute_ATE(gt_a, pred_a)

        assert abs(m["t_err_percent"] - ref_t) < 1e-9
        assert abs(m["r_err_deg_per_100m"] - ref_r) < 1e-9
        assert abs(m["ate"] - ref_ate) < 1e-9

    def test_umeyama_recovers_similarity(self):
        rng = np.random.RandomState(1)
        x = rng.randn(3, 200)
        from dfvo_tpu.utils.io import quat2mat

        q = rng.randn(4)
        R = quat2mat(q / np.linalg.norm(q))
        t = np.array([1.0, -2.0, 0.5])
        c = 2.3
        y = c * (R @ x) + t[:, None]
        r_est, t_est, c_est = umeyama_alignment(x, y, with_scale=True)
        np.testing.assert_allclose(r_est, R, atol=1e-9)
        np.testing.assert_allclose(t_est, t, atol=1e-9)
        assert abs(c_est - c) < 1e-9

    def test_eval_directory_flow(self, tmp_path):
        """Full directory-level eval with txt output files."""
        from dfvo_tpu.utils.io import save_traj

        poses = load_poses_from_txt(os.path.join(REF_GT, "10.txt"))
        pred = perturbed(poses, drift=0.01)
        result_dir = tmp_path / "result"
        gt_dir = tmp_path / "gt"
        result_dir.mkdir()
        gt_dir.mkdir()
        save_traj(str(result_dir / "10.txt"), pred)
        save_traj(str(gt_dir / "10.txt"), poses)
        e = KittiEvalOdom()
        summary = e.eval(str(gt_dir), str(result_dir), alignment="6dof")
        assert "10" in summary
        assert (result_dir / "result.txt").exists()
        assert (result_dir / "errors" / "10.txt").exists()
        assert (result_dir / "plot_path" / "sequence_10.pdf").exists()
