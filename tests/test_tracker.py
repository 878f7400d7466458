"""Tracker-layer tests: E-tracker with GRIC voting, scale recovery, PnP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfvo_tpu.geometry.lie import make_se3, se3_inverse, so3_exp
from dfvo_tpu.tracker import compute_pose_2d2d, compute_pose_3d2d, find_scale_from_depth

H_IMG, W_IMG = 192, 640
K = np.array([[370.0, 0, 320.0], [0, 371.0, 96.0], [0, 0, 1.0]])
K_inv = np.linalg.inv(K)
Kj = jnp.array(K, jnp.float32)
Kij = jnp.array(K_inv, jnp.float32)


def scene(rng, n=600, planar=False, rot=(0.01, -0.02, 0.005), trans=(0.3, -0.1, 1.0), noise=0.2):
    if planar:
        X = rng.uniform([-8, -3, 15], [8, 3, 15], size=(n, 3))
    else:
        X = rng.uniform([-8, -3, 5], [8, 3, 40], size=(n, 3))
    R = np.asarray(so3_exp(jnp.array(rot, jnp.float32)), np.float64)
    t = np.array(trans)

    def project(P3):
        pix = (K @ P3.T).T
        return pix[:, :2] / pix[:, 2:]

    kp1 = project(X) + rng.randn(n, 2) * noise  # "current" view
    kp2 = project(X @ R.T + t) + rng.randn(n, 2) * noise  # "reference" view
    return kp1, kp2, R, t, X


def rot_angle_deg(Ra, Rb):
    return np.degrees(
        np.arccos(np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1))
    )


class TestComputePose2d2d:
    def test_accepts_parallax_scene(self):
        rng = np.random.RandomState(0)
        kp_cur, kp_ref, R_gt, t_gt, _ = scene(rng)
        out = compute_pose_2d2d(
            jax.random.PRNGKey(0),
            jnp.array(kp_cur, jnp.float32),
            jnp.array(kp_ref, jnp.float32),
            jnp.ones(len(kp_cur), bool),
            Kj, Kij,
        )
        assert bool(out["valid"])
        R = np.asarray(out["R"], np.float64)
        t = np.asarray(out["t"], np.float64)
        assert rot_angle_deg(R, R_gt) < 0.2
        cos = abs(np.dot(t, t_gt) / np.linalg.norm(t_gt))
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 3.0

    def test_rejects_planar_scene_via_gric(self):
        rng = np.random.RandomState(1)
        kp_cur, kp_ref, *_ = scene(rng, planar=True, noise=0.1)
        out = compute_pose_2d2d(
            jax.random.PRNGKey(1),
            jnp.array(kp_cur, jnp.float32),
            jnp.array(kp_ref, jnp.float32),
            jnp.ones(len(kp_cur), bool),
            Kj, Kij,
        )
        assert not bool(out["valid"])
        np.testing.assert_allclose(np.asarray(out["R"]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["t"]), 0.0, atol=1e-6)

    def test_rejects_too_few_keypoints(self):
        rng = np.random.RandomState(2)
        kp_cur, kp_ref, *_ = scene(rng, n=600)
        mask = np.zeros(600, bool)
        mask[:8] = True  # > minimal sample but <= 10 -> GRIC skipped
        out = compute_pose_2d2d(
            jax.random.PRNGKey(2),
            jnp.array(kp_cur, jnp.float32),
            jnp.array(kp_ref, jnp.float32),
            jnp.array(mask),
            Kj, Kij,
        )
        assert not bool(out["valid"])


class TestScaleRecovery:
    def test_recovers_metric_scale(self):
        rng = np.random.RandomState(3)
        n = 800
        true_scale = 2.8
        # 3D points defined by current-view pixels and depths
        kp_cur = rng.uniform([10, 10], [W_IMG - 10, H_IMG - 10], size=(n, 2))
        depth_vals = rng.uniform(5, 40, n)
        rays = (K_inv @ np.concatenate(
            [kp_cur, np.ones((n, 1))], axis=1).T).T
        X_cur = rays * depth_vals[:, None]
        # GT relative pose cur -> ref with |t| = true_scale
        R = np.asarray(so3_exp(jnp.array([0.01, -0.02, 0.005], jnp.float32)), np.float64)
        t_unit = np.array([0.5, -0.1, 0.85])
        t_unit /= np.linalg.norm(t_unit)
        T_cur2ref = np.eye(4)
        T_cur2ref[:3, :3] = R
        T_cur2ref[:3, 3] = t_unit * true_scale
        X_ref = X_cur @ R.T + T_cur2ref[:3, 3]
        pix = (K @ X_ref.T).T
        kp_ref = pix[:, :2] / pix[:, 2:]

        # dense CNN depth of the current view at kp pixels
        depth_map = np.zeros((H_IMG, W_IMG), np.float32)
        ki = kp_cur.astype(int)
        depth_map[ki[:, 1], ki[:, 0]] = depth_vals

        # unit-translation pose ref->cur (the solver's convention: T_21)
        T_unit_cur2ref = T_cur2ref.copy()
        T_unit_cur2ref[:3, 3] = t_unit
        T_ref2cur_unit = np.linalg.inv(T_unit_cur2ref)

        out = find_scale_from_depth(
            jax.random.PRNGKey(3),
            jnp.array(kp_ref, jnp.float32),
            jnp.array(kp_cur, jnp.float32),
            jnp.ones(n, bool),
            jnp.array(T_ref2cur_unit, jnp.float32),
            jnp.array(depth_map),
            Kij,
        )
        assert int(out["valid_cnt"]) > 700
        assert abs(float(out["scale"]) - true_scale) / true_scale < 0.02

    def test_scale_sentinel_when_too_few(self):
        out = find_scale_from_depth(
            jax.random.PRNGKey(4),
            jnp.zeros((100, 2), jnp.float32),
            jnp.zeros((100, 2), jnp.float32),
            jnp.zeros(100, bool),
            jnp.eye(4, dtype=jnp.float32),
            jnp.zeros((H_IMG, W_IMG), jnp.float32),
            Kij,
        )
        assert float(out["scale"]) == -1.0


class TestPnP:
    def test_recovers_pose_from_depth(self):
        rng = np.random.RandomState(5)
        n = 700
        kp_ref = rng.uniform([10, 10], [W_IMG - 10, H_IMG - 10], size=(n, 2))
        depth_vals = rng.uniform(5, 45, n).astype(np.float32)
        rays = (K_inv @ np.concatenate([kp_ref, np.ones((n, 1))], 1).T).T
        X_ref = rays * depth_vals[:, None]
        # GT pose cur -> ref; PnP solves ref -> cur internally
        R = np.asarray(so3_exp(jnp.array([0.02, 0.01, -0.015], jnp.float32)), np.float64)
        t = np.array([0.3, -0.05, 1.2])
        T_cur2ref = np.eye(4)
        T_cur2ref[:3, :3] = R
        T_cur2ref[:3, 3] = t
        T_ref2cur = np.linalg.inv(T_cur2ref)
        X_cur = X_ref @ T_ref2cur[:3, :3].T + T_ref2cur[:3, 3]
        pix = (K @ X_cur.T).T
        kp_cur = pix[:, :2] / pix[:, 2:] + rng.randn(n, 2) * 0.2

        depth_map = np.zeros((H_IMG, W_IMG), np.float32)
        ki = kp_ref.astype(int)
        depth_map[ki[:, 1], ki[:, 0]] = depth_vals
        # keypoints must read their own depth: snap kp_ref to pixel centers
        kp_ref_px = ki.astype(np.float32)

        out = compute_pose_3d2d(
            jax.random.PRNGKey(5),
            jnp.array(kp_ref_px),
            jnp.array(kp_cur, jnp.float32),
            jnp.ones(n, bool),
            jnp.array(depth_map),
            Kj, Kij,
            max_depth=50.0,
        )
        assert bool(out["ok"])
        T = np.asarray(out["T"], np.float64)
        assert rot_angle_deg(T[:3, :3], R) < 0.3
        assert np.linalg.norm(T[:3, 3] - t) < 0.1
