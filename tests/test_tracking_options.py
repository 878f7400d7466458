"""Tests for the optional tracking stages: iterative scale recovery,
rigid-flow iterative kp refinement, depth consistency, alternative kp
methods."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dfvo_tpu.pipeline.tracking import (
    TRACK_MODE_ESSENTIAL,
    TrackingConfig,
    compute_depth_consistency,
    tracking_step,
)
from tests.test_pipeline import (
    H,
    W,
    Kj,
    Kij,
    TCFG,
    gt_motion,
    pose_errors,
    smooth_depth,
    synthesize,
)


def run(tcfg, flow, flow_diff, depth_cur, depth_ref, prev_scale=1.0, deep_pose=None):
    return tracking_step(
        jax.random.PRNGKey(0),
        jnp.array(flow),
        jnp.array(flow_diff),
        jnp.array(depth_cur),
        jnp.array(depth_ref),
        jnp.eye(4, dtype=jnp.float32),
        Kj,
        Kij,
        tcfg,
        prev_scale=prev_scale,
        deep_pose=deep_pose,
    )


class TestIterativeScale:
    def test_iterative_scale_converges(self):
        rng = np.random.RandomState(0)
        depth_ref = smooth_depth(rng)
        T_cur2ref, T_ref2cur = gt_motion(scale=1.5)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = np.zeros((H, W), np.float32)

        tcfg = dataclasses.replace(TCFG, scale_method="iterative")
        out = run(tcfg, flow, flow_diff, depth_cur, depth_ref, prev_scale=1.0)
        assert int(out["mode"]) == TRACK_MODE_ESSENTIAL
        T = np.asarray(out["pose"], np.float64)
        assert abs(np.linalg.norm(T[:3, 3]) - 1.5) / 1.5 < 0.05


class TestIterativeKP:
    def test_refinement_keeps_accuracy(self):
        rng = np.random.RandomState(1)
        depth_ref = smooth_depth(rng)
        T_cur2ref, T_ref2cur = gt_motion(scale=1.2)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = np.zeros((H, W), np.float32)

        tcfg = dataclasses.replace(
            TCFG, e_iterative_kp=True, scale_iterative_kp=True
        )
        out = run(tcfg, flow, flow_diff, depth_cur, depth_ref)
        assert int(out["mode"]) == TRACK_MODE_ESSENTIAL
        T = np.asarray(out["pose"], np.float64)
        ang, _ = pose_errors(T, T_cur2ref.astype(np.float64))
        assert ang < 0.15
        assert abs(np.linalg.norm(T[:3, 3]) - 1.2) / 1.2 < 0.05


class TestDepthConsistency:
    def test_consistent_depths_give_small_diff(self):
        rng = np.random.RandomState(2)
        depth_cur = smooth_depth(rng)
        T_cur2ref, T_ref2cur = gt_motion(scale=0.5)
        # build ref depth exactly consistent with cur depth under the motion
        _, depth_ref_scatter = synthesize(depth_cur, T_cur2ref)
        diff = np.asarray(
            compute_depth_consistency(
                jnp.array(depth_cur),
                jnp.array(depth_ref_scatter),
                jnp.array(T_cur2ref.astype(np.float32)),
                Kj,
                Kij,
            )
        )
        # interior pixels (valid scatter) should be highly consistent
        inner = diff[20:-20, 40:-40]
        assert np.median(inner) < 0.05

    def test_inconsistent_pose_gives_large_diff(self):
        rng = np.random.RandomState(3)
        depth_cur = smooth_depth(rng)
        T_cur2ref, _ = gt_motion(scale=0.5)
        bad_T = np.eye(4, dtype=np.float32)
        bad_T[2, 3] = 5.0  # wildly wrong translation
        _, depth_ref_scatter = synthesize(depth_cur, T_cur2ref)
        diff = np.asarray(
            compute_depth_consistency(
                jnp.array(depth_cur),
                jnp.array(depth_ref_scatter),
                jnp.array(bad_T),
                Kj,
                Kij,
            )
        )
        assert np.median(diff[20:-20, 40:-40]) > 0.1


class TestKpMethods:
    def test_bestN_method_tracks(self):
        rng = np.random.RandomState(4)
        depth_ref = smooth_depth(rng)
        T_cur2ref, T_ref2cur = gt_motion(scale=1.0)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = (rng.rand(H, W) * 0.05).astype(np.float32)

        tcfg = dataclasses.replace(TCFG, kp_method="bestN")
        out = run(tcfg, flow, flow_diff, depth_cur, depth_ref)
        T = np.asarray(out["pose"], np.float64)
        ang, _ = pose_errors(T, T_cur2ref.astype(np.float64))
        assert ang < 0.2

    def test_sampled_method_tracks(self):
        rng = np.random.RandomState(5)
        depth_ref = smooth_depth(rng)
        T_cur2ref, T_ref2cur = gt_motion(scale=1.0)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = np.zeros((H, W), np.float32)

        tcfg = dataclasses.replace(TCFG, kp_method="sampled")
        out = run(tcfg, flow, flow_diff, depth_cur, depth_ref)
        T = np.asarray(out["pose"], np.float64)
        ang, _ = pose_errors(T, T_cur2ref.astype(np.float64))
        assert ang < 0.2
