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


class TestScaleJumpGuard:
    """tpu.scale_jump_guard (TPU-native addition): a scale that jumps more
    than the guard factor from the previous frame's is treated as a scale
    failure, routing the frame to the PnP fallback instead of committing a
    physically impossible translation (the depth-ratio RANSAC's massive-
    outlier failure mode, see TrackingConfig and tools/longdrive_parity.py
    pairs 510/601)."""

    def _case(self):
        rng = np.random.RandomState(3)
        depth_ref = smooth_depth(rng)
        T_cur2ref, T_ref2cur = gt_motion(scale=1.5)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = np.zeros((H, W), np.float32)
        return flow, flow_diff, depth_cur, depth_ref, T_cur2ref

    def test_spike_routes_to_pnp(self):
        from dfvo_tpu.pipeline.tracking import TRACK_MODE_PNP

        flow, flow_diff, depth_cur, depth_ref, T_gt = self._case()
        # prev frame ran at scale 0.1 -> a 1.5 estimate is a 15x jump
        out = run(TCFG, flow, flow_diff, depth_cur, depth_ref,
                  prev_scale=0.1)
        assert int(out["mode"]) == TRACK_MODE_PNP
        assert float(out["scale"]) == -1.0
        # the PnP fallback still recovers the metric pose from depth
        T = np.asarray(out["pose"], np.float64)
        assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.1

    def test_normal_scale_unaffected(self):
        flow, flow_diff, depth_cur, depth_ref, T_gt = self._case()
        out = run(TCFG, flow, flow_diff, depth_cur, depth_ref,
                  prev_scale=1.0)
        assert int(out["mode"]) == TRACK_MODE_ESSENTIAL
        assert abs(float(out["scale"]) - 1.5) / 1.5 < 0.05

    def test_guard_disable(self):
        flow, flow_diff, depth_cur, depth_ref, T_gt = self._case()
        tcfg = dataclasses.replace(TCFG, scale_jump_guard=0.0)
        out = run(tcfg, flow, flow_diff, depth_cur, depth_ref,
                  prev_scale=0.1)
        assert int(out["mode"]) == TRACK_MODE_ESSENTIAL


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


def _kp_from_scene(n=512, planar=False, seed=0, noise=0.0):
    """Synthetic 2D-2D correspondences from a known motion.

    Returns (kp_cur, kp_ref, valid, T_cur2ref). View geometry matches the
    tracker convention: kp_cur projected in the current frame, kp_ref in the
    reference frame, x_ref ~ R x_cur + t.
    """
    rng = np.random.RandomState(seed)
    K = np.asarray(Kj)
    T_cur2ref, _ = gt_motion(scale=1.0)
    x = rng.uniform(-8, 8, n)
    y = rng.uniform(-3, 3, n)
    z = np.full(n, 15.0) if planar else rng.uniform(6.0, 40.0, n)
    pts_cur = np.stack([x, y, z], 1)
    pts_ref = pts_cur @ T_cur2ref[:3, :3].T + T_cur2ref[:3, 3]

    def proj(p):
        uv = p @ K.T
        return uv[:, :2] / uv[:, 2:3]

    kp_cur = proj(pts_cur) + rng.randn(n, 2) * noise
    kp_ref = proj(pts_ref) + rng.randn(n, 2) * noise
    valid = np.ones(n, bool)
    return (
        jnp.asarray(kp_cur, jnp.float32),
        jnp.asarray(kp_ref, jnp.float32),
        jnp.asarray(valid),
        T_cur2ref,
    )


class TestValidityMethods:
    """All three reference validity methods (E_tracker.py:182-217,243-276)."""

    def _pose(self, method, thre, planar=False):
        from dfvo_tpu.tracker.e_tracker import compute_pose_2d2d

        kp_cur, kp_ref, valid, T_gt = _kp_from_scene(planar=planar)
        out = compute_pose_2d2d(
            jax.random.PRNGKey(3),
            kp_cur,
            kp_ref,
            valid,
            Kj,
            Kij,
            repeats=3,
            num_hypotheses=128,
            validity_method=method,
            validity_thre=thre,
        )
        return out, T_gt

    def test_flow_gate_blocks_small_flow(self):
        # mean flow of this scene is a few pixels; a huge threshold must
        # invalidate the pose exactly like ref E_tracker.py:182-185
        out, _ = self._pose("flow", 1e6)
        assert not bool(out["valid"])
        assert np.allclose(np.asarray(out["R"]), np.eye(3), atol=1e-6)

    def test_flow_accepts_with_low_threshold(self):
        out, T_gt = self._pose("flow", 0.1)
        assert bool(out["valid"])
        ang, _ = pose_errors(
            np.asarray(
                jnp.concatenate(
                    [
                        jnp.concatenate(
                            [out["R"], out["t"][:, None]], axis=1
                        ),
                        jnp.array([[0.0, 0, 0, 1]]),
                    ]
                )
            ),
            T_gt,
        )
        assert ang < 0.5

    def test_homo_ratio_vote_directions(self):
        # ratio = H/(H+E) is in (0,1): a threshold above it accepts, one
        # below rejects (ref E_tracker.py:243-249)
        out_hi, _ = self._pose("homo_ratio", 0.99)
        out_lo, _ = self._pose("homo_ratio", 0.01)
        assert bool(out_hi["valid"])
        assert not bool(out_lo["valid"])

    def test_homo_ratio_planar_scores_higher(self):
        # a planar scene is fully explained by a homography, so its inlier
        # share must exceed the general scene's
        from dfvo_tpu.solvers.essential import find_essential_ransac
        from dfvo_tpu.solvers.homography import find_homography_ransac

        def ratio(planar):
            kp_cur, kp_ref, valid, _ = _kp_from_scene(planar=planar, noise=0.05)
            h = find_homography_ransac(
                jax.random.PRNGKey(0), kp_cur, kp_ref, valid,
                threshold=0.2, num_hypotheses=128,
            )
            e = find_essential_ransac(
                jax.random.PRNGKey(0), kp_cur, kp_ref, Kj, Kij, valid,
                threshold=0.2, num_hypotheses=128,
            )
            return float(h["inlier_cnt"]) / float(
                h["inlier_cnt"] + e["inlier_cnt"]
            )

        assert ratio(planar=True) > ratio(planar=False)

    def test_validity_thre_from_cfg(self):
        from dfvo_tpu.utils import ConfigLoader
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = ConfigLoader().merge_cfg(
            [
                os.path.join(
                    repo, "options/examples/default_configuration.yml"
                ),
                os.path.join(
                    repo, "options/examples/ablation_model_sel_flow.yml"
                ),
            ]
        )
        tcfg = TrackingConfig.from_cfg(cfg)
        assert tcfg.validity_method == "flow"
        assert tcfg.validity_thre == 5.0


class TestForceEPath:
    def test_e_path_matches_hybrid_when_e_succeeds(self):
        """tpu.force_e_path drops the PnP branch statically (the bench's
        realistic-path mode); on a well-conditioned scene where the
        E-tracker succeeds, the pose must be identical to the hybrid step,
        and the fallback mode must be constant-motion rather than PnP."""
        rng = np.random.RandomState(0)
        depth_ref = smooth_depth(rng)
        _, T_ref2cur = gt_motion(scale=1.5)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = np.zeros((H, W), np.float32)
        tcfg_e = dataclasses.replace(TCFG, force_e_path=True)
        out_h = run(TCFG, flow, flow_diff, depth_cur, depth_ref)
        out_e = run(tcfg_e, flow, flow_diff, depth_cur, depth_ref)
        assert int(out_h["mode"]) == 1  # essential path taken by both
        assert int(out_e["mode"]) == 1
        np.testing.assert_allclose(
            np.asarray(out_e["pose"]), np.asarray(out_h["pose"]), atol=1e-5
        )

    def test_e_path_falls_back_to_const_motion(self):
        """Garbage data (E cannot succeed): force_e_path returns the
        previous motion with the constant-motion mode."""
        rng = np.random.RandomState(0)
        # near-zero flow: the homography explains it, GRIC votes E invalid
        flow = (rng.rand(H, W, 2).astype(np.float32) - 0.5) * 0.02
        flow_diff = np.zeros((H, W), np.float32)  # all kp "consistent"
        depth = smooth_depth(rng)
        tcfg_e = dataclasses.replace(TCFG, force_e_path=True)
        out = run(tcfg_e, flow, flow_diff, depth, depth)
        assert int(out["mode"]) in (0,)  # const-motion, never PnP
        np.testing.assert_allclose(
            np.asarray(out["pose"]), np.eye(4), atol=1e-6
        )


class TestKpSrcConfig:
    """The per-stage ``kp_src`` indirection (ref default_configuration.yml:
    139-178) is validated against the folded routing instead of being
    silently ignored."""

    def _cfg(self, *paths):
        import os

        from dfvo_tpu.utils import ConfigLoader

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        return ConfigLoader().merge_cfg(
            [os.path.join(repo, "options/examples", p) for p in paths]
        )

    def test_default_and_uniform_spellings_accepted(self):
        cfg = self._cfg("default_configuration.yml")
        assert TrackingConfig.from_cfg(cfg).kp_method == "local_bestN"
        # the ref's uniform ablation spells kp_src: kp_list everywhere
        cfg = self._cfg(
            "default_configuration.yml", "ablation_correspondences_uniform.yml"
        )
        assert TrackingConfig.from_cfg(cfg).kp_method == "sampled"

    def test_mismatched_kp_src_raises(self):
        import pytest

        cfg = self._cfg("default_configuration.yml")
        cfg.pnp_tracker.kp_src = "kp_list"  # local_bestN provides kp_best
        with pytest.raises(ValueError, match="pnp_tracker.kp_src"):
            TrackingConfig.from_cfg(cfg)
        cfg = self._cfg("default_configuration.yml")
        cfg.e_tracker.kp_src = "kp_depth"
        with pytest.raises(ValueError, match="e_tracker.kp_src"):
            TrackingConfig.from_cfg(cfg)

    def test_unsupported_iterative_kp_src_raises(self):
        import pytest

        cfg = self._cfg("default_configuration.yml")
        cfg.e_tracker.iterative_kp.enable = True
        cfg.e_tracker.iterative_kp.kp_src = "kp_best"
        with pytest.raises(ValueError, match="iterative_kp.kp_src"):
            TrackingConfig.from_cfg(cfg)
