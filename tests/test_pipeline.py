"""End-to-end tests of the fused tracking step and the DFVO pipeline.

The tracking step is driven with synthetic frontend outputs (analytic depth
+ rigid flow from a known motion), covering all three decision branches of
the reference tree (dfvo.py:121-262): essential, PnP fallback, constant
motion. The pipeline smoke test runs the real code path (random network
weights) over a tiny synthetic KITTI-layout sequence.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfvo_tpu.geometry.lie import so3_exp
from dfvo_tpu.geometry.ops import backproject_depth, project_points
from dfvo_tpu.pipeline.tracking import (
    TRACK_MODE_CONST,
    TRACK_MODE_ESSENTIAL,
    TRACK_MODE_PNP,
    TrackingConfig,
    tracking_step,
)

H, W = 192, 640
K = np.array([[370.0, 0, 320.0], [0, 371.0, 96.0], [0, 0, 1.0]], np.float32)
K_inv = np.linalg.inv(K).astype(np.float32)
Kj, Kij = jnp.array(K), jnp.array(K_inv)

TCFG = TrackingConfig(
    height=H,
    width=W,
    depth_crop=((0.0, 1.0), (0.0, 1.0)),  # keep full image for synthetic
    max_depth=50.0,
)


def smooth_depth(rng, lo=5.0, hi=40.0):
    import cv2

    coarse = rng.rand(6, 20).astype(np.float32)
    field = cv2.resize(coarse, (W, H), interpolation=cv2.INTER_CUBIC)
    field = (field - field.min()) / (field.max() - field.min())
    return lo + field * (hi - lo)


def synthesize(depth_ref, T_ref2cur):
    """Exact rigid flow (ref->cur) + current-view depth scattered at the
    projected pixels."""
    depth_j = jnp.array(depth_ref)[None]
    pts_ref = backproject_depth(depth_j, Kij)  # [1,H,W,4]
    pts_cur = jnp.einsum("ij,nhwj->nhwi", jnp.array(T_ref2cur), pts_ref)
    pix_cur = project_points(pts_cur, Kj)  # [1,H,W,2]
    grid = np.stack(np.meshgrid(np.arange(W), np.arange(H)), -1)
    flow = np.asarray(pix_cur[0]) - grid

    z_cur = np.asarray(pts_cur[0, ..., 2])
    px = np.floor(np.asarray(pix_cur[0, ..., 0])).astype(int)
    py = np.floor(np.asarray(pix_cur[0, ..., 1])).astype(int)
    ok = (px >= 0) & (px < W) & (py >= 0) & (py < H) & (z_cur > 0)
    depth_cur = np.zeros((H, W), np.float32)
    depth_cur[py[ok], px[ok]] = z_cur[ok]
    return flow.astype(np.float32), depth_cur


def gt_motion(scale=1.5):
    R = np.asarray(
        so3_exp(jnp.array([0.005, -0.01, 0.002], jnp.float32)), np.float64
    )
    t = np.array([0.1, -0.05, 0.98])
    t = t / np.linalg.norm(t) * scale
    T_cur2ref = np.eye(4, dtype=np.float32)
    T_cur2ref[:3, :3] = R
    T_cur2ref[:3, 3] = t
    return T_cur2ref, np.linalg.inv(T_cur2ref).astype(np.float32)


def run_tracking(flow, flow_diff, depth_cur, depth_ref):
    return tracking_step(
        jax.random.PRNGKey(0),
        jnp.array(flow),
        jnp.array(flow_diff),
        jnp.array(depth_cur),
        jnp.array(depth_ref),
        jnp.eye(4, dtype=jnp.float32),
        Kj,
        Kij,
        TCFG,
    )


def pose_errors(T_est, T_gt):
    R_err = T_est[:3, :3].T @ T_gt[:3, :3]
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
    )
    return ang, np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3])


class TestTrackingStep:
    def test_essential_branch_recovers_metric_pose(self):
        rng = np.random.RandomState(0)
        depth_ref = smooth_depth(rng)
        T_cur2ref, T_ref2cur = gt_motion(scale=1.5)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = np.zeros((H, W), np.float32)

        out = run_tracking(flow, flow_diff, depth_cur, depth_ref)
        assert int(out["mode"]) == TRACK_MODE_ESSENTIAL
        T = np.asarray(out["pose"], np.float64)
        ang, terr = pose_errors(T, T_cur2ref.astype(np.float64))
        assert ang < 0.1
        # metric translation within 5% (scale recovery working)
        assert abs(np.linalg.norm(T[:3, 3]) - 1.5) / 1.5 < 0.05
        assert terr < 0.15

    def test_pnp_branch_on_planar_scene(self):
        # constant depth => homography wins GRIC => E rejected => PnP
        depth_ref = np.full((H, W), 15.0, np.float32)
        T_cur2ref, T_ref2cur = gt_motion(scale=0.8)
        flow, depth_cur = synthesize(depth_ref, T_ref2cur)
        flow_diff = np.zeros((H, W), np.float32)

        out = run_tracking(flow, flow_diff, depth_cur, depth_ref)
        assert int(out["mode"]) == TRACK_MODE_PNP
        T = np.asarray(out["pose"], np.float64)
        ang, terr = pose_errors(T, T_cur2ref.astype(np.float64))
        assert ang < 0.1
        assert terr < 0.1

    def test_constant_motion_fallback(self):
        rng = np.random.RandomState(1)
        depth_ref = smooth_depth(rng)
        flow = rng.randn(H, W, 2).astype(np.float32)
        flow_diff = np.ones((H, W), np.float32)  # nothing consistent
        prev = np.eye(4, dtype=np.float32)
        prev[2, 3] = 0.7
        out = tracking_step(
            jax.random.PRNGKey(0),
            jnp.array(flow),
            jnp.array(flow_diff),
            jnp.array(depth_ref),
            jnp.array(depth_ref),
            jnp.array(prev),
            Kj,
            Kij,
            TCFG,
        )
        assert int(out["mode"]) == TRACK_MODE_CONST
        np.testing.assert_allclose(np.asarray(out["pose"]), prev, atol=1e-6)


@pytest.fixture(scope="module")
def synthetic_kitti(tmp_path_factory):
    """Tiny KITTI-odom-layout sequence: translating camera over a textured
    noise image (random weights can't track it, but the full pipeline must
    run end to end on it)."""
    import cv2

    root = tmp_path_factory.mktemp("kitti")
    seq_dir = root / "odom_data" / "42"
    img_dir = seq_dir / "image_2"
    img_dir.mkdir(parents=True)
    gt_dir = root / "gt_poses"
    gt_dir.mkdir()

    rng = np.random.RandomState(0)
    big = (rng.rand(500, 1500, 3) * 255).astype(np.uint8)
    big = cv2.GaussianBlur(big, (0, 0), 3)
    n_frames = 6
    lines = []
    for i in range(n_frames):
        crop = big[50 : 50 + 370, 10 * i : 10 * i + 1226]
        cv2.imwrite(str(img_dir / f"{i:06d}.jpg"), crop)
        P = np.eye(4)
        P[0, 3] = 0.1 * i
        lines.append(" ".join(str(v) for v in P.flatten()[:12]))
    (gt_dir / "42.txt").write_text("\n".join(lines) + "\n")
    (seq_dir / "calib.txt").write_text(
        "\n".join(
            f"P{j}: 707.09 0.0 601.88 0.0 0.0 707.09 183.11 0.0 0.0 0.0 1.0 0.0"
            for j in range(4)
        )
        + "\n"
    )
    return root


class TestPipelineSmoke:
    @pytest.mark.xdist_group("pipeline96x320")
    def test_full_pipeline_runs(self, synthetic_kitti, tmp_path):
        from dfvo_tpu.pipeline import DFVO
        from dfvo_tpu.utils import ConfigLoader

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        loader = ConfigLoader()
        cfg = loader.merge_cfg(
            [os.path.join(repo, "options/examples/default_configuration.yml")]
        )
        cfg.seq = "42"
        cfg.image.height = 96
        cfg.image.width = 320
        cfg.directory.img_seq_dir = str(synthetic_kitti / "odom_data")
        cfg.directory.gt_pose_dir = str(synthetic_kitti / "gt_poses")
        cfg.directory.result_dir = str(tmp_path / "result")
        cfg.visualization.enable = True
        cfg.visualization.save_img = False
        cfg.tpu.ransac_hypotheses = 64

        vo = DFVO(cfg)
        vo.main()

        traj = tmp_path / "result" / "42.txt"
        assert traj.exists()
        from dfvo_tpu.utils.io import load_poses_from_txt

        poses = load_poses_from_txt(str(traj))
        assert len(poses) == 6
        for p in poses.values():
            assert np.isfinite(p).all()
        assert (tmp_path / "result" / "map.png").exists()


class TestGtDepthPath:
    def test_gt_depth_skips_depth_cnn(self, synthetic_kitti, tmp_path):
        """depth_src: gt feeds dataset depths and never runs the depth CNN
        (ref dfvo.py:295-319 branches on data_dir['depth_src'])."""
        import cv2

        from dfvo_tpu.pipeline import DFVO
        from dfvo_tpu.utils import ConfigLoader

        # KittiOdom gt-depth layout: depth_dir/gt/<seq>/<id:010d>.png @ /500
        depth_dir = tmp_path / "depth"
        gt_seq = depth_dir / "gt" / "42"
        gt_seq.mkdir(parents=True)
        rng = np.random.RandomState(1)
        coarse = rng.uniform(5.0, 40.0, (6, 20)).astype(np.float32)
        for i in range(6):
            d = cv2.resize(coarse + 0.01 * i, (320, 96),
                           interpolation=cv2.INTER_CUBIC)
            cv2.imwrite(
                str(gt_seq / f"{i:010d}.png"),
                (d * 500).astype(np.uint16),
            )

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = ConfigLoader().merge_cfg(
            [os.path.join(repo, "options/examples/default_configuration.yml")]
        )
        cfg.seq = "42"
        cfg.image.height = 96
        cfg.image.width = 320
        cfg.directory.img_seq_dir = str(synthetic_kitti / "odom_data")
        cfg.directory.gt_pose_dir = str(synthetic_kitti / "gt_poses")
        cfg.directory.depth_dir = str(depth_dir)
        cfg.directory.result_dir = str(tmp_path / "result")
        cfg.depth.depth_src = "gt"
        cfg.visualization.enable = False
        cfg.tpu.ransac_hypotheses = 64

        vo = DFVO(cfg)
        assert vo.use_gt_depth

        # poison the depth net: any apply after setup proves the CNN ran
        def boom(*a, **k):
            raise AssertionError("depth CNN must not run with depth_src: gt")

        vo.frontend.depth_net.apply = boom
        vo.main(num_frames=3)

        traj = tmp_path / "result" / "42.txt"
        assert traj.exists()
        from dfvo_tpu.utils.io import load_poses_from_txt

        poses = load_poses_from_txt(str(traj))
        assert len(poses) == 3
        for p in poses.values():
            assert np.isfinite(p).all()
