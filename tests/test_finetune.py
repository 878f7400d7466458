"""Online finetuning integration test through the DFVO frame loop."""

import os

import numpy as np
import pytest

import jax

from dfvo_tpu.utils import ConfigLoader
from tests.test_pipeline import synthetic_kitti  # noqa: F401 (fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_online_finetune_updates_flow_weights(synthetic_kitti, tmp_path):
    from dfvo_tpu.pipeline import DFVO

    cfg = ConfigLoader().merge_cfg(
        [os.path.join(REPO, "options/examples/default_configuration.yml")]
    )
    cfg.seq = "42"
    cfg.image.height = 64
    cfg.image.width = 96
    cfg.directory.img_seq_dir = str(synthetic_kitti / "odom_data")
    cfg.directory.gt_pose_dir = str(synthetic_kitti / "gt_poses")
    cfg.directory.result_dir = str(tmp_path / "result")
    cfg.visualization.enable = False
    cfg.tpu.ransac_hypotheses = 32
    cfg.online_finetune.enable = True
    cfg.online_finetune.save_model = True
    cfg.online_finetune.num_frames = 2  # adapt on the first two pairs only
    cfg.online_finetune.flow.enable = True
    cfg.online_finetune.flow.scales = [1]
    cfg.online_finetune.depth.enable = True
    cfg.online_finetune.depth.scales = [0]

    vo = DFVO(cfg)

    def snapshot(net):
        return [
            np.asarray(x).copy()
            for x in jax.tree.leaves(vo.variables[net]["params"])
        ]

    before_flow = snapshot("flow")
    before_depth = snapshot("depth")

    vo.main(num_frames=4)

    def total_delta(net, before):
        after = jax.tree.leaves(vo.variables[net]["params"])
        return sum(
            float(np.abs(np.asarray(a) - b).sum())
            for a, b in zip(after, before)
        )

    assert total_delta("flow", before_flow) > 1e-4, "flow weights not updated"
    assert total_delta("depth", before_depth) > 1e-4, "depth weights not updated"
    assert vo.finetune_cnt == 2  # num_frames cutoff respected
    # finetuned model checkpoint written
    assert os.path.isdir(tmp_path / "result" / "finetuned_model")


def test_online_finetune_hd3_flow():
    """HD3 online flow finetuning (ref inherits the DeepFlow losses,
    deep_flow.py:226-355, via HD3Flow — hd3_flow.py:70): one optax step
    through the full HD3 net produces a finite loss and moves the weights."""
    import jax.numpy as jnp

    from dfvo_tpu.pipeline.finetune import OnlineFinetuner
    from dfvo_tpu.pipeline.frontend import DeepFrontend

    cfg = ConfigLoader().merge_cfg(
        [os.path.join(REPO, "options/examples/default_configuration.yml")]
    )
    cfg.image.height = 64
    cfg.image.width = 96
    cfg.deep_flow.network = "hd3"
    cfg.online_finetune.enable = True
    cfg.online_finetune.flow.enable = True
    cfg.online_finetune.flow.scales = [1]
    cfg.online_finetune.depth.enable = False

    frontend = DeepFrontend(cfg)
    finetuner = OnlineFinetuner(frontend, cfg)
    variables = frontend.init_variables(jax.random.PRNGKey(0))
    K = np.array([[50.0, 0, 48], [0, 50.0, 32], [0, 0, 1]], np.float32)
    opt_state = finetuner.init_state(variables, K, np.linalg.inv(K))

    rng = np.random.RandomState(0)
    img_ref = jnp.asarray(rng.rand(64, 96, 3).astype(np.float32))
    img_cur = jnp.asarray(rng.rand(64, 96, 3).astype(np.float32))
    pose = jnp.eye(4, dtype=jnp.float32)

    before = [
        np.asarray(x).copy()
        for x in jax.tree.leaves(variables["flow"]["params"])
    ]
    variables, opt_state, loss = finetuner.update(
        variables, opt_state, img_ref, img_cur, pose
    )
    assert np.isfinite(float(loss))
    delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(jax.tree.leaves(variables["flow"]["params"]), before)
    )
    assert delta > 1e-4, "hd3 flow weights not updated"


def test_chunk_update_matches_sequential_frame_updates():
    """The scan-mode chunk finetuning step (one lax.scan over the chunk's
    pairs) must equal applying the per-frame update sequentially — the
    trainable params thread through the scan carry exactly as frame mode
    threads them through the Python loop — and must skip pairs past
    ``n_active`` (chunk padding / num_frames budget)."""
    import jax.numpy as jnp

    from dfvo_tpu.pipeline.finetune import OnlineFinetuner
    from dfvo_tpu.pipeline.frontend import DeepFrontend

    cfg = ConfigLoader().merge_cfg(
        [os.path.join(REPO, "options/examples/default_configuration.yml")]
    )
    cfg.image.height = 64
    cfg.image.width = 96
    cfg.online_finetune.enable = True
    cfg.online_finetune.flow.enable = True
    cfg.online_finetune.flow.scales = [1]
    cfg.online_finetune.depth.enable = True
    cfg.online_finetune.depth.scales = [0]

    frontend = DeepFrontend(cfg)
    finetuner = OnlineFinetuner(frontend, cfg)
    variables = frontend.init_variables(jax.random.PRNGKey(0))
    K = np.array([[50.0, 0, 48], [0, 50.0, 32], [0, 0, 1]], np.float32)
    opt_state0 = finetuner.init_state(variables, K, np.linalg.inv(K))

    rng = np.random.RandomState(1)
    imgs_u8 = jnp.asarray(
        (rng.rand(4, 64, 96, 3) * 255).astype(np.uint8)
    )  # 3 pairs
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (3, 4, 4))

    # sequential frame-mode updates on the first two pairs
    seq_vars, seq_opt = variables, opt_state0
    seq_losses = []
    for i in range(2):
        seq_vars, seq_opt, loss = finetuner.update(
            seq_vars,
            seq_opt,
            imgs_u8[i].astype(jnp.float32) / 255.0,
            imgs_u8[i + 1].astype(jnp.float32) / 255.0,
            poses[i],
        )
        seq_losses.append(float(loss))

    chunk_update = finetuner.make_chunk_update_fn()
    ck_vars, ck_opt, ck_losses = chunk_update(
        variables, opt_state0, imgs_u8, poses, jnp.asarray(2, jnp.int32)
    )

    np.testing.assert_allclose(
        np.asarray(ck_losses)[:2], np.asarray(seq_losses), rtol=1e-5
    )
    assert float(ck_losses[2]) == 0.0, "pair past n_active must be skipped"
    for net in ("flow", "depth"):
        for a, b in zip(
            jax.tree.leaves(ck_vars[net]["params"]),
            jax.tree.leaves(seq_vars[net]["params"]),
        ):
            # the scan body and the standalone update compile to slightly
            # different fusion orders; identical math, f32 reassociation
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


def test_scan_execution_finetunes(synthetic_kitti, tmp_path):
    """tpu.execution: scan with online_finetune.enable runs end-to-end,
    updates the weights, respects the num_frames budget, and writes the
    finetuned checkpoint (VERDICT r4 item 6)."""
    from dfvo_tpu.pipeline import DFVO

    cfg = ConfigLoader().merge_cfg(
        [os.path.join(REPO, "options/examples/default_configuration.yml")]
    )
    cfg.seq = "42"
    cfg.image.height = 64
    cfg.image.width = 96
    cfg.directory.img_seq_dir = str(synthetic_kitti / "odom_data")
    cfg.directory.gt_pose_dir = str(synthetic_kitti / "gt_poses")
    cfg.directory.result_dir = str(tmp_path / "result")
    cfg.visualization.enable = False
    cfg.tpu.ransac_hypotheses = 32
    cfg.tpu.execution = "scan"
    cfg.tpu.scan_chunk = 3
    cfg.online_finetune.enable = True
    cfg.online_finetune.save_model = True
    cfg.online_finetune.num_frames = 4  # cuts off mid-chunk (3 + 1)
    cfg.online_finetune.flow.enable = True
    cfg.online_finetune.flow.scales = [1]
    cfg.online_finetune.depth.enable = True
    cfg.online_finetune.depth.scales = [0]

    vo = DFVO(cfg)
    before = [
        np.asarray(x).copy()
        for x in jax.tree.leaves(vo.variables["flow"]["params"])
    ]
    vo.main(num_frames=7)

    delta = sum(
        float(np.abs(np.asarray(a) - b).sum())
        for a, b in zip(
            jax.tree.leaves(vo.variables["flow"]["params"]), before
        )
    )
    assert delta > 1e-4, "flow weights not updated in scan mode"
    assert vo.finetune_cnt == 4  # num_frames cutoff respected mid-chunk
    assert os.path.isdir(tmp_path / "result" / "finetuned_model")
    poses_txt = tmp_path / "result" / "42.txt"
    assert poses_txt.exists()
    vals = np.loadtxt(poses_txt)
    assert np.isfinite(vals).all()


class TestPoseSrc:
    """The three depth-loss pose sources (ref deep_models.py:257-266)."""

    def _finetuner(self, pose_src, enable_pose_net=True):
        import jax.numpy as jnp

        from dfvo_tpu.pipeline.finetune import OnlineFinetuner
        from dfvo_tpu.pipeline.frontend import DeepFrontend

        cfg = ConfigLoader().merge_cfg(
            [os.path.join(REPO, "options/examples/default_configuration.yml")]
        )
        cfg.image.height = 64
        cfg.image.width = 96
        cfg.deep_pose.enable = enable_pose_net
        cfg.online_finetune.enable = True
        cfg.online_finetune.flow.enable = False
        cfg.online_finetune.depth.enable = True
        cfg.online_finetune.depth.pose_src = pose_src
        frontend = DeepFrontend(cfg)
        # construct the finetuner BEFORE network init: the invalid-config
        # test cases raise here, and initializing the networks twice just
        # to observe a ValueError cost ~3 min of suite time
        finetuner = OnlineFinetuner(frontend, cfg)
        variables = frontend.init_variables(jax.random.PRNGKey(0))
        return finetuner, frontend, variables, jnp

    def test_three_sources_produce_documented_poses(self):
        ft, frontend, variables, jnp = self._finetuner("DF-VO")
        rng = np.random.RandomState(0)
        img_ref = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        img_cur = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.3, -0.1, 2.0]
        poses = jnp.asarray(pose[None])

        out = np.asarray(ft._depth_pose(variables, img_ref, img_cur, poses))
        np.testing.assert_allclose(
            out[0, :3, 3], pose[:3, 3] / 5.4, rtol=1e-6
        )
        np.testing.assert_allclose(out[0, :3, :3], pose[:3, :3])

        deep = np.asarray(
            frontend.pose_net.apply(
                variables["pose"], jnp.concatenate([img_ref, img_cur], axis=-1)
            )
        )
        ft2, _, _, _ = self._finetuner("deep_pose")
        out2 = np.asarray(ft2._depth_pose(variables, img_ref, img_cur, poses))
        np.testing.assert_allclose(out2, deep, atol=1e-6)

        ft3, _, _, _ = self._finetuner("DF-VO2")
        out3 = np.asarray(ft3._depth_pose(variables, img_ref, img_cur, poses))
        np.testing.assert_allclose(out3[0, :3, :3], pose[:3, :3])
        t = out3[0, :3, 3]
        # direction = DF-VO direction, magnitude = deep-pose magnitude
        np.testing.assert_allclose(
            t / np.linalg.norm(t), pose[:3, 3] / np.linalg.norm(pose[:3, 3]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.linalg.norm(t), np.linalg.norm(deep[0, :3, 3]), rtol=1e-5
        )

    def test_invalid_or_unavailable_pose_src_raises(self):
        with pytest.raises(ValueError, match="pose_src"):
            self._finetuner("bogus")
        with pytest.raises(ValueError, match="pose CNN"):
            self._finetuner("deep_pose", enable_pose_net=False)
