"""Multi-sequence sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def runner():
    from dfvo_tpu.parallel import MultiSeqRunner, make_seq_mesh
    from dfvo_tpu.utils import ConfigLoader
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = ConfigLoader().merge_cfg(
        [os.path.join(repo, "options/examples/default_configuration.yml")]
    )
    cfg.image.height = 64
    cfg.image.width = 96
    cfg.tpu.ransac_hypotheses = 32
    cfg.online_finetune.enable = True
    cfg.online_finetune.flow.enable = True
    cfg.online_finetune.flow.scales = [1]
    cfg.online_finetune.depth.enable = False
    mesh = make_seq_mesh(jax.devices()[:4])
    return MultiSeqRunner(cfg, mesh=mesh)


def _batch(runner, S):
    h, w = runner.cfg.image.height, runner.cfg.image.width
    rng = np.random.RandomState(0)
    K = np.array(
        [[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h], [0, 0, 1]], np.float32
    )
    return {
        "img_cur": jnp.asarray(rng.randint(0, 255, (S, h, w, 3)), jnp.uint8),
        "img_ref": jnp.asarray(rng.randint(0, 255, (S, h, w, 3)), jnp.uint8),
        "depth_ref": jnp.asarray(rng.uniform(1, 40, (S, h, w)), jnp.float32),
        "prev": jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (S, 4, 4)),
        "rngs": jax.vmap(jax.random.PRNGKey)(jnp.arange(S, dtype=jnp.uint32)),
        "K": jnp.broadcast_to(jnp.asarray(K), (S, 3, 3)),
        "K_inv": jnp.broadcast_to(
            jnp.asarray(np.linalg.inv(K).astype(np.float32)), (S, 3, 3)
        ),
    }


@pytest.mark.xdist_group("multiseq")
def test_multiseq_vo_step_shards_over_devices(runner):
    S = 4
    b = _batch(runner, S)
    variables = runner.frontend.init_variables(jax.random.PRNGKey(0))
    vo_step = runner.make_vo_step()
    poses, modes, depth_cur = vo_step(
        variables, b["img_cur"], b["img_ref"], b["depth_ref"], b["prev"],
        b["rngs"], b["K"], b["K_inv"],
    )
    assert poses.shape == (S, 4, 4)
    assert np.isfinite(np.asarray(poses)).all()
    assert depth_cur.shape == (S, 64, 96)
    # outputs actually sharded over the mesh axis
    sharding = poses.sharding
    assert len(sharding.device_set) == 4


@pytest.mark.xdist_group("multiseq")
def test_multiseq_train_step_reduces_gradients(runner):
    S = 4
    b = _batch(runner, S)
    variables = runner.frontend.init_variables(jax.random.PRNGKey(0))
    opt_state = runner.finetuner.init_state(
        variables, np.asarray(b["K"]), np.asarray(b["K_inv"])
    )
    train_step = runner.make_train_step()
    img_ref_f = b["img_ref"].astype(jnp.float32) / 255.0
    img_cur_f = b["img_cur"].astype(jnp.float32) / 255.0
    new_vars, new_opt, loss = train_step(
        variables, opt_state, img_ref_f, img_cur_f, b["prev"]
    )
    assert np.isfinite(float(loss))
    # parameters actually changed (sum of absolute deltas over all leaves)
    deltas = jax.tree.map(
        lambda a, b: float(jnp.sum(jnp.abs(a - b))),
        variables["flow"]["params"],
        new_vars["flow"]["params"],
    )
    assert sum(jax.tree.leaves(deltas)) > 1e-3
    # depth params untouched (finetuning disabled for depth)
    b0 = jax.tree.leaves(variables["depth"]["params"])[0]
    a0 = jax.tree.leaves(new_vars["depth"]["params"])[0]
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(a0))


@pytest.mark.xdist_group("multiseq")
def test_dryrun_multichip_entrypoint():
    """The driver-facing dryrun itself must stay green (VERDICT r1 item 1).

    conftest already forces the 8-device virtual CPU mesh, so the
    function's own forcing is a no-op here; what this guards is the
    entry point wiring (mesh build, shardings, one VO + one finetune step).
    """
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# multi-sequence CLI end to end (mirrors test_pipeline's single-seq CLI
# test): synthetic KITTI-layout sequences -> apis/run_multiseq.py on the
# virtual 8-device mesh -> per-sequence trajectory files -> eval tool
# ---------------------------------------------------------------------------
@pytest.mark.xdist_group("multiseq")
@pytest.mark.parametrize("execution", ["frame", "scan"])
def test_multiseq_cli_end_to_end(tmp_path, execution):
    import os
    import sys

    cv2 = pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    seqs = ["00", "01", "02"]
    n_frames = 5
    root = tmp_path / "kitti"
    gt_dir = root / "gt_poses"
    gt_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    big = (rng.rand(500, 1500, 3) * 255).astype(np.uint8)
    big = cv2.GaussianBlur(big, (0, 0), 3)
    for s_i, s in enumerate(seqs):
        img_dir = root / "odom_data" / s / "image_2"
        img_dir.mkdir(parents=True)
        lines = []
        for i in range(n_frames):
            crop = big[
                50 + 5 * s_i : 50 + 5 * s_i + 370, 10 * i : 10 * i + 1226
            ]
            cv2.imwrite(str(img_dir / f"{i:06d}.jpg"), crop)
            P = np.eye(4)
            P[0, 3] = 0.1 * i
            lines.append(" ".join(str(v) for v in P.flatten()[:12]))
        (gt_dir / f"{s}.txt").write_text("\n".join(lines) + "\n")
        (root / "odom_data" / s / "calib.txt").write_text(
            "\n".join(
                f"P{j}: 707.09 0.0 601.88 0.0 0.0 707.09 183.11 0.0 "
                "0.0 0.0 1.0 0.0"
                for j in range(4)
            )
            + "\n"
        )

    custom = tmp_path / "custom.yml"
    custom.write_text(
        "image:\n"
        "    height: 64\n"
        "    width: 96\n"
        "directory:\n"
        f"    img_seq_dir: {root / 'odom_data'}\n"
        f"    gt_pose_dir: {gt_dir}\n"
        f"    result_dir: {tmp_path / 'result'}\n"
        "tpu:\n"
        "    ransac_hypotheses: 32\n"
        f"    execution: {execution}\n"
        "    scan_chunk: 2\n"  # 4 tracked frames -> 2 chunks per sequence
    )

    import runpy

    argv = sys.argv
    sys.argv = [
        "run_multiseq.py",
        "-d", os.path.join(repo, "options/examples/default_configuration.yml"),
        "-c", str(custom),
        "--seqs", *seqs,
    ]
    try:
        runpy.run_path(
            os.path.join(repo, "apis/run_multiseq.py"), run_name="__main__"
        )
    finally:
        sys.argv = argv

    from dfvo_tpu.evaluation.kitti_odometry import KittiEvalOdom
    from dfvo_tpu.utils.io import load_poses_from_txt

    for s in seqs:
        traj = tmp_path / "result" / f"{s}.txt"
        assert traj.exists(), f"missing trajectory for seq {s}"
        poses = load_poses_from_txt(str(traj))
        assert len(poses) == n_frames
        assert all(np.isfinite(p).all() for p in poses.values())

    evaluator = KittiEvalOdom()
    summary = evaluator.eval(
        str(gt_dir), str(tmp_path / "result"), alignment="6dof", seqs=seqs
    )
    assert (tmp_path / "result" / "result.txt").exists()
