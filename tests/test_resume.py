"""Mid-sequence VO-state checkpoint/resume test (new capability; the
reference can only rerun a sequence from frame 0)."""

import os

import numpy as np
import pytest

from dfvo_tpu.utils import ConfigLoader
from tests.test_pipeline import synthetic_kitti  # noqa: F401 (fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_vo(synthetic_kitti, result_dir):
    from dfvo_tpu.pipeline import DFVO

    cfg = ConfigLoader().merge_cfg(
        [os.path.join(REPO, "options/examples/default_configuration.yml")]
    )
    cfg.seq = "42"
    # deliberately IDENTICAL jit-relevant config to test_pipeline's
    # TestPipelineSmoke (same image size / hypotheses / visualization
    # flags): the three DFVO instances here then share one traced step
    # function (dfvo._STEP_FN_CACHE) and, in the same xdist_group as the
    # pipeline smoke test, reuse its persisted compile — this test is
    # otherwise the single most expensive compile in the suite.
    cfg.image.height = 96
    cfg.image.width = 320
    cfg.directory.img_seq_dir = str(synthetic_kitti / "odom_data")
    cfg.directory.gt_pose_dir = str(synthetic_kitti / "gt_poses")
    cfg.directory.result_dir = str(result_dir)
    cfg.visualization.enable = True
    cfg.visualization.save_img = False
    cfg.tpu.ransac_hypotheses = 64
    return DFVO(cfg)


@pytest.mark.xdist_group("pipeline96x320")
def test_save_and_resume_matches_straight_run(synthetic_kitti, tmp_path):
    # straight run over 6 frames
    vo_a = make_vo(synthetic_kitti, tmp_path / "a")
    for i in range(6):
        vo_a.run_frame(i)

    # run 3 frames, checkpoint, resume in a fresh instance, run remaining 3
    vo_b = make_vo(synthetic_kitti, tmp_path / "b")
    for i in range(3):
        vo_b.run_frame(i)
    ckpt = str(tmp_path / "vo_state")
    vo_b.save_state(ckpt)

    vo_c = make_vo(synthetic_kitti, tmp_path / "c")
    resumed_at = vo_c.load_state(ckpt)
    assert resumed_at == 2
    for i in range(3, 6):
        vo_c.run_frame(i)

    assert sorted(vo_c.global_poses) == sorted(vo_a.global_poses)
    for k in vo_a.global_poses:
        np.testing.assert_allclose(
            vo_c.global_poses[k].pose,
            vo_a.global_poses[k].pose,
            atol=1e-5,
            err_msg=f"pose {k} differs after resume",
        )
