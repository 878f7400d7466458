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
