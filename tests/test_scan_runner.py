"""Scan-mode (on-device frame loop) tests."""

import os

import numpy as np

import jax

from dfvo_tpu.pipeline.scan_runner import ScanRunner
from dfvo_tpu.utils import ConfigLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scan_runner_matches_per_frame_loop():
    cfg = ConfigLoader().merge_cfg(
        [os.path.join(REPO, "options/examples/default_configuration.yml")]
    )
    cfg.image.height = 64
    cfg.image.width = 96
    cfg.tpu.ransac_hypotheses = 32
    cfg.tpu.scan_chunk = 3

    runner = ScanRunner(cfg)
    variables = runner.frontend.init_variables(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (8, 64, 96, 3), dtype=np.uint8)
    K = np.array(
        [[55.0, 0, 48.0], [0, 123.0, 32.0], [0, 0, 1.0]], np.float32
    )
    K_inv = np.linalg.inv(K).astype(np.float32)

    poses = runner.run(variables, frames, K, K_inv)
    assert len(poses) == 8
    np.testing.assert_allclose(poses[0], np.eye(4))
    for p in poses.values():
        assert np.isfinite(p).all()
        # valid rotation block
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
