"""Chunk-batched inference must match the per-frame inference path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfvo_tpu.pipeline.frontend import DeepFrontend
from dfvo_tpu.utils import ConfigLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("flow_kind", ["liteflow", "hd3"])
def test_infer_chunk_matches_per_frame(flow_kind):
    cfg = ConfigLoader().merge_cfg(
        [os.path.join(REPO, "options/examples/default_configuration.yml")]
    )
    cfg.image.height = 64
    cfg.image.width = 96
    cfg.deep_flow.network = flow_kind
    cfg.tpu.dtype = "float32"  # exact comparison
    frontend = DeepFrontend(cfg)
    variables = frontend.init_variables(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    all_imgs = jnp.asarray(rng.rand(4, 64, 96, 3).astype(np.float32))

    # jit the facades: eagerly dispatching the full networks op-by-op on
    # the single-core CI host costs minutes; jitted, each path is one
    # (persistently cached) compile
    infer_chunk = jax.jit(frontend.infer_chunk)
    infer = jax.jit(frontend.infer)

    chunk = infer_chunk(variables, all_imgs)

    for i in range(3):
        single = infer(variables, all_imgs[i + 1], all_imgs[i])
        np.testing.assert_allclose(
            np.asarray(chunk["depths"][i]),
            np.asarray(single["depth_cur"]),
            atol=1e-5,
            err_msg=f"depth mismatch frame {i}",
        )
        np.testing.assert_allclose(
            np.asarray(chunk["flow_fwd"][i]),
            np.asarray(single["flow_fwd"]),
            atol=1e-4,
            rtol=1e-5,
            err_msg=f"flow mismatch pair {i}",
        )
        np.testing.assert_allclose(
            np.asarray(chunk["flow_diff"][i]),
            np.asarray(single["flow_diff"]),
            # hd3 flow_diff magnitudes reach hundreds of pixels; allow the
            # float32 op-reordering between the batched and single programs
            atol=1e-4,
            rtol=1e-5,
            err_msg=f"flow_diff mismatch pair {i}",
        )
