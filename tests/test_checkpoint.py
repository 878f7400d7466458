"""Checkpoint save/restore tests (orbax)."""

import numpy as np

import jax
import jax.numpy as jnp

from dfvo_tpu.utils.checkpoint import (
    CheckpointLogger,
    restore_variables,
    save_variables,
)


def small_tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "params": {
            "conv": {"kernel": jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)},
            "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        }
    }


def test_save_restore_roundtrip(tmp_path):
    tree = small_tree()
    path = str(tmp_path / "ckpt")
    save_variables(path, tree)
    restored = restore_variables(path, template={"variables": tree})
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored["variables"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_logger_best_tracking(tmp_path):
    logger = CheckpointLogger(str(tmp_path / "ckpts"), keep_n=2)
    for step, metric in [(0, 1.0), (1, 0.5), (2, 0.8)]:
        tree = small_tree(step)
        logger.save(step, tree, metric=metric)
    step, payload = logger.restore_latest(template={"variables": small_tree()})
    assert step == 2
    # best snapshot is from step 1 (metric 0.5)
    best = restore_variables(
        str(tmp_path / "ckpts" / "best"), template={"variables": small_tree()}
    )
    expect = small_tree(1)
    np.testing.assert_array_equal(
        np.asarray(best["variables"]["params"]["conv"]["kernel"]),
        np.asarray(expect["params"]["conv"]["kernel"]),
    )
