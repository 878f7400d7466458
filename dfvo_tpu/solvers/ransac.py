"""Shared machinery for batched, fixed-shape RANSAC on TPU.

The reference runs serial OpenCV RANSAC loops on the host
(E_tracker.py:223-287, pnp_tracker.py:89-110). Here every hypothesis is a lane
of a `jax.vmap`: we draw M minimal samples at once, solve M models in one
batched linear-algebra call, and score all N correspondences against all M
models with one einsum — the classic hundreds-of-iterations loop becomes two
MXU-friendly batched ops.

Keypoint sets are fixed-size arrays with validity masks (SURVEY.md §7 "static
shapes"), so compile once and reuse for every frame.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _mix32(x):
    """splitmix/murmur3-style 32-bit avalanche (full-period bijection)."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _valid_front_order(valid_mask):
    """Stable compaction permutation: valid indices first, invalid after.

    Built WITHOUT a sort (XLA sort of the kp array costs ~0.1 ms per RANSAC
    entry point on TPU; cumsum + scatter is a bandwidth-bound O(N) pass).

    Returns:
        (order [N] int32, count uint32) — ``order[:count]`` are the valid
        indices in original order; count is clamped to >= 1.
    """
    n = valid_mask.shape[0]
    cs_valid = jnp.cumsum(valid_mask)
    n_valid = cs_valid[-1]
    cs_invalid = jnp.cumsum(~valid_mask)
    pos = jnp.where(valid_mask, cs_valid - 1, n_valid + cs_invalid - 1)
    order = jnp.zeros(n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return order, jnp.maximum(n_valid, 1).astype(jnp.uint32)


def _hash_draw(rng, num_draws, count):
    """``[num_draws]`` int32 uniform draws in [0, count) from a hashed iota.

    Counter-based hash draw instead of jax.random.randint: threefry on
    TPU costs ~0.23 ms/frame for these tables under the tracking vmap
    (round-3 device trace, s32[32,1280,8] fusions); a splitmix-style
    avalanche of a seeded iota is statistically ample for RANSAC
    sample selection and is a handful of elementwise VPU ops.
    """
    kd = jnp.asarray(jax.random.key_data(rng), jnp.uint32).reshape(-1)
    base = _mix32(kd[0] * np.uint32(0x9E3779B9) ^ _mix32(kd[-1]))
    iota = jax.lax.iota(jnp.uint32, num_draws)
    raw = _mix32(iota * np.uint32(0x9E3779B9) + base)
    return (raw % count).astype(jnp.int32)


def sample_indices(rng, valid_mask, num_hypotheses, sample_size):
    """Draw ``[M x k]`` indices of valid points for minimal samples.

    Valid indices are compacted to the front with a stable cumsum scatter,
    then sampled uniformly (with replacement across hypotheses; duplicates
    within a sample are possible but rare for N >> k and merely waste that
    hypothesis — the degenerate model scores few inliers and loses the
    argmax).

    Args:
        rng: PRNG key.
        valid_mask: [N] boolean validity of each correspondence.
        num_hypotheses: M, number of minimal samples.
        sample_size: k, points per sample.

    Returns:
        [M x k] int32 indices into the N points (always valid indices, as
        long as at least one point is valid).
    """
    order, count = _valid_front_order(valid_mask)
    draws = _hash_draw(rng, num_hypotheses * sample_size, count)
    return order[draws.reshape(num_hypotheses, sample_size)]


def sample_points(rng, pts, valid_mask, num_hypotheses, sample_size):
    """Draw ``[M x k x D]`` sampled POINT ROWS (bit-identical to
    ``pts[sample_indices(...)]`` but ~2.5x fewer gather rows).

    TPU gathers pay a per-row floor regardless of byte width (CLAUDE.md),
    so ``pts[order[raw % count]]`` as two narrow M·k-row gathers (plus the
    M·k-row index lookup) costs ~0.25 ms/frame at the tracking sizes
    (r4 profile: %fusion.46/.47/.48). Reassociating to
    ``(pts[order])[raw % count]`` replaces the index lookup with one
    N-row compaction gather and lets callers PACK all point arrays into
    ``D`` columns for a single sample gather.

    Args:
        rng: PRNG key.
        pts: [N x D] point rows (concatenate kp1/kp2/etc. on D first).
        valid_mask: [N] boolean validity.
        num_hypotheses: M.
        sample_size: k.

    Returns:
        [M x k x D] sampled rows (valid rows only, given any valid point).
    """
    order, count = _valid_front_order(valid_mask)
    compact = jnp.take(
        pts, order, axis=0, mode="clip"
    )  # [N x D], valid rows first
    draws = _hash_draw(rng, num_hypotheses * sample_size, count)
    picked = jnp.take(compact, draws, axis=0, mode="clip")
    return picked.reshape(num_hypotheses, sample_size, pts.shape[-1])


def best_hypothesis(inlier_counts):
    """Index of the hypothesis with most inliers."""
    return jnp.argmax(inlier_counts)
