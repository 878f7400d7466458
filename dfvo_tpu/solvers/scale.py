"""1-D RANSAC scale estimation from triangulated-vs-CNN depth ratios.

TPU-native replacement for the sklearn ``RANSACRegressor(LinearRegression
(fit_intercept=False))`` fit in the reference's scale recovery
(E_tracker.py:614-641): fits c minimizing ‖c·ratio - 1‖ over inliers, so the
returned scale multiplies the unit translation into metric units.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.precision import highp
from .ransac import sample_points


@partial(jax.jit, static_argnames=("num_hypotheses", "min_samples"))
@highp
def scale_ransac_1d(
    rng,
    ratios,
    valid_mask,
    threshold=0.1,
    num_hypotheses=100,
    min_samples=3,
):
    """RANSAC fit of c with residual |c * ratio - 1| (no intercept).

    Args:
        rng: PRNG key.
        ratios: [N] depth ratios (triangulated / CNN-predicted).
        valid_mask: [N] boolean validity.
        threshold: inlier residual threshold (reference
            scale_recovery.ransac.thre = 0.1).
        num_hypotheses: RANSAC trials (reference max_trials = 100).
        min_samples: points per minimal fit (reference min_samples = 3).

    Returns:
        dict with ``scale`` (float; the caller maps "too few valid points"
        to the reference's -1 sentinel), ``inliers`` [N], ``inlier_cnt``.
    """
    x = sample_points(
        rng, ratios[:, None], valid_mask, num_hypotheses, min_samples
    )[..., 0]  # [M, k]
    # least squares of x*c = 1 on the sample: c = Σx / Σx²
    cs = jnp.sum(x, axis=1) / jnp.maximum(jnp.sum(x * x, axis=1), 1e-12)

    resid = jnp.abs(cs[:, None] * ratios[None, :] - 1.0)
    inliers = (resid < threshold) & valid_mask[None, :]
    counts = jnp.sum(inliers, axis=1)
    best = jnp.argmax(counts)

    # final fit on the best inlier set
    w = inliers[best].astype(ratios.dtype)
    c = jnp.sum(w * ratios) / jnp.maximum(jnp.sum(w * ratios * ratios), 1e-12)
    resid_f = jnp.abs(c * ratios - 1.0)
    inl_f = (resid_f < threshold) & valid_mask
    return {
        "scale": c,
        "inliers": inl_f,
        "inlier_cnt": jnp.sum(inl_f),
    }
