"""Geometric Robust Information Criterion (GRIC) for E-vs-H model selection.

Vectorized rebuild of the reference's per-residual Python loop
(/root/reference/libs/tracker/gric.py:14-132): identical residual definitions
and score so the H>E decision (E_tracker.py:258-271) matches.
"""

import jax.numpy as jnp

from ..utils.precision import highp

_MODEL_K = {"FMat": 7.0, "EMat": 5.0, "HMat": 8.0}
_MODEL_D = {"FMat": 3.0, "EMat": 3.0, "HMat": 2.0}


@highp
def fundamental_residual(F, kp1, kp2, mask=None):
    """First-order geometric (Sampson-style) residual of F per correspondence.

    Matches compute_fundamental_residual (gric.py:14-37):
    (x2ᵀ F x1)² / (‖(Fx1)_{xy}‖² + ‖(Fᵀx2)_{xy}‖²).
    """
    p1 = jnp.concatenate([kp1, jnp.ones_like(kp1[..., :1])], axis=-1)
    p2 = jnp.concatenate([kp2, jnp.ones_like(kp2[..., :1])], axis=-1)
    Fx1 = p1 @ F.T
    Ftx2 = p2 @ F
    num = jnp.sum(p2 * Fx1, axis=-1) ** 2
    den = (
        Fx1[..., 0] ** 2
        + Fx1[..., 1] ** 2
        + Ftx2[..., 0] ** 2
        + Ftx2[..., 1] ** 2
    )
    res = num / jnp.maximum(den, 1e-12)
    if mask is not None:
        res = jnp.where(mask, res, 0.0)
    return res


@highp
def homography_residual(H, kp1, kp2, mask=None):
    """Approximate geometric residual of H per correspondence.

    Matches compute_homography_residual (gric.py:40-91): algebraic error of
    both rows normalized by their gradient magnitudes, combined with the
    angle between the two constraint gradients.
    """
    h = H.reshape(-1)
    x1, y1 = kp1[..., 0], kp1[..., 1]
    x2, y2 = kp2[..., 0], kp2[..., 1]

    G0 = jnp.stack(
        [
            h[0] - x2 * h[6],
            h[1] - x2 * h[7],
            -x1 * h[6] - y1 * h[7] - h[8],
        ],
        axis=-1,
    )
    G1 = jnp.stack(
        [
            h[3] - y2 * h[6],
            h[4] - y2 * h[7],
            -x1 * h[6] - y1 * h[7] - h[8],
        ],
        axis=-1,
    )
    magG0 = jnp.linalg.norm(G0, axis=-1)
    magG1 = jnp.linalg.norm(G1, axis=-1)
    magG0G1 = G0[..., 0] * G1[..., 0] + G0[..., 1] * G1[..., 1]
    alpha = jnp.arccos(
        jnp.clip(magG0G1 / jnp.maximum(magG0 * magG1, 1e-12), -1.0, 1.0)
    )

    alg0 = x1 * h[0] + y1 * h[1] + h[2] - x2 * (x1 * h[6] + y1 * h[7] + h[8])
    alg1 = x1 * h[3] + y1 * h[4] + h[5] - y2 * (x1 * h[6] + y1 * h[7] + h[8])

    D1 = alg0 / jnp.maximum(magG0, 1e-12)
    D2 = alg1 / jnp.maximum(magG1, 1e-12)

    sin_a = jnp.sin(alpha)
    sin_a = jnp.where(jnp.abs(sin_a) < 1e-12, 1e-12, sin_a)
    res = (D1 * D1 + D2 * D2 - 2.0 * D1 * D2 * jnp.cos(alpha)) / sin_a
    if mask is not None:
        res = jnp.where(mask, res, 0.0)
    return res


@highp
def calc_gric(res, sigma, n, model, mask=None):
    """GRIC score (lower = better model), matching calc_GRIC (gric.py:94-132).

    Args:
        res: [N] residuals.
        sigma: assumed residual std.
        n: effective number of correspondences (scalar; pass the *valid*
            count when using masks so the complexity terms match the
            reference's dynamic-N behavior).
        model: 'FMat' | 'EMat' | 'HMat' (static).
        mask: optional [N] boolean; excluded residuals contribute 0.
    """
    R = 4.0
    K = _MODEL_K[model]
    D = _MODEL_D[model]
    lam3RD = 2.0 * (R - D)
    terms = jnp.minimum(res / (sigma**2), lam3RD)
    if mask is not None:
        terms = jnp.where(mask, terms, 0.0)
    n = jnp.asarray(n, terms.dtype)
    return jnp.sum(terms) + n * D * jnp.log(R) + K * jnp.log(R * n)
