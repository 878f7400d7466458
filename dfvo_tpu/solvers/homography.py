"""Batched RANSAC homography estimation (4-point DLT).

TPU-native replacement for ``cv2.findHomography(..., method=RANSAC)``
(reference E_tracker.py:199-205), used only as the degeneracy detector for
GRIC model selection — H competes against E on planar/low-parallax frames.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.precision import highp
from .ransac import sample_points


def _hartley_transform(p, weights=None):
    """Similarity transform T mapping points to zero mean, avg distance √2.

    Float32 eigendecompositions need this conditioning: raw pixel coords
    (~1e2..1e3) blow the 9x9 normal matrix's dynamic range past f32.
    """
    if weights is None:
        w = jnp.ones_like(p[:, 0])
    else:
        w = weights
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mean = jnp.sum(p[:, :2] * w[:, None], axis=0) / wsum
    centered = p[:, :2] - mean
    dist = jnp.sqrt(jnp.sum(centered**2, axis=-1) + 1e-12)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(dist * w) / wsum, 1e-12)
    # one stack+reshape, not a .at[].set chain: under the [frames x hyps]
    # RANSAC vmap each .at lowers to a separate serialized dynamic-update-
    # slice pass over the whole [B,hyps,3,3] buffer (~0.19 ms/frame in the
    # round-4 device trace, %dynamic-update-slice.60-66)
    zero = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    return jnp.stack(
        [
            scale, zero, -scale * mean[0],
            zero, scale, -scale * mean[1],
            zero, zero, one,
        ],
        axis=-1,
    ).reshape(scale.shape + (3, 3))


@highp
def homography_from_sample(p1, p2, weights=None):
    """Normalized DLT homography from correspondences (x2 ~ H x1).

    Hartley-normalizes both point sets (mandatory in float32 — see
    :func:`_hartley_transform`), solves the 9x9 symmetric eigenproblem, and
    denormalizes.

    Args:
        p1, p2: [N x 3] homogeneous pixel coords (N >= 4).
        weights: optional [N] weights for inlier refits.

    Returns:
        [3 x 3] homography (defined up to scale).
    """
    T1 = _hartley_transform(p1, weights)
    T2 = _hartley_transform(p2, weights)
    p1 = p1 @ T1.T
    p2 = p2 @ T2.T
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    # standard two rows per correspondence
    r1 = jnp.stack(
        [x1, y1, one, zero, zero, zero, -x2 * x1, -x2 * y1, -x2], axis=-1
    )
    r2 = jnp.stack(
        [zero, zero, zero, x1, y1, one, -y2 * x1, -y2 * y1, -y2], axis=-1
    )
    A = jnp.concatenate([r1, r2], axis=0)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=0)
        A = A * w[:, None]
    from .linalg import nullspace_vector

    Hn = nullspace_vector(A).reshape(3, 3)
    # denormalize: x2 = T2⁻¹ Hn T1 x1 (closed-form 3x3 inverse — no LU
    # custom call inside the vmapped RANSAC)
    from .linalg import inv_3x3

    return inv_3x3(T2) @ (Hn @ T1)


@highp
def homography_transfer_error(H, p1, p2):
    """Squared forward transfer error ‖p2 - proj(H p1)‖² in pixels
    (the residual cv2's homography RANSAC thresholds).

    Component arithmetic rather than ``p1 @ H.T``: under the RANSAC vmap
    the dot materializes a [hyps x N x 3] intermediate XLA cannot fuse
    into the scoring reduction (see solvers/essential.py:sampson_error).
    """
    x1, y1, z1 = p1[..., 0], p1[..., 1], p1[..., 2]
    qx = H[0, 0] * x1 + H[0, 1] * y1 + H[0, 2] * z1
    qy = H[1, 0] * x1 + H[1, 1] * y1 + H[1, 2] * z1
    qw = H[2, 0] * x1 + H[2, 1] * y1 + H[2, 2] * z1
    qw = jnp.where(jnp.abs(qw) < 1e-12, 1e-12, qw)
    return (qx / qw - p2[..., 0]) ** 2 + (qy / qw - p2[..., 1]) ** 2


@partial(jax.jit, static_argnames=("num_hypotheses",))
@highp
def find_homography_ransac(
    rng, kp1, kp2, valid_mask, threshold=1.0, num_hypotheses=256
):
    """Batched RANSAC homography (x2 ~ H x1) with inlier-set refit.

    Args:
        rng: PRNG key.
        kp1, kp2: [N x 2] pixel correspondences.
        valid_mask: [N] boolean validity.
        threshold: inlier threshold in pixels (reference uses 1.0 for GRIC,
            E_tracker.py:204).
        num_hypotheses: number of 4-point samples (static).

    Returns:
        dict with ``H`` [3x3], ``inliers`` [N] bool, ``inlier_cnt``.
    """
    p1 = jnp.concatenate([kp1, jnp.ones_like(kp1[:, :1])], axis=-1)
    p2 = jnp.concatenate([kp2, jnp.ones_like(kp2[:, :1])], axis=-1)

    samp = sample_points(
        rng, jnp.concatenate([p1, p2], axis=-1), valid_mask,
        num_hypotheses, 4,
    )  # [M x 4 x 6] — one packed gather (see solvers/ransac.py)
    Hs = jax.vmap(
        lambda s: homography_from_sample(s[..., :3], s[..., 3:])
    )(samp)

    errs = jax.vmap(lambda H: homography_transfer_error(H, p1, p2))(Hs)
    inliers = (errs < threshold**2) & valid_mask[None, :]
    counts = jnp.sum(inliers, axis=1)

    best = jnp.argmax(counts)

    # iterated local optimization (see essential.py)
    def lo_round(_, carry):
        cur_inl, best_H, best_inl, best_cnt = carry
        H_refit = homography_from_sample(p1, p2, weights=cur_inl.astype(p1.dtype))
        err = homography_transfer_error(H_refit, p1, p2)
        new_inl = (err < threshold**2) & valid_mask
        new_cnt = jnp.sum(new_inl)
        better = new_cnt >= best_cnt
        return (
            new_inl,
            jnp.where(better, H_refit, best_H),
            jnp.where(better, new_inl, best_inl),
            jnp.where(better, new_cnt, best_cnt),
        )

    _, H_out, inl_out, cnt_out = jax.lax.fori_loop(
        0, 3, lo_round, (inliers[best], Hs[best], inliers[best], counts[best])
    )
    return {"H": H_out, "inliers": inl_out, "inlier_cnt": cnt_out}
