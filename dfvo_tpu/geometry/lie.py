"""SO(3)/SE(3) helpers as pure JAX functions (batched via vmap).

Device-side equivalents of the reference's host rotation code:
`cv2.Rodrigues` (pnp_tracker.py:116) and `rot_from_axisangle`
(depth/monodepth2/layers.py:64-103).
"""

import jax.numpy as jnp

from ..utils.precision import highp


def skew(v):
    """[...x3] -> [...x3x3] skew-symmetric matrices ([v]_× w = v × w)."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


@highp
def so3_exp(w):
    """Axis-angle vector [...x3] -> rotation matrix [...x3x3] (Rodrigues).

    Uses series-safe sin/cos coefficients so the zero-rotation case is exact
    and differentiable.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + 1e-24)
    W = skew(w)
    W2 = W @ W
    # sin(t)/t and (1-cos(t))/t^2 with small-angle fallbacks
    small = theta_sq < 1e-12
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation matrix [...x3x3] -> axis-angle vector [...x3].

    Uses atan2(|vee|, tr) instead of arccos so gradients stay finite at the
    identity (arccos' derivative diverges at cos θ = 1, which NaN-poisons
    Gauss-Newton Jacobians of zero residuals).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # off-diagonal differences give 2 sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    two_sin_theta = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)
    theta = jnp.arctan2(0.5 * two_sin_theta, cos_theta)
    small = theta < 1e-4
    denom = jnp.where(small, 1.0, two_sin_theta)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / denom)
    return v * scale[..., None]


def make_se3(R, t):
    """(R [...x3x3], t [...x3]) -> homogeneous transform [...x4x4]."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


@highp
def se3_inverse(T):
    """Inverse of homogeneous transform(s) using the closed form
    [Rᵀ, -Rᵀt]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axis-angle [...x3], translation [...x3]) -> [...x4x4] transform.

    Matches the reference pose-CNN convention
    (depth/monodepth2/layers.py:28-45): T = trans(t) @ rot(aa), or the
    inverse composition when ``invert``.
    """
    R = so3_exp(axisangle)
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = jnp.einsum("...ij,...j->...i", R, -translation)
        return make_se3(R, t)
    return make_se3(R, translation)
