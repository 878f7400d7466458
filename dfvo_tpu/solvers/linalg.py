"""TPU-friendly small-matrix linear algebra for the solver stack.

Batched small SVD/eigh are the TPU's weak spot: XLA lowers them to long
sequential Jacobi/QR iteration chains that leave the MXU idle, and they
dominated the first profile of the fused tracking step. The RANSAC solvers
only ever need the *nullspace direction* (right-singular vector of the
smallest singular value), which shift-inverted power iteration delivers
with a Cholesky factorization plus a handful of triangular solves — all
dense batched ops the TPU executes well.

Precision note: forming AᵀA squares the condition number, which is why
naive eigh(AᵀA) lost the smallest eigenvector in float32
(see solvers/essential.py history). Inverse iteration is different: the
*vector* it converges to is accurate as long as the smallest eigenvalue is
separated from the rest — exactly the case for minimal-sample design
matrices (exact nullspace) and inlier refits (consensus direction well
below the data spread). The solver test suite (vs OpenCV oracles) gates
this numerically.
"""

import jax
import jax.numpy as jnp

from ..utils.precision import highp


@highp
def nullspace_vector(A, iters=10, shift=1e-6):
    """Approximate right-singular vector of A's smallest singular value.

    Args:
        A: [... x m x n] design matrix (m >= n).
        iters: inverse-iteration steps (static).
        shift: relative diagonal shift (times mean diagonal) keeping the
            Cholesky positive definite when A has an exact nullspace.

    Returns:
        [... x n] unit vector minimizing ‖A v‖.
    """
    n = A.shape[-1]
    M = jnp.einsum("...ij,...ik->...jk", A, A)
    mean_diag = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / n
    M = M + shift * mean_diag * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(M)

    # deterministic start vector with generic overlap
    v = jnp.ones(A.shape[:-2] + (n,), A.dtype) / jnp.sqrt(
        jnp.asarray(n, A.dtype)
    )

    def body(_, v):
        y = jax.scipy.linalg.solve_triangular(
            L, v[..., None], lower=True
        )
        y = jax.scipy.linalg.solve_triangular(
            L, y, lower=True, trans=1
        )[..., 0]
        return y / jnp.maximum(
            jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30
        )

    return jax.lax.fori_loop(0, iters, body, v)


@highp
def inv_3x3(M):
    """Closed-form batched 3x3 inverse via the adjugate (elementwise ops —
    no LU/solve kernels)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


@highp
def nearest_rotation(M, iters=5):
    """Orthogonal polar factor of (generically nonsingular) [... x 3 x 3]
    matrices via Newton iteration X <- (X + X^-T)/2 — the batched-SVD-free
    replacement for projecting onto SO(3). Also returns the mean singular
    value (= tr(RᵀM)/3), the scale factor PnP needs.

    For det(M) < 0 the limit is a reflection; callers flip the sign first
    (as with the SVD det correction).
    """
    # normalize magnitude for fast convergence
    norm = jnp.sqrt(
        jnp.sum(M * M, axis=(-2, -1), keepdims=True) / 3.0
    )
    X = M / jnp.maximum(norm, 1e-30)

    def body(_, X):
        return 0.5 * (X + jnp.swapaxes(inv_3x3(X), -1, -2))

    R = jax.lax.fori_loop(0, iters, body, X)
    scale = jnp.einsum("...ji,...ji->...", R, M) / 3.0
    return R, scale


@highp
def smallest_eigvec_3x3(C):
    """Unit eigenvector of the smallest eigenvalue of symmetric [... x 3 x 3]
    matrices, fully closed form (Cardano eigenvalues + projector column) —
    used for plane fitting inside the planar PnP minimal solver."""
    q = jnp.trace(C, axis1=-2, axis2=-1) / 3.0
    Cq = C - q[..., None, None] * jnp.eye(3, dtype=C.dtype)
    p2 = jnp.sum(Cq * Cq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    B = Cq / p[..., None, None]
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3
    # (C - λ1 I)(C - λ2 I) = (λ3-λ1)(λ3-λ2) v3 v3ᵀ: any nonzero column ∝ v3
    eye = jnp.eye(3, dtype=C.dtype)
    P = (C - lam1[..., None, None] * eye) @ (C - lam2[..., None, None] * eye)
    norms = jnp.linalg.norm(P, axis=-2)  # column norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(P, best[..., None, None], axis=-1)[..., 0]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # degenerate case (C ∝ I): any direction is an eigenvector
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], C.dtype), v.shape
    )
    v = jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30), fallback)
    return v
