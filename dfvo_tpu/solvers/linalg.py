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
