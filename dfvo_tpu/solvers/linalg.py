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


def det3(M):
    """Closed-form determinant of [... x 3 x 3] matrices.

    ``jnp.linalg.det`` lowers 3x3 batches to LU with *dynamic-index*
    pivot swaps on TPU — a serialized dynamic-update-slice chain worth
    ~0.2 ms/frame in the tracking step (round-3 device trace,
    %dynamic-update-slice f32[32,256,3,3]). The cofactor expansion is
    nine fused multiplies instead."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def cholesky_unrolled(M):
    """Batched Cholesky of small SPD matrices as pure unrolled vector ops.

    XLA lowers ``jnp.linalg.cholesky`` / ``solve_triangular`` on batched
    tiny matrices to LU/Cholesky *custom calls* that cost ~1 ms/frame in
    the tracking step (device profile, CLAUDE.md round 2). For n <= ~12 the
    unrolled textbook algorithm is a few hundred fused elementwise ops on
    [batch]-shaped vectors — no custom call, no sequential kernel.

    Args:
        M: [... x n x n] SPD matrices (n static, small).

    Returns:
        [... x n x n] lower-triangular L with M = L Lᵀ.
    """
    n = M.shape[-1]
    cols = [[None] * n for _ in range(n)]  # cols[i][j] = L[..., i, j]
    for j in range(n):
        s = M[..., j, j]
        for k in range(j):
            s = s - cols[j][k] * cols[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        cols[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[..., i, j]
            for k in range(j):
                s = s - cols[i][k] * cols[j][k]
            cols[i][j] = s * inv_d
    zero = jnp.zeros_like(M[..., 0, 0])
    # one flat n²-way stack (single concatenate pass; nested trailing-axis
    # stacks lower to serialized dynamic-update-slice chains under vmap)
    flat = [
        cols[i][j] if j <= i else zero
        for i in range(n)
        for j in range(n)
    ]
    return jnp.stack(flat, axis=-1).reshape(zero.shape + (n, n))


def tril_inverse_unrolled(L):
    """Batched inverse of small lower-triangular matrices (unrolled forward
    substitution on the identity; same rationale as cholesky_unrolled)."""
    n = L.shape[-1]
    inv_diag = [1.0 / L[..., i, i] for i in range(n)]
    X = [[None] * n for _ in range(n)]  # X[i][j] = L^-1[..., i, j]
    zero = jnp.zeros_like(L[..., 0, 0])
    for j in range(n):
        for i in range(n):
            if i < j:
                X[i][j] = zero
            elif i == j:
                X[i][j] = inv_diag[i]
            else:
                s = zero
                for k in range(j, i):
                    s = s + L[..., i, k] * X[k][j]
                X[i][j] = -s * inv_diag[i]
    flat = [X[i][j] for i in range(n) for j in range(n)]
    return jnp.stack(flat, axis=-1).reshape(zero.shape + (n, n))


def spd_inverse_small(M):
    """Batched inverse of small SPD matrices: M⁻¹ = L⁻ᵀ L⁻¹ with the
    unrolled Cholesky — pure elementwise ops + one batched matmul."""
    L = cholesky_unrolled(M)
    Li = tril_inverse_unrolled(L)
    return jnp.einsum("...ki,...kj->...ij", Li, Li)


def spd_solve_small(M, b):
    """Solve M x = b for small SPD M without LU custom calls."""
    return jnp.einsum("...ij,...j->...i", spd_inverse_small(M), b)


@highp
def spd_smallest_eigvec(M, iters=8, shift=1e-6):
    """Unit eigenvector of the smallest eigenvalue of small SPD matrices by
    shift-inverted power iteration (replaces batched ``jnp.linalg.eigh`` —
    a slow sequential custom call on TPU; cf. triangulate_points).

    Args:
        M: [... x n x n] SPD matrices (n static, small).
        iters: power-iteration steps (static).
        shift: relative diagonal shift (times mean diagonal).

    Returns:
        [... x n] unit eigenvector of the smallest eigenvalue.
    """
    n = M.shape[-1]
    mean_diag = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / n
    Ms = M + shift * mean_diag * jnp.eye(n, dtype=M.dtype)
    Minv = spd_inverse_small(Ms)
    v = jnp.ones(M.shape[:-1], M.dtype) / jnp.sqrt(jnp.asarray(n, M.dtype))

    def body(_, v):
        y = jnp.einsum("...ij,...j->...i", Minv, v)
        return y / jnp.maximum(
            jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30
        )

    return jax.lax.fori_loop(0, iters, body, v)


def cholesky_soa(m):
    """Structure-of-arrays Cholesky: ``m`` is an n x n list-of-lists of
    same-shaped batch arrays (lower triangle read; ``m[i][j]`` with i >= j).

    Rationale: the array form (cholesky_unrolled) materializes
    [batch x n x n] tensors whose minor (n, n) dims tile-pad to (8, 128) —
    a ~14x HBM tax at n = 9 that made the essential-RANSAC nullspace
    fusions the single biggest tracking item (r4 device profile,
    %slice_reduce_fusion.202/.187 reading f32[32,1280,9,9]). Keeping every
    matrix entry as its own [batch] array leaves the hypothesis axis on
    lanes with zero padding.

    Returns:
        n x n list-of-lists L (entries below the diagonal, None above).
    """
    n = len(m)
    cols = [[None] * n for _ in range(n)]
    for j in range(n):
        s = m[j][j]
        for k in range(j):
            s = s - cols[j][k] * cols[j][k]
        d = jnp.sqrt(jnp.maximum(s, 1e-30))
        cols[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = m[i][j]
            for k in range(j):
                s = s - cols[i][k] * cols[j][k]
            cols[i][j] = s * inv_d
    return cols


def tril_inverse_soa(L):
    """Structure-of-arrays inverse of a lower-triangular list-of-lists
    (forward substitution on the identity; cf. tril_inverse_unrolled)."""
    n = len(L)
    inv_diag = [1.0 / L[i][i] for i in range(n)]
    X = [[None] * n for _ in range(n)]
    for j in range(n):
        for i in range(j, n):
            if i == j:
                X[i][j] = inv_diag[i]
            else:
                s = L[i][j] * X[j][j]
                for k in range(j + 1, i):
                    s = s + L[i][k] * X[k][j]
                X[i][j] = -s * inv_diag[i]
    return X


def spd_smallest_eigvec_soa(m, iters=8, shift=1e-6):
    """Structure-of-arrays shift-inverted power iteration (see
    spd_smallest_eigvec): ``m`` is an n x n list-of-lists of [batch]
    arrays (symmetric; lower triangle read). Returns a tuple of n [batch]
    arrays — the unit eigenvector of the smallest eigenvalue."""
    n = len(m)
    mean_diag = m[0][0]
    for i in range(1, n):
        mean_diag = mean_diag + m[i][i]
    mean_diag = mean_diag / n
    ms = [
        [
            m[i][j] + shift * mean_diag if i == j else m[i][j]
            for j in range(i + 1)
        ]
        for i in range(n)
    ]
    L = cholesky_soa(ms)
    Li = tril_inverse_soa(L)
    # Minv = L^-T L^-1 (symmetric; build lower triangle, mirror by reuse)
    Minv = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = None
            for k in range(max(i, j), n):
                t = Li[k][i] * Li[k][j]
                s = t if s is None else s + t
            Minv[i][j] = s
            Minv[j][i] = s
    inv_sqrt_n = 1.0 / float(n) ** 0.5
    v0 = tuple(
        jnp.full_like(m[0][0], inv_sqrt_n) for _ in range(n)
    )

    def body(_, v):
        y = []
        for i in range(n):
            s = Minv[i][0] * v[0]
            for j in range(1, n):
                s = s + Minv[i][j] * v[j]
            y.append(s)
        nrm2 = y[0] * y[0]
        for i in range(1, n):
            nrm2 = nrm2 + y[i] * y[i]
        inv_n = 1.0 / jnp.maximum(jnp.sqrt(nrm2), 1e-30)
        return tuple(yi * inv_n for yi in y)

    return jax.lax.fori_loop(0, iters, body, v0)


@highp
def nullspace_vector(A, iters=10, shift=1e-6):
    """Approximate right-singular vector of A's smallest singular value.

    Shift-inverted power iteration with the inverse formed ONCE by the
    unrolled small-matrix Cholesky (no LU/triangular-solve custom calls —
    those cost ~1.2 ms/frame at batch 1280 in the round-2 device profile);
    each iteration is then a single fused batched matvec.

    Args:
        A: [... x m x n] design matrix (m >= n).
        iters: inverse-iteration steps (static).
        shift: relative diagonal shift (times mean diagonal) keeping the
            Cholesky positive definite when A has an exact nullspace.

    Returns:
        [... x n] unit vector minimizing ‖A v‖.
    """
    M = jnp.einsum("...ij,...ik->...jk", A, A)
    return spd_smallest_eigvec(M, iters=iters, shift=shift)


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
    # single 9-way stack + reshape (one concatenate pass) — nested stacks
    # on the two trailing axes lowered to a serialized dynamic-update-slice
    # chain over [B,hyps,3,3] under the RANSAC vmap (round-4 device trace)
    adj = jnp.stack(
        [
            A, -(b * i - c * h), b * f - c * e,
            B, a * i - c * g, -(a * f - c * d),
            C, -(a * h - b * g), a * e - b * d,
        ],
        axis=-1,
    ).reshape(A.shape + (3, 3))
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
def essential_uv_closed(E):
    """Closed-form SVD frames of a (near-)essential 3x3 matrix.

    Replaces ``jnp.linalg.svd(E)`` (a slow sequential custom call on TPU,
    several per frame via projection/decomposition) with the Cardano
    eigendecomposition of EᵀE: eigenvalues in closed form, v3 from a
    projector product (well separated — σ3 ≈ 0 for essentials), v1 from the
    complementary projector re-orthogonalized against v3 (for a true
    essential σ1 = σ2, so any in-plane direction is valid — the essential
    projection u1 v1ᵀ + u2 v2ᵀ and the U W Vᵀ decompositions are invariant
    to the in-plane rotation because W commutes with rotations about z).

    Returns:
        (U [3x3], V [3x3], s [3]) with E ≈ U diag(s) Vᵀ and
        det(U) = det(V) = +1 by construction.
    """
    C = E.T @ E
    q = jnp.trace(C) / 3.0
    Cq = C - q * jnp.eye(3, dtype=C.dtype)
    p2 = jnp.sum(Cq * Cq) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    B = Cq / p
    r = jnp.clip(det3(B) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam2 = 3.0 * q - lam1 - lam3

    eye = jnp.eye(3, dtype=C.dtype)

    def projector_col(la, lb):
        P = (C - la * eye) @ (C - lb * eye)
        norms = jnp.linalg.norm(P, axis=0)
        return P[:, jnp.argmax(norms)]

    # v3 (smallest): well separated for essentials
    w3 = projector_col(lam1, lam2)
    n3 = jnp.linalg.norm(w3)
    fb3 = jnp.array([0.0, 0.0, 1.0], C.dtype)
    v3 = jnp.where(n3 > 1e-20, w3 / jnp.maximum(n3, 1e-30), fb3)

    # v1 (largest): may be degenerate with v2 — re-orthogonalize against v3
    w1 = projector_col(lam2, lam3)
    w1 = w1 - jnp.dot(w1, v3) * v3
    n1 = jnp.linalg.norm(w1)
    # fallback: any direction orthogonal to v3
    a = jnp.eye(3, dtype=C.dtype)[jnp.argmin(jnp.abs(v3))]
    fb1 = jnp.cross(v3, a)
    fb1 = fb1 / jnp.maximum(jnp.linalg.norm(fb1), 1e-30)
    v1 = jnp.where(n1 > 1e-12, w1 / jnp.maximum(n1, 1e-30), fb1)
    v2 = jnp.cross(v3, v1)

    Ev1 = E @ v1
    Ev2 = E @ v2
    s1 = jnp.linalg.norm(Ev1)
    u1 = Ev1 / jnp.maximum(s1, 1e-30)
    Ev2o = Ev2 - jnp.dot(Ev2, u1) * u1
    s2 = jnp.linalg.norm(Ev2o)
    # fallback for rank-1 inputs: any direction orthogonal to u1
    b = jnp.eye(3, dtype=C.dtype)[jnp.argmin(jnp.abs(u1))]
    fbu = jnp.cross(u1, b)
    fbu = fbu / jnp.maximum(jnp.linalg.norm(fbu), 1e-30)
    u2 = jnp.where(s2 > 1e-12, Ev2o / jnp.maximum(s2, 1e-30), fbu)
    u3 = jnp.cross(u1, u2)

    U = jnp.stack([u1, u2, u3], axis=1)
    V = jnp.stack([v1, v2, v3], axis=1)
    # singular values evaluated directly on E (the Cardano eigenvalues lose
    # ~sqrt(eps) near the sigma1=sigma2 degeneracy of true essentials)
    s2f = jnp.dot(Ev2, u2)
    s3 = jnp.dot(E @ v3, u3)
    s = jnp.stack([s1, s2f, s3])
    return U, V, s


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
    detB = det3(B)
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
