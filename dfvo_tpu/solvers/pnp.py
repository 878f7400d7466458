"""Batched RANSAC PnP (3D-2D pose) with Gauss-Newton refinement.

TPU-native replacement for ``cv2.solvePnPRansac`` + ``cv2.Rodrigues``
(reference pnp_tracker.py:89-116). Three vmapped minimal-solver lanes feed
one shared RANSAC scoring pass: a 6-point projection-matrix DLT (general
scenes), a plane-homography decomposition (coplanar scenes), and Grunert
P3P (solvers/p3p.py; dominant at low inlier ratios, matching OpenCV's
P3P/EPnP behavior). The winning hypothesis is polished by a
fixed-iteration Gauss-Newton on its inlier set, mirroring solvePnPRansac's
final LM refine.

Convention: solves x ~ K (R X + t) — (R, t) map *object-frame* (reference
view) points into the *image* (current) camera frame, exactly like
cv2.solvePnP(objectPoints, imagePoints); the tracker inverts the result as
the reference does (pnp_tracker.py:118).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.lie import skew, so3_exp
from ..utils.precision import highp
from .ransac import sample_points


@highp
def pnp_from_sample(X, x_norm, weights=None):
    """DLT estimate of [R|t] from 3D points and normalized image points.

    Args:
        X: [N x 3] object points (N >= 6).
        x_norm: [N x 2] normalized image coords (K⁻¹ applied).
        weights: optional [N] weights for refits.

    Returns:
        (R [3x3], t [3]).
    """
    ones = jnp.ones_like(X[:, :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # [N,4]
    u = x_norm[:, 0:1]
    v = x_norm[:, 1:2]
    zero4 = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, zero4, -u * Xh], axis=-1)  # [N,12]
    r2 = jnp.concatenate([zero4, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=0)
        A = A * w[:, None]
    # nullspace via shift-inverted power iteration; rotation via Newton
    # polar (see solvers/linalg.py — no batched SVD/eigh)
    from .linalg import det3, nearest_rotation, nullspace_vector

    M = nullspace_vector(A, iters=6).reshape(3, 4)
    # fix the projective scale sign so det(M[:, :3]) > 0 (proper rotation)
    M = M * jnp.sign(det3(M[:, :3]))
    R, scale = nearest_rotation(M[:, :3])
    t = M[:, 3] / jnp.maximum(scale, 1e-12)
    return R, t


def _inv_3x3_soa(m):
    """Closed-form 3x3 inverse on structure-of-arrays components
    (m[i][j] are [batch] arrays; see linalg.inv_3x3 for the array form)."""
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i = m[2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = [
        [A, -(b * i - c * h), b * f - c * e],
        [B, a * i - c * g, -(a * f - c * d)],
        [C, -(a * h - b * g), a * e - b * d],
    ]
    return [[adj[r][s] * inv_det for s in range(3)] for r in range(3)]


def _nearest_rotation_soa(m, iters=5):
    """Newton polar factor on SoA 3x3 components (see
    linalg.nearest_rotation): returns (R components, mean singular value).
    """
    nrm2 = None
    for r in range(3):
        for s in range(3):
            t = m[r][s] * m[r][s]
            nrm2 = t if nrm2 is None else nrm2 + t
    norm = jnp.maximum(jnp.sqrt(nrm2 / 3.0), 1e-30)
    X = tuple(m[r][s] / norm for r in range(3) for s in range(3))

    def body(_, Xf):
        Xm = [[Xf[3 * r + s] for s in range(3)] for r in range(3)]
        Xi = _inv_3x3_soa(Xm)
        return tuple(
            0.5 * (Xm[r][s] + Xi[s][r]) for r in range(3) for s in range(3)
        )

    Rf = jax.lax.fori_loop(0, iters, body, X)
    R = [[Rf[3 * r + s] for s in range(3)] for r in range(3)]
    scale = None
    for r in range(3):
        for s in range(3):
            t = R[r][s] * m[r][s]
            scale = t if scale is None else scale + t
    return R, scale / 3.0


def _pnp_dlt_hypotheses_soa(samp, iters=6):
    """All-hypothesis projection-matrix DLTs, structure-of-arrays.

    Equivalent to ``vmap(pnp_from_sample)(Xs, xs)`` but with the hypothesis
    axis on TPU lanes throughout: the vmapped form materializes
    [M x 12 x 12] normal matrices whose minor (12, 12) dims tile-pad to
    (16, 128) — a ~10x HBM tax (the same problem the essential solver's
    9x9 stage had, r4 device profile; this is the PnP-fallback analog,
    VERDICT r3 item 3; ref pnp_tracker.py:89-110).

    The normal matrix AᵀA of the DLT system has the block form
    [[S, 0, -Su], [0, S, -Sv], [-Su, -Sv, Sw]] with S = Σ Xh Xhᵀ,
    Su = Σ u·Xh Xhᵀ, Sv = Σ v·Xh Xhᵀ, Sw = Σ (u²+v²)·Xh Xhᵀ — four
    symmetric 4x4 moment sums, each entry one [M] array.

    Args:
        samp: [M x 6 x 5] samples, columns [X (3) | x_norm (2)].
        iters: inverse-iteration steps (static; matches pnp_from_sample).

    Returns:
        (R components 3x3 list-of-lists of [M], t components list of 3 [M]).
    """
    from .linalg import spd_smallest_eigvec_soa

    st = jnp.transpose(samp, (1, 2, 0))  # [6 x 5 x M]
    ones = jnp.ones_like(st[:, 0])
    Xh = [st[:, 0], st[:, 1], st[:, 2], ones]  # each [6 x M]
    u, v = st[:, 3], st[:, 4]
    w2 = u * u + v * v

    def moments(weight):
        return [
            [jnp.sum(weight * Xh[a] * Xh[b], axis=0) for b in range(a + 1)]
            for a in range(4)
        ]

    S = moments(ones)
    Su = moments(u)
    Sv = moments(v)
    Sw = moments(w2)

    def sym(T, a, b):
        return T[a][b] if b <= a else T[b][a]

    zero = jnp.zeros_like(S[0][0])
    m = [[None] * 12 for _ in range(12)]
    for i in range(12):
        bi, p = divmod(i, 4)
        for j in range(i + 1):
            bj, q = divmod(j, 4)
            if bi == bj:
                m[i][j] = sym(S if bi < 2 else Sw, p, q)
            elif bi == 2:
                m[i][j] = -sym(Su if bj == 0 else Sv, p, q)
            else:  # (bi, bj) == (1, 0): zero block
                m[i][j] = zero
    e12 = spd_smallest_eigvec_soa(m, iters=iters, shift=1e-6)

    Mv = [[e12[4 * r + c] for c in range(4)] for r in range(3)]
    a, b, c = Mv[0][0], Mv[0][1], Mv[0][2]
    d, e, f = Mv[1][0], Mv[1][1], Mv[1][2]
    g, h, i_ = Mv[2][0], Mv[2][1], Mv[2][2]
    det = (
        a * (e * i_ - f * h) - b * (d * i_ - f * g) + c * (d * h - e * g)
    )
    sgn = jnp.sign(det)
    Mv = [[sgn * Mv[r][cc] for cc in range(4)] for r in range(3)]
    R, scale = _nearest_rotation_soa(
        [[Mv[r][s] for s in range(3)] for r in range(3)]
    )
    inv_scale = 1.0 / jnp.maximum(scale, 1e-12)
    t = [Mv[r][3] * inv_scale for r in range(3)]
    return R, t


def _reproj_err_sq_soa(R, t, X, x_pix, K):
    """Squared pixel reprojection errors of all hypotheses at once from SoA
    pose components (same arithmetic as _reproj_err_sq, broadcast [M x N]).
    """
    X0, X1, X2 = X[None, :, 0], X[None, :, 1], X[None, :, 2]
    r = [[R[a][b][:, None] for b in range(3)] for a in range(3)]
    tb = [t[a][:, None] for a in range(3)]
    px = r[0][0] * X0 + r[0][1] * X1 + r[0][2] * X2 + tb[0]
    py = r[1][0] * X0 + r[1][1] * X1 + r[1][2] * X2 + tb[1]
    z = r[2][0] * X0 + r[2][1] * X1 + r[2][2] * X2 + tb[2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    uu = K[0, 0] * (px / zs) + K[0, 1] * (py / zs) + K[0, 2]
    vv = K[1, 1] * (py / zs) + K[1, 2]
    err = (uu - x_pix[None, :, 0]) ** 2 + (vv - x_pix[None, :, 1]) ** 2
    return jnp.where(z > 0, err, jnp.inf)


@highp
def pnp_from_sample_planar(X, x_norm):
    """Homography-based minimal pose for (near-)coplanar 3D points.

    The projection-matrix DLT is degenerate when the sampled points are
    coplanar (roads, walls — common in driving scenes; OpenCV's EPnP has a
    dedicated planar case for the same reason). This solver fits the sample's
    best plane, estimates the plane→image homography, and decomposes it into
    (R, t) (Zhang-style pose from homography). For non-coplanar samples the
    result is poor and simply loses the RANSAC vote.

    Args:
        X: [N x 3] object points (N >= 4).
        x_norm: [N x 2] normalized image coords.

    Returns:
        (R [3x3], t [3]).
    """
    from .linalg import nearest_rotation, smallest_eigvec_3x3

    m = jnp.mean(X, axis=0)
    Xc = X - m
    C = Xc.T @ Xc
    normal = smallest_eigvec_3x3(C)
    # any orthonormal in-plane basis works (the homography absorbs the
    # in-plane rotation): Gram-Schmidt against the least-aligned axis
    a = jnp.eye(3, dtype=X.dtype)[jnp.argmin(jnp.abs(normal))]
    e1 = jnp.cross(normal, a)
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-30)
    e2 = jnp.cross(normal, e1)
    B = jnp.stack([e1, e2, normal], axis=1)  # world->plane basis (columns)
    w = Xc @ B  # [N,3]; w[:,2] ~ 0 for coplanar samples

    # homography from plane coords (w1, w2) to normalized image coords
    ones = jnp.ones_like(w[:, :1])
    p1 = jnp.concatenate([w[:, :2], ones], axis=-1)
    p2 = jnp.concatenate([x_norm, ones], axis=-1)
    # local import to avoid a cycle at module load
    from .homography import homography_from_sample

    H = homography_from_sample(p1, p2)

    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 2.0 / jnp.maximum(
        jnp.linalg.norm(h1) + jnp.linalg.norm(h2), 1e-12
    )
    r1 = h1 * lam
    r2 = h2 * lam
    t_p = h3 * lam
    # enforce cheirality of the plane centroid (w=0 maps to t_p)
    sign = jnp.where(t_p[2] < 0, -1.0, 1.0)
    r1, r2, t_p = r1 * sign, r2 * sign, t_p * sign
    r3 = jnp.cross(r1, r2)
    R_p = jnp.stack([r1, r2, r3], axis=1)
    # project to SO(3) (near-orthogonal already; Newton polar converges
    # in a few steps)
    R_p, _ = nearest_rotation(R_p)

    # X_cam = R_p Bᵀ (X - m) + t_p
    R = R_p @ B.T
    t = t_p - R @ m
    return R, t


@highp
def _reproj_err_sq(R, t, X, x_pix, K):
    """Squared pixel reprojection error; points behind the camera get +inf.

    Component arithmetic rather than ``X @ R.T``: under the hypothesis
    vmap the dots materialize [hyps x N x 3] intermediates XLA cannot
    fuse into the scoring reduction (see solvers/essential.py:sampson_error).
    """
    X0, X1, X2 = X[:, 0], X[:, 1], X[:, 2]
    px = R[0, 0] * X0 + R[0, 1] * X1 + R[0, 2] * X2 + t[0]
    py = R[1, 0] * X0 + R[1, 1] * X1 + R[1, 2] * X2 + t[1]
    z = R[2, 0] * X0 + R[2, 1] * X1 + R[2, 2] * X2 + t[2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    # K is upper-triangular pinhole: u = fx·x/z + cx, v = fy·y/z + cy
    u = K[0, 0] * (px / zs) + K[0, 1] * (py / zs) + K[0, 2]
    v = K[1, 1] * (py / zs) + K[1, 2]
    err = (u - x_pix[:, 0]) ** 2 + (v - x_pix[:, 1]) ** 2
    return jnp.where(z > 0, err, jnp.inf)


@highp
def _gauss_newton_refine(R, t, X, x_pix, K, weight, iters=10):
    """Fixed-iteration Gauss-Newton on SE(3), minimizing weighted pixel
    reprojection error (left-multiplicative update)."""
    fx, fy = K[0, 0], K[1, 1]

    def body(_, Rt):
        R, t = Rt
        P = X @ R.T + t
        z = jnp.maximum(P[:, 2], 1e-6)
        u = fx * P[:, 0] / z + K[0, 2]
        v = fy * P[:, 1] / z + K[1, 2]
        r = jnp.stack([u - x_pix[:, 0], v - x_pix[:, 1]], axis=-1)  # [N,2]
        # d(pix)/dP
        du = jnp.stack([fx / z, jnp.zeros_like(z), -fx * P[:, 0] / z**2], -1)
        dv = jnp.stack([jnp.zeros_like(z), fy / z, -fy * P[:, 1] / z**2], -1)
        J_p = jnp.stack([du, dv], axis=-2)  # [N,2,3]
        # dP/d(δθ, δv) = [-[P]x, I]
        dP = jnp.concatenate(
            [-skew(P), jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), P.shape[:1] + (3, 3))],
            axis=-1,
        )  # [N,3,6]
        J = J_p @ dP  # [N,2,6]
        w = weight[:, None, None]
        from .linalg import spd_solve_small

        H = jnp.einsum("nki,nkj->ij", J * w, J) + 1e-6 * jnp.eye(6, dtype=R.dtype)
        b = jnp.einsum("nki,nk->i", J * w, r)
        delta = -spd_solve_small(H, b)
        dR = so3_exp(delta[:3])
        return dR @ R, dR @ t + delta[3:]

    return jax.lax.fori_loop(0, iters, body, (R, t))


@partial(jax.jit, static_argnames=("num_hypotheses", "refine_iters"))
@highp
def solve_pnp_ransac(
    rng,
    X,
    x_pix,
    K,
    K_inv,
    valid_mask,
    reproj_threshold=1.0,
    num_hypotheses=256,
    refine_iters=10,
):
    """Batched RANSAC PnP.

    Args:
        rng: PRNG key.
        X: [N x 3] 3D points in the object (reference-view) frame.
        x_pix: [N x 2] observed pixels in the current view.
        K, K_inv: intrinsics.
        valid_mask: [N] boolean validity.
        reproj_threshold: inlier threshold (pixels; reference default 1,
            pnp_tracker config).
        num_hypotheses: number of 6-point samples (static).
        refine_iters: Gauss-Newton iterations on the winner (static).

    Returns:
        dict with ``R`` [3x3], ``t`` [3], ``inliers`` [N] bool,
        ``inlier_cnt``, ``ok`` (enough inliers to trust the pose).
    """
    x_norm = (
        jnp.concatenate([x_pix, jnp.ones_like(x_pix[:, :1])], axis=-1) @ K_inv.T
    )[:, :2]

    samp = sample_points(
        rng, jnp.concatenate([X, x_norm], axis=-1), valid_mask,
        num_hypotheses, 6,
    )  # [M x 6 x 5] — one packed gather (see solvers/ransac.py)
    Xs, xs = samp[..., :3], samp[..., 3:]
    # three minimal solvers per sample: projection-matrix DLT (general
    # scenes), plane-homography decomposition (coplanar scenes, where the
    # DLT is degenerate), and Grunert P3P on the first three points (low
    # inlier ratios: an all-inlier 3-sample is ~25x likelier than a
    # 6-sample at 30% inliers — the regime where PnP is the fallback);
    # RANSAC scoring picks whichever explains the data
    from .p3p import p3p_solutions

    # DLT lane in structure-of-arrays form (hypotheses on lanes — the
    # vmapped 12x12 nullspace was the PnP fallback's hot spot)
    Rd, td = _pnp_dlt_hypotheses_soa(samp, iters=6)
    thr2 = reproj_threshold**2
    # MSAC truncated-residual tiebreak (same rationale as
    # essential.find_essential_ransac): on clean data inlier counts
    # saturate and count-argmax picks an arbitrary tied model; the
    # residual term (< 1 inlier by construction) picks the best one
    r_norm = thr2 * (jnp.sum(valid_mask).astype(jnp.float32) + 1.0)

    def fscore(errs, inl):
        rsum = jnp.sum(
            jnp.minimum(errs, thr2) * valid_mask[None, :], axis=1
        )
        return jnp.sum(inl, axis=1).astype(jnp.float32) - rsum / r_norm

    errs_d = _reproj_err_sq_soa(Rd, td, X, x_pix, K)
    inliers_d = (errs_d < thr2) & valid_mask[None, :]
    scores_d = fscore(errs_d, inliers_d)

    Rs_p, ts_p = jax.vmap(pnp_from_sample_planar)(Xs, xs)
    Rs_3, ts_3, ok_3 = jax.vmap(
        lambda X3, x3: p3p_solutions(X3, x3)
    )(Xs[:, :3], xs[:, :3])
    Rs_3 = Rs_3.reshape(-1, 3, 3)
    ts_3 = ts_3.reshape(-1, 3)
    ok_3 = ok_3.reshape(-1)
    Rs_pp = jnp.concatenate([Rs_p, Rs_3], axis=0)
    ts_pp = jnp.concatenate([ts_p, ts_3], axis=0)
    cand_ok = jnp.concatenate(
        [jnp.ones(num_hypotheses, dtype=bool), ok_3], axis=0
    )

    errs_pp = jax.vmap(
        lambda R, t: _reproj_err_sq(R, t, X, x_pix, K)
    )(Rs_pp, ts_pp)
    inliers_pp = (errs_pp < thr2) & valid_mask[None, :]
    scores_pp = jnp.where(cand_ok, fscore(errs_pp, inliers_pp), -1.0)

    scores = jnp.concatenate([scores_d, scores_pp], axis=0)
    best = jnp.argmax(scores)
    is_d = best < num_hypotheses
    idx_d = jnp.minimum(best, num_hypotheses - 1)
    idx_pp = jnp.clip(best - num_hypotheses, 0, scores_pp.shape[0] - 1)
    R_d_best = jnp.stack(
        [Rd[r][s][idx_d] for r in range(3) for s in range(3)]
    ).reshape(3, 3)
    t_d_best = jnp.stack([td[r][idx_d] for r in range(3)])
    R0 = jnp.where(is_d, R_d_best, Rs_pp[idx_pp])
    t0 = jnp.where(is_d, t_d_best, ts_pp[idx_pp])
    inl_best = jnp.where(is_d, inliers_d[idx_d], inliers_pp[idx_pp])
    w = inl_best.astype(X.dtype)
    R1, t1 = _gauss_newton_refine(R0, t0, X, x_pix, K, w, iters=refine_iters)

    refined_err = _reproj_err_sq(R1, t1, X, x_pix, K)
    refined_inl = (refined_err < thr2) & valid_mask
    refined_cnt = jnp.sum(refined_inl)
    refined_fs = refined_cnt.astype(jnp.float32) - jnp.sum(
        jnp.minimum(refined_err, thr2) * valid_mask
    ) / r_norm

    use_ref = refined_fs >= scores[best]
    R_out = jnp.where(use_ref, R1, R0)
    t_out = jnp.where(use_ref, t1, t0)
    inl_out = jnp.where(use_ref, refined_inl, inl_best)
    cnt_out = jnp.where(use_ref, refined_cnt, jnp.sum(inl_best))
    return {
        "R": R_out,
        "t": t_out,
        "inliers": inl_out,
        "inlier_cnt": cnt_out,
        # cv2.solvePnPRansac needs >4 points and returns flag; we mirror a
        # minimal sanity condition (pnp_tracker.py:96-108)
        "ok": cnt_out > 4,
    }
