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

    Rs_d, ts_d = jax.vmap(pnp_from_sample)(Xs, xs)
    Rs_p, ts_p = jax.vmap(pnp_from_sample_planar)(Xs, xs)
    Rs_3, ts_3, ok_3 = jax.vmap(
        lambda X3, x3: p3p_solutions(X3, x3)
    )(Xs[:, :3], xs[:, :3])
    Rs_3 = Rs_3.reshape(-1, 3, 3)
    ts_3 = ts_3.reshape(-1, 3)
    ok_3 = ok_3.reshape(-1)
    Rs = jnp.concatenate([Rs_d, Rs_p, Rs_3], axis=0)
    ts = jnp.concatenate([ts_d, ts_p, ts_3], axis=0)
    cand_ok = jnp.concatenate(
        [jnp.ones(2 * num_hypotheses, dtype=bool), ok_3], axis=0
    )

    errs = jax.vmap(lambda R, t: _reproj_err_sq(R, t, X, x_pix, K))(Rs, ts)
    inliers = (errs < reproj_threshold**2) & valid_mask[None, :]
    counts = jnp.where(cand_ok, jnp.sum(inliers, axis=1), -1)
    best = jnp.argmax(counts)

    R0, t0 = Rs[best], ts[best]
    w = inliers[best].astype(X.dtype)
    R1, t1 = _gauss_newton_refine(R0, t0, X, x_pix, K, w, iters=refine_iters)

    refined_err = _reproj_err_sq(R1, t1, X, x_pix, K)
    refined_inl = (refined_err < reproj_threshold**2) & valid_mask
    refined_cnt = jnp.sum(refined_inl)

    use_ref = refined_cnt >= counts[best]
    R_out = jnp.where(use_ref, R1, R0)
    t_out = jnp.where(use_ref, t1, t0)
    inl_out = jnp.where(use_ref, refined_inl, inliers[best])
    cnt_out = jnp.where(use_ref, refined_cnt, counts[best])
    return {
        "R": R_out,
        "t": t_out,
        "inliers": inl_out,
        "inlier_cnt": cnt_out,
        # cv2.solvePnPRansac needs >4 points and returns flag; we mirror a
        # minimal sanity condition (pnp_tracker.py:96-108)
        "ok": cnt_out > 4,
    }
