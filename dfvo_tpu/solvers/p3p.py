"""Batched P3P minimal solver (Grunert 1841 quartic, closed form).

The PnP RANSAC's 6-point DLT lane (solvers/pnp.py) needs all six sampled
points to be inliers, so hypothesis quality collapses at low inlier ratios
— exactly the frames where PnP is the fallback (VERDICT r1 weak #5; the
reference leans on OpenCV's P3P/EPnP inside ``cv2.solvePnPRansac``,
pnp_tracker.py:89-110). This module provides the 3-point lane: at a 30%
inlier ratio an all-inlier 3-sample is ~25x more likely than a 6-sample.

Everything is closed form (no iterative eigensolvers, no torch, no cv2):

* quartic roots via Ferrari's factorization, with the resolvent cubic by
  Cardano/trigonometric formulas — vmap/jit friendly, f32;
* Grunert's distance ratios from the law of cosines (quartic coefficients
  generated symbolically from the resultant of the two ratio equations);
* absolute orientation of the minimal triple by orthonormal-triad
  alignment (exact for a noiseless 3-point correspondence).

Degenerate samples simply produce invalid/garbage poses which lose the
RANSAC vote — the standard contract for all minimal solvers in this
package (see solvers/essential.py).
"""

import jax
import jax.numpy as jnp


def _real_cubic_root(B, C, D):
    """Largest real root of u^3 + B u^2 + C u + D (scalar, f32-safe).

    Combines the trigonometric three-real-root formula with Cardano's
    one-real-root formula, selected by the discriminant.
    """
    p = C - B * B / 3.0
    q = D - B * C / 3.0 + 2.0 * B**3 / 27.0
    disc = -4.0 * p**3 - 27.0 * q * q

    # three real roots: y = 2 sqrt(-p/3) cos(phi/3), largest at k = 0
    pm = jnp.minimum(p, -1e-12)  # p < 0 in this branch
    m = 2.0 * jnp.sqrt(-pm / 3.0)
    arg = jnp.clip(3.0 * q / (pm * m), -1.0, 1.0)
    y_tri = m * jnp.cos(jnp.arccos(arg) / 3.0)

    # one real root (Cardano)
    s = jnp.sqrt(jnp.maximum(q * q / 4.0 + p**3 / 27.0, 0.0))
    y_car = jnp.cbrt(-q / 2.0 + s) + jnp.cbrt(-q / 2.0 - s)

    y = jnp.where(disc >= 0.0, y_tri, y_car)
    return y - B / 3.0


def solve_quartic(c4, c3, c2, c1, c0):
    """Real roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0 (Ferrari).

    Returns:
        (roots [4], valid [4] bool). Invalid slots hold finite garbage.
    """
    dt = jnp.result_type(c4, jnp.float32)
    scale = jnp.where(jnp.abs(c4) < 1e-12, jnp.asarray(1e-12, dt), c4)
    b = c3 / scale
    c = c2 / scale
    d = c1 / scale
    e = c0 / scale

    # depressed quartic t^4 + p t^2 + q t + r,  x = t - b/4
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b**3 / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b**4 / 256.0

    # resolvent cubic in u = alpha^2: u^3 + 2p u^2 + (p^2-4r) u - q^2 = 0
    u = _real_cubic_root(2.0 * p, p * p - 4.0 * r, -q * q)
    u = jnp.maximum(u, 0.0)
    alpha = jnp.sqrt(u)

    # factorization (t^2 + alpha t + beta)(t^2 - alpha t + gamma)
    safe_a = jnp.maximum(alpha, 1e-12)
    beta = (p + u - q / safe_a) / 2.0
    gamma = (p + u + q / safe_a) / 2.0

    d1 = u - 4.0 * beta
    d2 = u - 4.0 * gamma
    s1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(d2, 0.0))
    roots_f = jnp.stack(
        [
            (-alpha + s1) / 2.0,
            (-alpha - s1) / 2.0,
            (alpha + s2) / 2.0,
            (alpha - s2) / 2.0,
        ]
    )
    valid_f = jnp.stack([d1 >= 0.0, d1 >= 0.0, d2 >= 0.0, d2 >= 0.0])

    # biquadratic fallback when alpha ~ 0 (q ~ 0): t^2 = (-p ± sqrt(p^2-4r))/2
    db = p * p - 4.0 * r
    sb = jnp.sqrt(jnp.maximum(db, 0.0))
    t1 = (-p + sb) / 2.0
    t2 = (-p - sb) / 2.0
    roots_b = jnp.stack(
        [
            jnp.sqrt(jnp.maximum(t1, 0.0)),
            -jnp.sqrt(jnp.maximum(t1, 0.0)),
            jnp.sqrt(jnp.maximum(t2, 0.0)),
            -jnp.sqrt(jnp.maximum(t2, 0.0)),
        ]
    )
    valid_b = jnp.stack(
        [
            (db >= 0) & (t1 >= 0),
            (db >= 0) & (t1 >= 0),
            (db >= 0) & (t2 >= 0),
            (db >= 0) & (t2 >= 0),
        ]
    )

    use_biquad = alpha < 1e-6
    roots = jnp.where(use_biquad, roots_b, roots_f)
    valid = jnp.where(use_biquad, valid_b, valid_f)
    roots = roots - b / 4.0

    # Newton-polish each root on the original quartic: Ferrari in f32 loses
    # ~3 digits through the resolvent cubic; three Newton steps restore them
    def newton(x):
        fval = (((c4 * x + c3) * x + c2) * x + c1) * x + c0
        fder = ((4.0 * c4 * x + 3.0 * c3) * x + 2.0 * c2) * x + c1
        safe = jnp.where(jnp.abs(fder) < 1e-20, 1e-20, fder)
        return x - fval / safe

    for _ in range(3):
        roots = newton(roots)
    return roots, valid


def _triad(d1, d2, dtype):
    """Orthonormal frame [e1 e2 e3] (columns) from two spanning vectors."""
    e1 = d1 / jnp.maximum(jnp.linalg.norm(d1), 1e-12)
    n = jnp.cross(d1, d2)
    e3 = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
    e2 = jnp.cross(e3, e1)
    return jnp.stack([e1, e2, e3], axis=1).astype(dtype)


def p3p_solutions(X, x_norm):
    """Up to four camera poses from three 3D-2D correspondences.

    Args:
        X: [3 x 3] object points (rows).
        x_norm: [3 x 2] normalized image coordinates (K^-1 applied).

    Returns:
        (Rs [4 x 3 x 3], ts [4 x 3], valid [4] bool) with the cv2.solvePnP
        convention x ~ K (R X + t).
    """
    dt = X.dtype
    f = jnp.concatenate([x_norm, jnp.ones_like(x_norm[:, :1])], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # bearing vectors

    # pairwise world distances and bearing cosines
    a2 = jnp.sum((X[1] - X[2]) ** 2)  # opposite P1
    b2 = jnp.sum((X[0] - X[2]) ** 2)  # opposite P2
    c2 = jnp.sum((X[0] - X[1]) ** 2)  # opposite P3
    ca = jnp.dot(f[1], f[2])
    cb = jnp.dot(f[0], f[2])
    cg = jnp.dot(f[0], f[1])

    b2s = jnp.maximum(b2, 1e-12)
    K1 = a2 / b2s
    K2 = c2 / b2s

    # Grunert quartic in v = s3/s1 — coefficients are the sympy resultant of
    # the two law-of-cosines ratio equations (derivation in module history)
    A4 = K1**2 - 2 * K1 * K2 - 2 * K1 + K2**2 - 4 * K2 * ca**2 + 2 * K2 + 1
    A3 = (
        -4 * K1**2 * cb
        + 8 * K1 * K2 * cb
        + 4 * K1 * ca * cg
        + 4 * K1 * cb
        - 4 * K2**2 * cb
        + 8 * K2 * ca**2 * cb
        + 4 * K2 * ca * cg
        - 4 * K2 * cb
        - 4 * ca * cg
    )
    A2 = (
        4 * K1**2 * cb**2
        + 2 * K1**2
        - 8 * K1 * K2 * cb**2
        - 4 * K1 * K2
        - 8 * K1 * ca * cb * cg
        - 4 * K1 * cg**2
        + 4 * K2**2 * cb**2
        + 2 * K2**2
        - 4 * K2 * ca**2
        - 8 * K2 * ca * cb * cg
        + 4 * ca**2
        + 4 * cg**2
        - 2
    )
    A1 = (
        -4 * K1**2 * cb
        + 8 * K1 * K2 * cb
        + 4 * K1 * ca * cg
        + 8 * K1 * cb * cg**2
        - 4 * K1 * cb
        - 4 * K2**2 * cb
        + 4 * K2 * ca * cg
        + 4 * K2 * cb
        - 4 * ca * cg
    )
    A0 = K1**2 - 2 * K1 * K2 - 4 * K1 * cg**2 + 2 * K1 + K2**2 - 2 * K2 + 1

    vs, v_ok = solve_quartic(A4, A3, A2, A1, A0)

    def pose_from_v(v):
        # u = s2/s1 from the second ratio equation (quadratic; pick the
        # branch that better satisfies the first)
        Db = 1.0 + v * v - 2.0 * v * cb
        rad = cg * cg - 1.0 + K2 * Db
        sq = jnp.sqrt(jnp.maximum(rad, 0.0))
        u_cands = jnp.stack([cg + sq, cg - sq])

        def e1_res(u):
            return jnp.abs(
                u * u + v * v - 2 * u * v * ca - K1 * Db
            )

        u = jnp.where(e1_res(u_cands[0]) <= e1_res(u_cands[1]),
                      u_cands[0], u_cands[1])

        # joint Newton on the original ratio system: the quartic
        # coefficients cancel catastrophically in f32, but the residuals
        # E1/E2 are well conditioned — a few steps restore full precision.
        # (Polishing from both u branches was tried and is WORSE: the far
        # branch converges onto a different root of the system, so the
        # 4-candidate set loses one of its distinct solutions.)
        def newton2(uv, _):
            uu, vv = uv
            Dbv = 1.0 + vv * vv - 2.0 * vv * cb
            e1 = uu * uu + vv * vv - 2 * uu * vv * ca - K1 * Dbv
            e2 = 1.0 + uu * uu - 2 * uu * cg - K2 * Dbv
            j11 = 2 * uu - 2 * vv * ca
            j12 = 2 * vv - 2 * uu * ca - K1 * (2 * vv - 2 * cb)
            j21 = 2 * uu - 2 * cg
            j22 = -K2 * (2 * vv - 2 * cb)
            det = j11 * j22 - j12 * j21
            safe = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
            du = (e1 * j22 - e2 * j12) / safe
            dv = (j11 * e2 - j21 * e1) / safe
            return (uu - du, vv - dv), None

        (u, v), _ = jax.lax.scan(newton2, (u, v), None, length=4)
        Db = 1.0 + v * v - 2.0 * v * cb
        s1 = jnp.sqrt(b2s / jnp.maximum(Db, 1e-12))
        s = jnp.stack([s1, u * s1, v * s1])
        ok = (v > 0) & (u > 0) & (Db > 1e-12) & (rad >= 0)

        Q = s[:, None] * f  # camera-frame points
        Mw = _triad(X[1] - X[0], X[2] - X[0], dt)
        Mc = _triad(Q[1] - Q[0], Q[2] - Q[0], dt)
        R = Mc @ Mw.T
        t = Q[0] - R @ X[0]
        return R, t, ok

    Rs, ts, oks = jax.vmap(pose_from_v)(vs)
    return Rs, ts, oks & v_ok
