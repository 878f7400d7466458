"""PnP tracker: metric pose from 3D(CNN depth)-2D matches.

Rebuild of /root/reference/libs/tracker/pnp_tracker.py:45-125 as a
jit-friendly function. Used when the essential-matrix path fails
(zero translation or scale = -1, dfvo.py:227). Protocol parity:

* keypoints outside the image or outside the depth range are masked
  (pnp_tracker.py:63-79) — masks, not dynamic filtering;
* repeated RANSAC keeping max inliers (x5 iterative / x3 otherwise) — a
  vmap over PRNG keys;
* output pose inverted to "cur → ref" (pnp_tracker.py:118).
"""

import functools

import jax
import jax.numpy as jnp

from ..geometry.lie import make_se3, se3_inverse
from ..geometry.ops import unproject_kp
from ..solvers.pnp import solve_pnp_ransac
from ..utils.precision import highp


@functools.partial(jax.jit, static_argnames=("repeats", "num_hypotheses"))
@highp
def compute_pose_3d2d(
    rng,
    kp_ref,
    kp_cur,
    valid_mask,
    depth_ref,
    K,
    K_inv,
    min_depth=0.0,
    max_depth=50.0,
    reproj_thre=1.0,
    repeats=5,
    num_hypotheses=256,
):
    """Pose (cur → ref) from reference-view depth and current-view pixels.

    Args:
        rng: PRNG key.
        kp_ref: [N x 2] keypoints in the reference view (3D source).
        kp_cur: [N x 2] matched pixels in the current view.
        valid_mask: [N] validity from keypoint selection.
        depth_ref: [H x W] reference-view depth map.
        K, K_inv: intrinsics.
        min_depth, max_depth: accepted depth range (cfg.depth.*).
        reproj_thre: RANSAC reprojection threshold (pixels).
        repeats: independent RANSAC runs, best-inlier wins (static).

    Returns:
        dict with ``T`` [4x4] pose (cur → ref), ``ok`` scalar bool,
        ``inliers`` [N].
    """
    h, w = depth_ref.shape

    in_bounds = (
        (kp_cur[:, 0] >= 0)
        & (kp_cur[:, 0] < w)
        & (kp_cur[:, 1] >= 0)
        & (kp_cur[:, 1] < h)
    )
    xi = jnp.clip(kp_ref[:, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(kp_ref[:, 1].astype(jnp.int32), 0, h - 1)
    kp_depth = depth_ref[yi, xi]
    depth_ok = (kp_depth != 0) & (kp_depth > min_depth) & (kp_depth < max_depth)
    mask = valid_mask & in_bounds & depth_ok

    XYZ = unproject_kp(kp_ref, kp_depth, K_inv)

    # the reference's repeated RANSAC keeps the max-inlier result across
    # repeats (pnp_tracker.py:89-110) — with a batched solver that is
    # exactly one run over the pooled hypothesis budget
    out = solve_pnp_ransac(
        rng, XYZ, kp_cur, K, K_inv, mask,
        reproj_threshold=reproj_thre,
        num_hypotheses=repeats * num_hypotheses,
    )
    R = out["R"]
    t = out["t"]
    ok = out["ok"] & (jnp.sum(mask) > 4)

    # (R, t) map ref-frame points into the cur camera; the tracker reports
    # cur → ref, so invert (ref pnp_tracker.py:118)
    T = se3_inverse(make_se3(R, t))
    T = jnp.where(ok, T, jnp.eye(4, dtype=T.dtype))
    return {"T": T, "ok": ok, "inliers": out["inliers"], "mask": mask}
