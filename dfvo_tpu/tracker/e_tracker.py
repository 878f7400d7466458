"""Essential-matrix tracker: 2D-2D pose + triangulation-based scale recovery.

Rebuild of /root/reference/libs/tracker/E_tracker.py as pure jit-friendly
functions. Protocol parity with the reference:

* H-vs-E GRIC model selection (E_tracker.py:195-275): a homography is fit
  once, then each of the ``repeat`` RANSAC runs votes valid when
  H_gric > E_gric; the majority of votes gates pose acceptance;
* repeated RANSAC (x5 iterative / x3 otherwise, E_tracker.py:179,223) —
  here the repeats are a vmap over independent PRNG keys rather than a
  serial loop with data shuffling (shuffling only changes which samples
  RANSAC draws; fresh keys achieve the same);
* cheirality acceptance: > 10% of keypoints in front of both cameras
  (E_tracker.py:299);
* scale from triangulated-vs-CNN depth ratios with 1-D RANSAC, -1 sentinel
  when fewer than 10 valid ratios (E_tracker.py:571-643).

Everything is fixed-shape: keypoints arrive as [N x 2] arrays with validity
masks straight from matching.kp_selection.
"""

import functools

import jax
import jax.numpy as jnp

from ..solvers.essential import (
    find_essential_ransac,
    recover_pose,
    two_view_depths,
)
from ..solvers.gric import calc_gric, fundamental_residual, homography_residual
from ..solvers.homography import find_homography_ransac
from ..solvers.scale import scale_ransac_1d
from ..utils.precision import highp


@functools.partial(
    jax.jit, static_argnames=("repeats", "num_hypotheses", "validity_method")
)
@highp
def compute_pose_2d2d(
    rng,
    kp_cur,
    kp_ref,
    valid_mask,
    K,
    K_inv,
    reproj_thre=0.2,
    repeats=5,
    num_hypotheses=256,
    validity_method="GRIC",
    validity_thre=0.0,
):
    """Pose (cur → ref) from 2D-2D correspondences with model selection.

    Mirrors EssTracker.compute_pose_2d2d (E_tracker.py:154-307), with the
    repeat structure flattened for TPU efficiency: the ``repeats``
    independent RANSAC runs share one hypothesis pool of
    ``repeats x num_hypotheses`` samples; each repeat's validity vote reads
    the best unpolished model of its own disjoint slice (equivalent
    protocol — the reference votes on per-repeat cv2 results — but the
    expensive multi-start local optimization runs once instead of per
    repeat).

    Args:
        rng: PRNG key.
        kp_cur, kp_ref: [N x 2] pixel correspondences.
        valid_mask: [N] validity.
        K, K_inv: intrinsics.
        reproj_thre: RANSAC inlier threshold (pixels).
        repeats: independent RANSAC runs voting on validity (static).
        validity_method: 'GRIC' | 'flow' | 'homo_ratio' | 'none' (static).
            All three reference methods (E_tracker.py:182-217, :243-276):
            GRIC votes H_gric > E_gric per repeat; flow gates on mean flow
            magnitude > ``validity_thre`` then votes per-repeat cheirality
            > 10%; homo_ratio fits one homography at threshold 0.2 and
            votes H_inl/(H_inl+E_inl) < ``validity_thre`` per repeat.
        validity_thre: cfg.e_tracker.validity.thre (flow / homo_ratio only).

    Returns:
        dict with ``R`` [3x3], ``t`` [3] (unit norm or zero), ``valid``
        (scalar bool: majority vote AND cheirality passed — when False,
        R=I, t=0 as in the reference), ``inliers`` [N].
    """
    n_valid = jnp.sum(valid_mask)
    nf = n_valid.astype(kp_cur.dtype)

    # --- homography reference fit (once; GRIC at thre 1.0, homo_ratio at
    # thre 0.2 — E_tracker.py:199-204 vs :186-193)
    if validity_method == "GRIC":
        h_out = find_homography_ransac(
            rng, kp_cur, kp_ref, valid_mask, threshold=1.0,
            num_hypotheses=num_hypotheses,
        )
        h_res = homography_residual(h_out["H"], kp_cur, kp_ref, mask=valid_mask)
        h_gric = calc_gric(h_res, 0.8, nf, "HMat", mask=valid_mask)
    elif validity_method == "homo_ratio":
        h_out = find_homography_ransac(
            rng, kp_cur, kp_ref, valid_mask, threshold=0.2,
            num_hypotheses=num_hypotheses,
        )

    e_out = find_essential_ransac(
        rng,
        kp_cur,
        kp_ref,
        K,
        K_inv,
        valid_mask,
        threshold=reproj_thre,
        num_hypotheses=repeats * num_hypotheses,
        vote_slices=repeats,
    )

    # validity vote per repeat slice
    if validity_method == "GRIC":
        def e_gric_one(E):
            F = K_inv.T @ E @ K_inv
            e_res = fundamental_residual(F, kp_cur, kp_ref, mask=valid_mask)
            return calc_gric(e_res, 0.8, nf, "EMat", mask=valid_mask)

        e_grics = jax.vmap(e_gric_one)(e_out["slice_Es"])
        votes = h_gric > e_grics
        # the reference skips GRIC entirely for <=10 kps (E_tracker.py:196)
        votes = votes & (n_valid > 10)
    elif validity_method == "flow":
        # flow method (E_tracker.py:182-185, :252-257): mean flow magnitude
        # must exceed the threshold to enter the loop at all; inside, each
        # repeat votes on its own pose's cheirality count (> 10% of kps)
        avg_flow = jnp.sum(
            jnp.linalg.norm(kp_ref - kp_cur, axis=1) * valid_mask
        ) / jnp.maximum(nf, 1.0)
        gate = avg_flow > validity_thre

        def cheir_one(E):
            _, _, cnt = recover_pose(E, kp_cur, kp_ref, K_inv, valid_mask)
            return cnt

        cheirs = jax.vmap(cheir_one)(e_out["slice_Es"])
        votes = (cheirs > n_valid * 0.1) & gate
    elif validity_method == "homo_ratio":
        # homo_ratio (E_tracker.py:243-249): per repeat, the homography
        # inlier share H/(H+E) must stay below the threshold
        h_cnt = h_out["inlier_cnt"].astype(kp_cur.dtype)
        ratios = h_cnt / jnp.maximum(
            h_cnt + e_out["slice_cnts"].astype(kp_cur.dtype), 1.0
        )
        votes = ratios < validity_thre
    else:
        votes = jnp.ones((repeats,), bool)

    major_valid = jnp.sum(votes) > repeats / 2
    cheirality_ok = e_out["cheirality_cnt"] > n_valid * 0.1
    accept = major_valid & cheirality_ok

    eye = jnp.eye(3, dtype=kp_cur.dtype)
    zero_t = jnp.zeros(3, dtype=kp_cur.dtype)
    return {
        "R": jnp.where(accept, e_out["R"], eye),
        "t": jnp.where(accept, e_out["t"], zero_t),
        "valid": accept,
        "inliers": e_out["inliers"],
        "inlier_cnt": e_out["inlier_cnt"],
    }


@functools.partial(jax.jit, static_argnames=("max_trials", "min_samples"))
@highp
def find_scale_from_depth(
    rng,
    kp_ref,
    kp_cur,
    valid_mask,
    T_ref_to_cur,
    depth_cur,
    K_inv,
    ransac_thre=0.1,
    max_trials=100,
    min_samples=3,
):
    """Metric scale for a unit-translation pose by comparing triangulated
    depths against CNN depths (EssTracker.find_scale_from_depth,
    E_tracker.py:571-643).

    Args:
        rng: PRNG key.
        kp_ref, kp_cur: [N x 2] pixel correspondences (view 1 = ref,
            view 2 = cur, matching the reference's kp1/kp2).
        valid_mask: [N] validity.
        T_ref_to_cur: [4 x 4] relative pose with unit translation
            (the reference's T_21 = E_pose.inv_pose).
        depth_cur: [H x W] preprocessed CNN depth of the current view
            (zeros = invalid).
        K_inv: [3 x 3] inverse intrinsics.

    Returns:
        dict with ``scale`` (float; -1 when < 10 valid ratios) and
        ``valid_cnt``.
    """
    h, w = depth_cur.shape

    def norm_h(kp):
        ones = jnp.ones_like(kp[:, :1])
        return jnp.concatenate([kp, ones], axis=-1) @ K_inv.T

    # closed-form two-view depths under (R, t) = T_ref_to_cur — equivalent
    # to the reference's DLT triangulation (ops_3d.py:44-67) for depth
    # extraction, but O(N) with no per-point eigendecomposition (batched
    # 4x4 eigh was a hot spot on TPU)
    R = T_ref_to_cur[:3, :3]
    t = T_ref_to_cur[:3, 3]
    _, z_cur = two_view_depths(R, t, norm_h(kp_ref), norm_h(kp_cur))

    # CNN depth at current-view keypoints (integer pixel, like the
    # reference's sparse-depth-map scatter/readback, ops_3d.py:15-41)
    xi = jnp.floor(kp_cur[:, 0]).astype(jnp.int32)
    yi = jnp.floor(kp_cur[:, 1]).astype(jnp.int32)
    in_bounds = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)
    d_cnn = depth_cur[yi, xi]

    ok = valid_mask & in_bounds & (z_cur > 0) & (d_cnn > 0)
    ratios = jnp.where(ok, z_cur / jnp.maximum(d_cnn, 1e-12), 0.0)
    valid_cnt = jnp.sum(ok)

    fit = scale_ransac_1d(
        rng, ratios, ok, threshold=ransac_thre,
        num_hypotheses=max_trials, min_samples=min_samples,
    )
    scale = jnp.where(valid_cnt > 10, fit["scale"], -1.0)
    return {"scale": scale, "valid_cnt": valid_cnt}
