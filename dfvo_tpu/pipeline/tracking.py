"""The fused on-device tracking step: keypoints → E-tracker → scale → PnP.

This is the reference's per-frame ``DFVO.tracking()`` decision tree
(libs/dfvo.py:121-262) expressed as one jitted computation: keypoint
selection, essential-matrix pose with GRIC validity, triangulation scale
recovery, and the PnP fallback under ``lax.cond`` (so the fallback's cost is
only paid on frames that need it). The scalar decisions mirror the
reference exactly:

* no good keypoints            -> constant-motion model (dfvo.py:157-161)
* E valid and scale recovered  -> E pose with metric translation
* ‖t‖ = 0 or scale = -1        -> PnP pose (dfvo.py:227-250)
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..geometry.lie import make_se3, se3_inverse
from ..matching.kp_selection import KPSelectionSpec, local_bestN
from ..tracker.e_tracker import compute_pose_2d2d, find_scale_from_depth
from ..tracker.pnp_tracker import compute_pose_3d2d

TRACK_MODE_CONST = 0
TRACK_MODE_ESSENTIAL = 1
TRACK_MODE_PNP = 2


@dataclass(frozen=True)
class TrackingConfig:
    """Static (hashable) tracking configuration distilled from the YAML
    option surface (options/examples/default_configuration.yml)."""

    # image / kp selection
    height: int = 192
    width: int = 640
    num_kp: int = 2000
    kp_rows: int = 10
    kp_cols: int = 10
    flow_diff_thre: float = 0.1
    kp_score_method: str = "flow"
    # depth preprocessing
    depth_crop: tuple = ((0.3, 1.0), (0.0, 1.0))
    min_depth: float = 0.0
    max_depth: float = 50.0
    # e-tracker
    e_reproj_thre: float = 0.2
    e_repeats: int = 3  # reference: 3 when iterative_kp disabled, else 5
    validity_method: str = "GRIC"
    # scale recovery
    scale_ransac_thre: float = 0.1
    scale_max_trials: int = 100
    scale_min_samples: int = 3
    # pnp
    pnp_reproj_thre: float = 1.0
    pnp_repeats: int = 3
    # ransac batching
    num_hypotheses: int = 256

    @classmethod
    def from_cfg(cls, cfg):
        crop = cfg.crop.depth_crop
        return cls(
            height=cfg.image.height,
            width=cfg.image.width,
            num_kp=cfg.kp_selection.local_bestN.num_bestN,
            kp_rows=cfg.kp_selection.local_bestN.num_row,
            kp_cols=cfg.kp_selection.local_bestN.num_col,
            flow_diff_thre=cfg.kp_selection.local_bestN.thre,
            kp_score_method=cfg.kp_selection.local_bestN.score_method,
            depth_crop=((crop[0][0], crop[0][1]), (crop[1][0], crop[1][1])),
            min_depth=cfg.depth.min_depth,
            max_depth=cfg.depth.max_depth,
            e_reproj_thre=cfg.e_tracker.ransac.reproj_thre,
            e_repeats=(
                cfg.e_tracker.ransac.repeat
                if cfg.e_tracker.iterative_kp.enable
                else 3
            ),
            validity_method=cfg.e_tracker.validity.method,
            scale_ransac_thre=cfg.scale_recovery.ransac.thre,
            scale_max_trials=cfg.scale_recovery.ransac.max_trials,
            scale_min_samples=cfg.scale_recovery.ransac.min_samples,
            pnp_reproj_thre=cfg.pnp_tracker.ransac.reproj_thre,
            pnp_repeats=(
                cfg.pnp_tracker.ransac.repeat
                if cfg.pnp_tracker.iterative_kp.enable
                else 3
            ),
            num_hypotheses=cfg.tpu.ransac_hypotheses,
        )


def preprocess_depth_device(depth, crop, depth_range):
    """Device-side crop + range clipping (ref utils.py:89-114)."""
    min_depth, max_depth = depth_range
    h, w = depth.shape
    y0, y1 = int(h * crop[0][0]), int(h * crop[0][1])
    x0, x1 = int(w * crop[1][0]), int(w * crop[1][1])
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    region = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    rng_mask = (depth < max_depth) & (depth > min_depth)
    return jnp.where(region & rng_mask, depth, 0.0)


@functools.partial(jax.jit, static_argnames=("tcfg",))
def tracking_step(
    rng,
    flow_fwd,
    flow_diff,
    depth_cur_raw,
    depth_ref_raw,
    prev_motion,
    K,
    K_inv,
    tcfg: TrackingConfig,
):
    """One tracking decision-tree evaluation.

    Args:
        rng: PRNG key.
        flow_fwd: [H x W x 2] flow ref -> cur.
        flow_diff: [H x W] forward-backward flow inconsistency.
        depth_cur_raw, depth_ref_raw: [H x W] raw CNN depths.
        prev_motion: [4 x 4] previous relative pose (constant-motion model).
        K, K_inv: [3 x 3] intrinsics.
        tcfg: static tracking configuration.

    Returns:
        dict with ``pose`` [4x4] relative pose (cur -> ref), ``mode``
        (0 const / 1 essential / 2 pnp), ``good_kp_found``, keypoints and
        inlier data for visualization.
    """
    spec = KPSelectionSpec(
        tcfg.height, tcfg.width, tcfg.kp_rows, tcfg.kp_cols, tcfg.num_kp
    )
    crop = tcfg.depth_crop
    depth_cur = preprocess_depth_device(
        depth_cur_raw, crop, (tcfg.min_depth, tcfg.max_depth)
    )
    depth_ref = preprocess_depth_device(
        depth_ref_raw, crop, (tcfg.min_depth, tcfg.max_depth)
    )

    kp = local_bestN(
        spec,
        flow_fwd,
        flow_diff,
        tcfg.flow_diff_thre,
        score_method=tcfg.kp_score_method,
    )
    kp_ref, kp_cur, valid = kp["kp1"], kp["kp2"], kp["valid"]

    rng_e, rng_s, rng_p = jax.random.split(rng, 3)

    e_out = compute_pose_2d2d(
        rng_e,
        kp_cur,
        kp_ref,
        valid,
        K,
        K_inv,
        reproj_thre=tcfg.e_reproj_thre,
        repeats=tcfg.e_repeats,
        num_hypotheses=tcfg.num_hypotheses,
        validity_method=tcfg.validity_method,
    )
    T_e = make_se3(e_out["R"], e_out["t"])  # cur -> ref, unit translation

    scale_out = find_scale_from_depth(
        rng_s,
        kp_ref,
        kp_cur,
        valid,
        se3_inverse(T_e),
        depth_cur,
        K_inv,
        ransac_thre=tcfg.scale_ransac_thre,
        max_trials=tcfg.scale_max_trials,
        min_samples=tcfg.scale_min_samples,
    )
    scale = jnp.where(e_out["valid"], scale_out["scale"], -1.0)
    e_success = e_out["valid"] & (scale != -1.0)
    pose_e = T_e.at[:3, 3].multiply(scale)

    def run_pnp(_):
        return compute_pose_3d2d(
            rng_p,
            kp_ref,
            kp_cur,
            valid,
            depth_ref,
            K,
            K_inv,
            min_depth=tcfg.min_depth,
            max_depth=tcfg.max_depth,
            reproj_thre=tcfg.pnp_reproj_thre,
            repeats=tcfg.pnp_repeats,
            num_hypotheses=tcfg.num_hypotheses,
        )

    def skip_pnp(_):
        n = kp_ref.shape[0]
        return {
            "T": jnp.eye(4, dtype=pose_e.dtype),
            "ok": jnp.array(False),
            "inliers": jnp.zeros(n, bool),
            "mask": jnp.zeros(n, bool),
        }

    need_pnp = kp["good_kp_found"] & (~e_success)
    pnp_out = jax.lax.cond(need_pnp, run_pnp, skip_pnp, None)

    pose = jnp.where(e_success, pose_e, pnp_out["T"])
    pose = jnp.where(kp["good_kp_found"], pose, prev_motion)
    mode = jnp.where(
        kp["good_kp_found"],
        jnp.where(e_success, TRACK_MODE_ESSENTIAL, TRACK_MODE_PNP),
        TRACK_MODE_CONST,
    )

    return {
        "pose": pose,
        "mode": mode,
        "good_kp_found": kp["good_kp_found"],
        "scale": scale,
        "kp_ref": kp_ref,
        "kp_cur": kp_cur,
        "kp_valid": valid,
        "inliers": jnp.where(e_success, e_out["inliers"], pnp_out["inliers"]),
        "fb_flow_mask": kp["fb_flow_mask"],
        "depth_cur": depth_cur,
    }
