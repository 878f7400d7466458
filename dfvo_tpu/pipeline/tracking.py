"""The fused on-device tracking step: keypoints → E-tracker → scale → PnP.

This is the reference's per-frame ``DFVO.tracking()`` decision tree
(libs/dfvo.py:121-262) expressed as one jitted computation: keypoint
selection (local best-N / best-N / uniform sampled, optional depth
consistency), essential-matrix pose with GRIC validity, triangulation scale
recovery (simple or iterative), optional rigid-flow iterative keypoint
refinement, and the PnP fallback under ``lax.cond`` (so the fallback's cost
is only paid on frames that need it). The scalar decisions mirror the
reference exactly:

* no good keypoints            -> constant-motion model (dfvo.py:157-161)
* E valid and scale recovered  -> E pose with metric translation
* ‖t‖ = 0 or scale = -1        -> PnP pose (dfvo.py:227-250)

Config-driven stages (iterative kp, iterative scale, depth consistency) are
*static* branches: they specialize the compiled program, not runtime
control flow.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..geometry.lie import make_se3, se3_inverse
from ..geometry.ops import backproject_depth, reproject, rigid_flow, transform_points
from ..matching.kp_selection import (
    KPSelectionSpec,
    bestN_flow_kp,
    local_bestN,
    opt_rigid_flow_kp,
    sampled_kp,
    sampled_kp_indices,
)
from ..ops.warp import grid_sample
from ..tracker.e_tracker import compute_pose_2d2d, find_scale_from_depth
from ..tracker.pnp_tracker import compute_pose_3d2d

TRACK_MODE_CONST = 0
TRACK_MODE_ESSENTIAL = 1
TRACK_MODE_PNP = 2


@dataclass(frozen=True)
class TrackingConfig:
    """Static (hashable) tracking configuration distilled from the YAML
    option surface (options/examples/default_configuration.yml)."""

    # tracker dispatch (ref default_configuration.yml:132, dfvo.py:164-249):
    # hybrid = E-tracker with PnP fallback; PnP = PnP every frame (the
    # tracker_pnp ablation). deep_pose never reaches tracking_step (the
    # pipeline short-circuits it, pipeline/dfvo.py).
    tracking_method: str = "hybrid"
    # image / kp selection
    height: int = 192
    width: int = 640
    kp_method: str = "local_bestN"  # local_bestN | bestN | sampled
    num_kp: int = 2000
    kp_rows: int = 10
    kp_cols: int = 10
    flow_diff_thre: float = 0.1
    kp_score_method: str = "flow"
    flow_crop: tuple = ((0.0, 1.0), (0.0, 1.0))
    # depth consistency kp filter (needs the pose CNN)
    depth_consistency: bool = False
    depth_consistency_thre: float = 0.05
    # depth preprocessing
    depth_crop: tuple = ((0.3, 1.0), (0.0, 1.0))
    min_depth: float = 0.0
    max_depth: float = 50.0
    # e-tracker (reference: 5 repeats when iterative kp is DISABLED,
    # 3 on the coarse pass otherwise; E_tracker.py:179)
    e_reproj_thre: float = 0.2
    e_repeat: int = 5
    e_iterative_kp: bool = False
    e_iter_score_method: str = "opt_flow"
    validity_method: str = "GRIC"
    validity_thre: float = 0.0  # cfg.e_tracker.validity.thre (flow/homo_ratio)
    # rigid-flow kp selection
    rigid_rows: int = 10
    rigid_cols: int = 10
    rigid_num_kp: int = 2000
    rigid_flow_thre: float = 5.0
    optical_flow_thre: float = 0.1
    # scale recovery
    scale_method: str = "simple"  # simple | iterative
    scale_ransac_thre: float = 0.1
    scale_max_trials: int = 100
    scale_min_samples: int = 3
    scale_iterative_kp: bool = False
    scale_iter_score_method: str = "rigid_flow"
    # scale spike guard (TPU-native addition, tpu.scale_jump_guard; 0 = off):
    # reject a scale that jumps more than this factor from the previous
    # frame's and let the PnP fallback handle the frame. The depth-ratio
    # RANSAC inherits a failure mode from the reference (E_tracker.py:614-641)
    # on frames where most of the depth map disagrees with the flow (massive
    # occlusion / content turnover): the outlier ratios form the majority
    # consensus and the scale comes out 10-15x wrong (a physically impossible
    # per-frame speed change), while PnP's reprojection test rejects those
    # same pixels and stays metric. tools/longdrive_parity.py pairs 510/601.
    scale_jump_guard: float = 5.0
    # pnp
    pnp_reproj_thre: float = 1.0
    pnp_repeat: int = 5
    pnp_iter: int = 100  # hypotheses per repeat (ref ransac.iter)
    pnp_iterative_kp: bool = False
    pnp_iter_score_method: str = "rigid_flow"
    # ransac batching
    num_hypotheses: int = 256
    # statically drop the PnP-fallback branch (E-success path only, with
    # constant-motion fallback): the benchmark's realistic-path mode — on
    # real KITTI the E path dominates, while random benchmark frames force
    # the PnP conditional every frame (2.9 ms/frame in the device profile)
    force_e_path: bool = False
    # batch mode: skip the per-frame PnP cond and let the chunk runner
    # substitute one chunk-batched PnP pass under a single lax.cond —
    # under vmap a per-frame cond lowers to a select that executes BOTH
    # branches for every lane, so the per-frame cond must not be vmapped
    defer_pnp: bool = False
    # compute the pose-induced rigid-flow-diff map (drawer tile). Static so
    # drawer-off per-frame runs don't pay the extra full-res reprojection
    # (scan mode DCEs the dropped output either way).
    want_rigid_flow_diff: bool = True

    @classmethod
    def from_cfg(cls, cfg):
        dcrop = cfg.crop.depth_crop
        fcrop = cfg.crop.flow_crop
        kp_cfg = cfg.kp_selection
        if kp_cfg.local_bestN.enable:
            kp_method = "local_bestN"
            num_kp = kp_cfg.local_bestN.num_bestN
        elif kp_cfg.bestN.enable:
            kp_method = "bestN"
            num_kp = kp_cfg.bestN.num_bestN
        elif kp_cfg.sampled_kp.enable:
            kp_method = "sampled"
            num_kp = kp_cfg.sampled_kp.num_kp
        else:
            raise ValueError("no keypoint selection method enabled")
        cls._check_kp_src(cfg, kp_method)
        method = str(cfg.tracking_method)
        if method not in ("hybrid", "PnP", "deep_pose"):
            raise ValueError(
                "tracking_method must be one of [hybrid, PnP, deep_pose], "
                f"got {method!r}"
            )
        if method == "PnP" and bool(cfg.tpu.get("force_e_path", False)):
            raise ValueError(
                "tpu.force_e_path contradicts tracking_method: PnP"
            )
        return cls(
            tracking_method=method,
            height=cfg.image.height,
            width=cfg.image.width,
            kp_method=kp_method,
            num_kp=num_kp,
            kp_rows=kp_cfg.local_bestN.num_row,
            kp_cols=kp_cfg.local_bestN.num_col,
            flow_diff_thre=kp_cfg.local_bestN.thre,
            kp_score_method=kp_cfg.local_bestN.score_method,
            flow_crop=((fcrop[0][0], fcrop[0][1]), (fcrop[1][0], fcrop[1][1])),
            depth_consistency=bool(kp_cfg.depth_consistency.enable),
            depth_consistency_thre=kp_cfg.depth_consistency.thre,
            depth_crop=((dcrop[0][0], dcrop[0][1]), (dcrop[1][0], dcrop[1][1])),
            min_depth=cfg.depth.min_depth,
            max_depth=cfg.depth.max_depth,
            e_reproj_thre=cfg.e_tracker.ransac.reproj_thre,
            e_repeat=cfg.e_tracker.ransac.repeat,
            e_iterative_kp=bool(cfg.e_tracker.iterative_kp.enable),
            e_iter_score_method=cfg.e_tracker.iterative_kp.score_method,
            validity_method=cfg.e_tracker.validity.method,
            validity_thre=float(cfg.e_tracker.validity.thre or 0.0),
            rigid_rows=kp_cfg.rigid_flow_kp.num_row,
            rigid_cols=kp_cfg.rigid_flow_kp.num_col,
            rigid_num_kp=kp_cfg.rigid_flow_kp.num_bestN,
            rigid_flow_thre=kp_cfg.rigid_flow_kp.rigid_flow_thre,
            optical_flow_thre=kp_cfg.rigid_flow_kp.optical_flow_thre,
            scale_method=cfg.scale_recovery.method,
            scale_ransac_thre=cfg.scale_recovery.ransac.thre,
            # batched trials are ~free on TPU: oversample the reference's
            # max_trials (100) so knife-edge frames whose true-scale
            # consensus is a ~20% minority mode still converge (the
            # reference's sklearn loop misses those with ~1/3 odds and
            # produces 10-15x translation spikes; tools/longdrive_parity.py)
            scale_max_trials=max(
                int(cfg.scale_recovery.ransac.max_trials),
                int(cfg.tpu.get("scale_ransac_hypotheses", 1024) or 0),
            ),
            scale_min_samples=cfg.scale_recovery.ransac.min_samples,
            scale_iterative_kp=bool(cfg.scale_recovery.iterative_kp.enable),
            scale_iter_score_method=cfg.scale_recovery.iterative_kp.score_method,
            scale_jump_guard=float(
                cfg.tpu.get("scale_jump_guard", 5.0) or 0.0
            ),
            pnp_reproj_thre=cfg.pnp_tracker.ransac.reproj_thre,
            pnp_repeat=cfg.pnp_tracker.ransac.repeat,
            pnp_iter=cfg.pnp_tracker.ransac.iter,
            pnp_iterative_kp=bool(cfg.pnp_tracker.iterative_kp.enable),
            pnp_iter_score_method=cfg.pnp_tracker.iterative_kp.score_method,
            num_hypotheses=cfg.tpu.ransac_hypotheses,
            force_e_path=bool(cfg.tpu.get("force_e_path", False)),
            want_rigid_flow_diff=bool(
                cfg.visualization.enable
                and cfg.visualization.flow.vis_rigid_diff
            ),
        )

    @staticmethod
    def _check_kp_src(cfg, kp_method):
        """Validate the per-stage ``kp_src`` indirection against the folded
        keypoint routing (ref default_configuration.yml:139-178, consumed at
        dfvo.py:168-170,230-241 and E_tracker.py:495-500).

        The reference populates ``kp_best`` when local_bestN/bestN is the
        enabled selector and ``kp_list`` when sampled_kp is
        (keypoint_sampler.py:153-163), and every stage reads the set named by
        its ``kp_src``. This build folds the routing statically: the enabled
        selector's output feeds all stages, and iterative refinements always
        use the rigid-flow set (``kp_depth``). Consistent configs — including
        the ref's uniform ablation spelled ``kp_src: kp_list`` — pass through;
        a per-stage mix the folded design cannot express raises instead of
        being silently ignored.
        """
        primary = "kp_list" if kp_method == "sampled" else "kp_best"
        for stage in ("e_tracker", "scale_recovery", "pnp_tracker"):
            stage_cfg = cfg.get(stage) or {}
            src = stage_cfg.get("kp_src") or primary
            if src != primary:
                raise ValueError(
                    f"{stage}.kp_src: {src!r} is not supported with the "
                    f"{kp_method!r} keypoint selector (which provides "
                    f"{primary!r}); per-stage kp_src mixing is folded "
                    "statically in this build"
                )
            it_cfg = stage_cfg.get("iterative_kp") or {}
            it_src = it_cfg.get("kp_src") or "kp_depth"
            if it_cfg.get("enable") and it_src != "kp_depth":
                raise ValueError(
                    f"{stage}.iterative_kp.kp_src: {it_src!r} is not "
                    "supported; iterative refinement uses the rigid-flow "
                    "keypoints ('kp_depth')"
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


def compute_depth_consistency(depth_cur_raw, depth_ref_raw, T_deep, K, K_inv):
    """Depth-consistency map from CNN depths + CNN pose
    (ref libs/matching/depth_consistency.py:69-153): reproject the current
    depth with the deep pose, sample the reference depth there, and take
    |warped - reprojected| / reprojected clipped to [0, 1].
    """
    depth = depth_cur_raw[None]
    coords = reproject(depth, T_deep[None], K, K_inv)
    warp_depth = grid_sample(
        depth_ref_raw[None, :, :, None], coords, padding_mode="border"
    )[0, :, :, 0]
    pts = backproject_depth(depth, K_inv)
    reproj_depth = transform_points(pts, T_deep[None])[0, :, :, 2]
    diff = jnp.abs(warp_depth - reproj_depth)
    return jnp.clip(diff / jnp.maximum(reproj_depth, 1e-12), 0.0, 1.0)


def _rigid_flow_kp(
    rigid_spec, flow_fwd, flow_diff, depth_ref_raw, T_ref2cur, K, K_inv, tcfg,
    score_method,
):
    """Rigid-optical flow consistent keypoints (ref
    E_tracker.py:645-705): render the pose-induced flow from the reference
    raw depth, compare against the optical flow, select per-cell."""
    rflow = rigid_flow(depth_ref_raw[None], T_ref2cur[None], K, K_inv)[0]
    rdiff = jnp.linalg.norm(rflow - flow_fwd, axis=-1)
    return opt_rigid_flow_kp(
        rigid_spec,
        flow_fwd,
        flow_diff,
        rdiff,
        rigid_thre=tcfg.rigid_flow_thre,
        opt_thre=tcfg.optical_flow_thre,
        score_method=score_method,
    )


def _select_keypoints(tcfg, flow_fwd, flow_diff, depth_diff):
    """Dispatch on the configured keypoint method (ref
    keypoint_sampler.py:76-143)."""
    if tcfg.kp_method == "local_bestN":
        spec = KPSelectionSpec(
            tcfg.height, tcfg.width, tcfg.kp_rows, tcfg.kp_cols, tcfg.num_kp
        )
        return local_bestN(
            spec,
            flow_fwd,
            flow_diff,
            tcfg.flow_diff_thre,
            score_method=tcfg.kp_score_method,
            depth_diff=depth_diff,
            depth_diff_thre=tcfg.depth_consistency_thre,
        )
    if tcfg.kp_method == "bestN":
        return bestN_flow_kp(flow_fwd, flow_diff, tcfg.num_kp)
    if tcfg.kp_method == "sampled":
        kp1 = sampled_kp_indices(
            tcfg.height, tcfg.width, tcfg.flow_crop, tcfg.num_kp
        )
        return sampled_kp(kp1, flow_fwd)
    raise ValueError(f"unknown kp method: {tcfg.kp_method}")


def pnp_fallback(
    rng, kp_ref, kp_cur, valid, depth_ref,
    flow_fwd, flow_diff, depth_ref_raw, K, K_inv, tcfg: TrackingConfig,
):
    """The PnP fallback branch (ref dfvo.py:227-250), callable standalone.

    Derives its PRNG keys by the same ``split(rng, 8)`` as ``tracking_step``
    (keys 5 and 6), so running it deferred — chunk-batched by the scan
    runner — is bit-identical to the in-step ``lax.cond`` branch.
    """
    keys = jax.random.split(rng, 8)
    out = compute_pose_3d2d(
        keys[5],
        kp_ref,
        kp_cur,
        valid,
        depth_ref,
        K,
        K_inv,
        min_depth=tcfg.min_depth,
        max_depth=tcfg.max_depth,
        reproj_thre=tcfg.pnp_reproj_thre,
        repeats=3 if tcfg.pnp_iterative_kp else tcfg.pnp_repeat,
        num_hypotheses=tcfg.pnp_iter,
    )
    if tcfg.pnp_iterative_kp:
        rigid_spec = KPSelectionSpec(
            tcfg.height, tcfg.width, tcfg.rigid_rows, tcfg.rigid_cols,
            tcfg.rigid_num_kp,
        )
        rkp = _rigid_flow_kp(
            rigid_spec, flow_fwd, flow_diff, depth_ref_raw,
            se3_inverse(out["T"]), K, K_inv, tcfg,
            tcfg.pnp_iter_score_method,
        )
        out2 = compute_pose_3d2d(
            keys[6],
            rkp["kp1_best"],
            rkp["kp2_best"],
            rkp["valid_best"],
            depth_ref,
            K,
            K_inv,
            min_depth=tcfg.min_depth,
            max_depth=tcfg.max_depth,
            reproj_thre=tcfg.pnp_reproj_thre,
            repeats=tcfg.pnp_repeat,
            num_hypotheses=tcfg.pnp_iter,
        )
        use2 = out2["ok"]
        out = {
            "T": jnp.where(use2, out2["T"], out["T"]),
            "ok": out["ok"] | out2["ok"],
            "inliers": jnp.where(use2, out2["inliers"], out["inliers"]),
            "mask": jnp.where(use2, out2["mask"], out["mask"]),
        }
    return out


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
    prev_scale=1.0,
    deep_pose=None,
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
        prev_scale: previous frame's scale (seed for iterative scale
            recovery, ref E_tracker.py:528).
        deep_pose: optional [4 x 4] pose-CNN prediction (depth consistency).

    Returns:
        dict with ``pose`` [4x4] relative pose (cur -> ref), ``mode``
        (0 const / 1 essential / 2 pnp), ``good_kp_found``, ``scale``,
        keypoints and inlier data for visualization.
    """
    crop = tcfg.depth_crop
    depth_cur = preprocess_depth_device(
        depth_cur_raw, crop, (tcfg.min_depth, tcfg.max_depth)
    )
    depth_ref = preprocess_depth_device(
        depth_ref_raw, crop, (tcfg.min_depth, tcfg.max_depth)
    )

    depth_diff = None
    if tcfg.depth_consistency and deep_pose is not None:
        depth_diff = compute_depth_consistency(
            depth_cur_raw, depth_ref_raw, deep_pose, K, K_inv
        )

    kp = _select_keypoints(tcfg, flow_fwd, flow_diff, depth_diff)
    kp_ref, kp_cur, valid = kp["kp1"], kp["kp2"], kp["valid"]

    rigid_spec = KPSelectionSpec(
        tcfg.height, tcfg.width, tcfg.rigid_rows, tcfg.rigid_cols,
        tcfg.rigid_num_kp,
    )

    keys = jax.random.split(rng, 8)

    if tcfg.tracking_method == "PnP":
        # PnP-only tracker (ref ablation_tracker_pnp.yml, dfvo.py:226-250
    	# with the E-tracker block skipped: E_pose stays identity, so the
        # `norm(t) == 0` test routes EVERY good-kp frame through PnP)
        n = kp_ref.shape[0]
        e_out = {
            "R": jnp.eye(3, dtype=jnp.float32),
            "t": jnp.zeros(3, jnp.float32),
            "valid": jnp.array(False),
            "inliers": jnp.zeros(n, bool),
            "inlier_cnt": jnp.asarray(0),
        }
        T_e = jnp.eye(4, dtype=jnp.float32)
        scale = jnp.asarray(-1.0, jnp.float32)
        e_success = jnp.array(False)
        pose_e = T_e
        return _finish_tracking_step(
            rng, tcfg, kp, kp_ref, kp_cur, valid, e_out, e_success, pose_e,
            scale, prev_motion, depth_ref, depth_cur, depth_ref_raw,
            flow_fwd, flow_diff, K, K_inv,
        )

    # ---- E-tracker (first pass; 3 repeats when a refined pass follows,
    # ref E_tracker.py:179) -------------------------------------------------
    e_out = compute_pose_2d2d(
        keys[0],
        kp_cur,
        kp_ref,
        valid,
        K,
        K_inv,
        reproj_thre=tcfg.e_reproj_thre,
        repeats=3 if tcfg.e_iterative_kp else tcfg.e_repeat,
        num_hypotheses=tcfg.num_hypotheses,
        validity_method=tcfg.validity_method,
        validity_thre=tcfg.validity_thre,
    )
    T_e = make_se3(e_out["R"], e_out["t"])  # cur -> ref, unit translation

    # ---- scale recovery ---------------------------------------------------
    def simple_scale(rng_s, kp_r, kp_c, v, T):
        return find_scale_from_depth(
            rng_s,
            kp_r,
            kp_c,
            v,
            se3_inverse(T),
            depth_cur,
            K_inv,
            ransac_thre=tcfg.scale_ransac_thre,
            max_trials=tcfg.scale_max_trials,
            min_samples=tcfg.scale_min_samples,
        )["scale"]

    if tcfg.scale_method == "simple":
        scale = simple_scale(keys[1], kp_ref, kp_cur, valid, T_e)
    elif tcfg.scale_method == "iterative":
        # 5 iterations of rigid-flow-consistent kp + scale refit, frozen
        # once |Δscale| < 0.001 (ref E_tracker.py:509-569)
        def body(i, carry):
            scale, done = carry
            T_scaled = T_e.at[:3, 3].multiply(scale)
            rkp = _rigid_flow_kp(
                rigid_spec, flow_fwd, flow_diff, depth_ref_raw,
                se3_inverse(T_scaled), K, K_inv, tcfg,
                tcfg.scale_iter_score_method,
            )
            new_scale = simple_scale(
                jax.random.fold_in(keys[2], i),
                rkp["kp1_uniform"],
                rkp["kp2_uniform"],
                rkp["valid_uniform"],
                T_e,
            )
            delta = jnp.abs(new_scale - scale)
            out_scale = jnp.where(done, scale, new_scale)
            return out_scale, done | (delta < 0.001)

        scale, _ = jax.lax.fori_loop(
            0, 5, body, (jnp.asarray(prev_scale, jnp.float32), jnp.array(False))
        )
    else:
        raise ValueError(f"unknown scale method: {tcfg.scale_method}")

    scale = jnp.where(e_out["valid"], scale, -1.0)

    # ---- iterative keypoint refinement (ref dfvo.py:195-222) -------------
    if tcfg.e_iterative_kp:
        T_hybrid = T_e.at[:3, 3].multiply(jnp.where(scale != -1, scale, 1.0))
        rkp = _rigid_flow_kp(
            rigid_spec, flow_fwd, flow_diff, depth_ref_raw,
            se3_inverse(T_hybrid), K, K_inv, tcfg, tcfg.e_iter_score_method,
        )
        e_ref = compute_pose_2d2d(
            keys[3],
            rkp["kp2_best"],
            rkp["kp1_best"],
            rkp["valid_best"],
            K,
            K_inv,
            reproj_thre=tcfg.e_reproj_thre,
            repeats=tcfg.e_repeat,
            num_hypotheses=tcfg.num_hypotheses,
            validity_method=tcfg.validity_method,
            validity_thre=tcfg.validity_thre,
        )
        # adopt the refined pose when it is valid; otherwise keep pass 1
        use_ref = e_ref["valid"]
        R2 = jnp.where(use_ref, e_ref["R"], e_out["R"])
        t2 = jnp.where(use_ref, e_ref["t"], e_out["t"])
        e_out = {
            "R": R2,
            "t": t2,
            "valid": e_out["valid"] | e_ref["valid"],
            "inliers": jnp.where(use_ref, e_ref["inliers"], e_out["inliers"]),
            "inlier_cnt": jnp.where(
                use_ref, e_ref["inlier_cnt"], e_out["inlier_cnt"]
            ),
        }
        T_e = make_se3(e_out["R"], e_out["t"])
        if tcfg.scale_iterative_kp:
            scale_ref = simple_scale(
                keys[4],
                rkp["kp1_best"],
                rkp["kp2_best"],
                rkp["valid_best"],
                T_e,
            )
            scale = jnp.where(e_out["valid"], scale_ref, -1.0)

    if tcfg.scale_jump_guard > 0:
        # physically impossible per-frame speed jumps mean the depth-ratio
        # consensus was captured by outliers (see TrackingConfig docstring);
        # fail the scale so the robust PnP fallback takes the frame
        ps = jnp.asarray(prev_scale, jnp.float32)
        g = jnp.float32(tcfg.scale_jump_guard)
        spike = (ps > 0) & (scale > 0) & (
            (scale > ps * g) | (scale * g < ps)
        )
        scale = jnp.where(spike, -1.0, scale)

    e_success = e_out["valid"] & (scale != -1.0)
    pose_e = T_e.at[:3, 3].multiply(scale)
    return _finish_tracking_step(
        rng, tcfg, kp, kp_ref, kp_cur, valid, e_out, e_success, pose_e,
        scale, prev_motion, depth_ref, depth_cur, depth_ref_raw,
        flow_fwd, flow_diff, K, K_inv,
    )


def _finish_tracking_step(
    rng, tcfg, kp, kp_ref, kp_cur, valid, e_out, e_success, pose_e, scale,
    prev_motion, depth_ref, depth_cur, depth_ref_raw, flow_fwd, flow_diff,
    K, K_inv,
):
    """Decision-tree tail shared by the hybrid and PnP-only trackers: the
    PnP dispatch (fallback in hybrid mode; the whole tracker in PnP mode,
    where ``e_success`` is statically False), constant-motion substitution,
    and the output dict."""
    # ---- PnP fallback (ref dfvo.py:227-250) -------------------------------
    def run_pnp(_):
        return pnp_fallback(
            rng, kp_ref, kp_cur, valid, depth_ref,
            flow_fwd, flow_diff, depth_ref_raw, K, K_inv, tcfg,
        )

    def skip_pnp(_):
        n = kp_ref.shape[0]
        return {
            "T": jnp.eye(4, dtype=pose_e.dtype),
            "ok": jnp.array(False),
            "inliers": jnp.zeros(n, bool),
            "mask": jnp.zeros(n, bool),
        }

    need_pnp = kp["good_kp_found"] & (~e_success) & (not tcfg.force_e_path)
    if tcfg.force_e_path:
        # benchmark's realistic-path mode: no PnP branch compiled at all;
        # E failure falls back to constant motion
        pnp_out = skip_pnp(None)
        pnp_out["T"] = prev_motion
    elif tcfg.defer_pnp:
        # batch mode: placeholder pose; the chunk runner substitutes the
        # result of ONE chunk-batched pnp_fallback under a single lax.cond
        # for frames flagged need_pnp (see scan_runner.py)
        pnp_out = skip_pnp(None)
        pnp_out["T"] = prev_motion
    else:
        pnp_out = jax.lax.cond(need_pnp, run_pnp, skip_pnp, None)

    pose = jnp.where(e_success, pose_e, pnp_out["T"])
    pose = jnp.where(kp["good_kp_found"], pose, prev_motion)
    fallback_mode = TRACK_MODE_CONST if tcfg.force_e_path else TRACK_MODE_PNP
    mode = jnp.where(
        kp["good_kp_found"],
        jnp.where(e_success, TRACK_MODE_ESSENTIAL, fallback_mode),
        TRACK_MODE_CONST,
    )

    # pose-induced rigid flow diff map (visualization parity with the
    # reference's rigid_flow_mask tile, frame_drawer.py:498-512): a full-res
    # reprojection of the reference depth, so only computed when the drawer
    # will consume it (static flag; scan mode DCEs the output either way)
    if tcfg.want_rigid_flow_diff:
        rflow_final = rigid_flow(
            depth_ref_raw[None], se3_inverse(pose)[None], K, K_inv
        )[0]
        rigid_flow_diff = jnp.linalg.norm(rflow_final - flow_fwd, axis=-1)
    else:
        rigid_flow_diff = jnp.zeros_like(flow_diff)

    return {
        "pose": pose,
        "mode": mode,
        "good_kp_found": kp["good_kp_found"],
        "scale": scale,
        "kp_ref": kp_ref,
        "kp_cur": kp_cur,
        "kp_valid": valid,
        "inliers": jnp.where(e_success, e_out["inliers"], pnp_out["inliers"]),
        "fb_flow_mask": kp.get("fb_flow_mask", flow_diff),
        "rigid_flow_diff": rigid_flow_diff,
        "depth_cur": depth_cur,
        # consumed only by the defer_pnp chunk runner (DCE'd otherwise)
        "need_pnp": need_pnp,
        "depth_ref": depth_ref,
    }
