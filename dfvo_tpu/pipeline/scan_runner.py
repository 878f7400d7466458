"""Batch ("scan") execution mode: the frame loop itself runs on device.

The interactive pipeline (pipeline/dfvo.py) dispatches one fused step per
frame — already orders of magnitude fewer host round trips than the
reference, but each step still pays a dispatch + host sync. For maximum
throughput (benchmarking, offline batch processing, multi-sequence slices)
this runner uploads a CHUNK of frames and `lax.scan`s the VO step over
them: T frames per device call, with the depth map and constant-motion
state as the scan carry. Host work per chunk collapses to one upload and
one [T x 4 x 4] pose download; relative-to-global pose chaining is a cheap
host composition afterwards (SURVEY.md §2.12 "pipelined lax.scan over frame
pairs").
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from .frontend import DeepFrontend
from .tracking import TrackingConfig, pnp_fallback, tracking_step


# (frontend static key, tracking config) -> jitted chunk-step / init-depth
# functions, shared across ScanRunner instances (same rationale as
# dfvo._STEP_FN_CACHE: tracing the fused chunk program is expensive).
# Chunk size is a call-time shape, so one function serves every chunk.
_CHUNK_FN_CACHE = {}


def make_chunk_step(frontend, tcfg):
    """Build the (un-jitted) fused chunk-step function for a frontend +
    tracking config. ScanRunner jits it directly; MultiSeqRunner shard_maps
    it over a sequence mesh (one chunk program per device)."""
    # the only cross-frame dependencies inside tracking are the
    # constant-motion fallback pose and the prev_scale seed of the
    # ITERATIVE scale mode; with simple scale recovery (the default)
    # every frame's tracking is independent, so it runs as one vmap
    # (one kernel per op for the whole chunk) followed by an exact,
    # trivially cheap fix-up scan that substitutes the fallback poses.
    # The sequential lax.scan (16x the kernel-launch latency — ~1.5
    # ms/frame of the round-2 device profile) remains only for the
    # iterative-scale configuration.
    parallel_tracking = tcfg.scale_method == "simple"

    from .tracking import TRACK_MODE_CONST

    def chunk_step(variables, imgs_u8, carry, rngs, K, K_inv, oracle=None):
            """imgs_u8: [T x H x W x 3]; carry = (img_ref_u8, depth_ref_raw,
            prev_motion, prev_scale). Returns ([T x 4 x 4] relative poses,
            [T] modes, new carry).

            ``oracle`` (optional): dict of ``depths``/``flow_fwd``/
            ``flow_diff`` arrays shaped like ``infer_chunk``'s outputs.
            When given, tracking consumes ``oracle + net * 1e-30`` — the
            networks still execute in full (nothing is dead-code-
            eliminable), but the decision tree sees coherent data. This is
            how the benchmark measures the realistic E-success program
            *dynamically* (untrained weights can never pass the E-validity
            vote on their own) and how synthetic-sequence tests drive the
            batch pipeline with known ground truth.

            Two phases: (1) ALL network inference for the chunk as one
            batch — the nets have no cross-frame dependency, and batching
            amortizes the per-conv dispatch latency that dominates at VO
            resolutions; (2) the tracking steps — vmapped across the chunk
            when frame-independent (see above), scanned otherwise.

            Deferred-PnP caveat: for frames where ``need_pnp`` fired, only
            ``pose`` and ``mode`` are patched with the chunk-batched
            fallback result; the step's other per-frame diagnostics
            (rigid_flow_diff, inliers, kp data) still reflect the identity
            placeholder pose. Batch mode surfaces only poses/modes — do not
            consume the rest of ``tr`` for deferred-PnP frames.
            """
            img_ref_u8, depth_ref0, prev_motion0, prev_scale0 = carry
            all_imgs = (
                jnp.concatenate([img_ref_u8[None], imgs_u8], axis=0).astype(
                    jnp.float32
                )
                / 255.0
            )
            fo = frontend.infer_chunk(variables, all_imgs)
            if oracle is not None:
                eps = jnp.float32(1e-30)
                fo = dict(
                    fo,
                    **{
                        k: oracle[k].astype(jnp.float32) + fo[k] * eps
                        for k in ("depths", "flow_fwd", "flow_diff")
                    },
                )
            # reference depth of pair i = depth of frame i
            depth_refs = jnp.concatenate(
                [depth_ref0[None], fo["depths"][:-1]], axis=0
            )

            if parallel_tracking:
                eye = jnp.eye(4, dtype=jnp.float32)
                # under vmap a per-frame PnP lax.cond would lower to a
                # select executing BOTH branches for every lane, so the
                # vmapped step defers PnP (placeholder pose + need_pnp
                # flag) and ONE chunk-level cond below runs the batched
                # fallback only when some frame in the chunk needs it —
                # all-E-success chunks (the common case on real sequences)
                # skip the PnP computation entirely
                # the scale-jump guard needs the previous frame's scale —
                # unknown under vmap (dummy prev_scale) — so it is applied
                # exactly in the fix-up scan below instead
                tcfg_v = (
                    dataclasses.replace(tcfg, scale_jump_guard=0.0)
                    if tcfg.force_e_path
                    else dataclasses.replace(
                        tcfg, defer_pnp=True, scale_jump_guard=0.0
                    )
                )

                def one(rng, flow_fwd, flow_diff, depth_cur, depth_ref):
                    # dummy prev_motion: CONST-mode frames are substituted
                    # by the fix-up scan below (mode==CONST <=> the step
                    # returned its prev_motion argument, in both the hybrid
                    # and force_e_path variants); PNP-mode frames by the
                    # chunk-batched fallback
                    return tracking_step(
                        rng,
                        flow_fwd,
                        flow_diff,
                        depth_cur,
                        depth_ref,
                        eye,
                        K,
                        K_inv,
                        tcfg_v,
                        prev_scale=1.0,
                    )

                tr = jax.vmap(one)(
                    rngs, fo["flow_fwd"], fo["flow_diff"], fo["depths"],
                    depth_refs,
                )

                if tcfg.scale_jump_guard > 0:
                    # sequential spike detection (tracking.py guard,
                    # identical carry rule: a spiked/failed frame does not
                    # update the running scale); a spiked E frame loses its
                    # scale and falls to the same mode frame execution
                    # would pick (PnP in hybrid, const-motion otherwise)
                    from .tracking import TRACK_MODE_ESSENTIAL, TRACK_MODE_PNP

                    g = jnp.float32(tcfg.scale_jump_guard)

                    def spike_fix(ps, s):
                        spike = (ps > 0) & (s > 0) & (
                            (s > ps * g) | (s * g < ps)
                        )
                        eff = jnp.where(spike, -1.0, s)
                        return jnp.where(eff > 0, eff, ps), (spike, eff)

                    _, (spikes, eff_scale) = jax.lax.scan(
                        spike_fix, prev_scale0, tr["scale"]
                    )
                    hit = spikes & (tr["mode"] == TRACK_MODE_ESSENTIAL)
                    fb_mode = (
                        TRACK_MODE_CONST if tcfg.force_e_path
                        else TRACK_MODE_PNP
                    )
                    # spiked frames' poses need no explicit substitution
                    # here: const-mode frames are replaced with prev_pose
                    # by the fix-up scan (keyed on mode), and PnP-mode
                    # frames by the batched fallback (keyed on need_pnp)
                    tr = dict(
                        tr,
                        scale=eff_scale,
                        mode=jnp.where(hit, fb_mode, tr["mode"]),
                        need_pnp=(
                            tr["need_pnp"]
                            if tcfg.force_e_path
                            else tr["need_pnp"] | hit
                        ),
                    )

                if not tcfg.force_e_path:
                    need = tr["need_pnp"]

                    def do_pnp(_):
                        def one_pnp(rng, kr, kc, v, dref, ff, fd, draw):
                            return pnp_fallback(
                                rng, kr, kc, v, dref, ff, fd, draw,
                                K, K_inv, tcfg,
                            )["T"]

                        return jax.vmap(one_pnp)(
                            rngs, tr["kp_ref"], tr["kp_cur"], tr["kp_valid"],
                            tr["depth_ref"], fo["flow_fwd"], fo["flow_diff"],
                            depth_refs,
                        )

                    def skip_pnp(_):
                        return jnp.broadcast_to(
                            eye, (need.shape[0], 4, 4)
                        )

                    pnp_T = jax.lax.cond(jnp.any(need), do_pnp, skip_pnp, None)
                    tr = dict(
                        tr,
                        pose=jnp.where(
                            need[:, None, None], pnp_T, tr["pose"]
                        ),
                    )

                def fix(carry, x):
                    prev_pose, prev_scale = carry
                    pose_i, mode_i, scale_i = x
                    pose = jnp.where(
                        mode_i == TRACK_MODE_CONST, prev_pose, pose_i
                    )
                    new_scale = jnp.where(scale_i > 0, scale_i, prev_scale)
                    return (pose, new_scale), (pose, mode_i)

                (last_pose, last_scale), (poses, modes) = jax.lax.scan(
                    fix,
                    (prev_motion0, prev_scale0),
                    (tr["pose"], tr["mode"], tr["scale"]),
                )
            else:

                def body(carry, x):
                    prev_motion, prev_scale = carry
                    flow_fwd, flow_diff, depth_cur, depth_ref, rng = x
                    tr = tracking_step(
                        rng,
                        flow_fwd,
                        flow_diff,
                        depth_cur,
                        depth_ref,
                        prev_motion,
                        K,
                        K_inv,
                        tcfg,
                        prev_scale=prev_scale,
                    )
                    new_scale = jnp.where(
                        tr["scale"] > 0, tr["scale"], prev_scale
                    )
                    return (tr["pose"], new_scale), (tr["pose"], tr["mode"])

                (last_pose, last_scale), (poses, modes) = jax.lax.scan(
                    body,
                    (prev_motion0, prev_scale0),
                    (
                        fo["flow_fwd"],
                        fo["flow_diff"],
                        fo["depths"],
                        depth_refs,
                        rngs,
                    ),
                )
            new_carry = (
                imgs_u8[-1],
                fo["depths"][-1],
                last_pose,
                last_scale,
            )
            return poses, modes, new_carry

    def init_depth(variables, img_u8):
        img = img_u8.astype(jnp.float32) / 255.0
        out = frontend.depth_net.apply(variables["depth"], img[None])
        return out["depth"][0]

    return chunk_step, init_depth


class ScanRunner:
    """Chunked on-device VO over a frame stream."""

    def __init__(self, cfg, frontend=None):
        self.cfg = cfg
        self.frontend = frontend or DeepFrontend(cfg)
        self.tcfg = TrackingConfig.from_cfg(cfg)
        self.chunk = int(cfg.tpu.scan_chunk)
        self._build()

    def _build(self):
        key = (self.frontend.static_key(), self.tcfg)
        cached = _CHUNK_FN_CACHE.get(key)
        if cached is not None:
            self._chunk_step, self._init_depth = cached
            return
        chunk_step, init_depth = make_chunk_step(self.frontend, self.tcfg)
        self._chunk_step = jax.jit(chunk_step)
        self._init_depth = jax.jit(init_depth)
        _CHUNK_FN_CACHE[key] = (self._chunk_step, self._init_depth)

    def run(self, variables, frames, K, K_inv, rng_seed=0):
        """Track a whole in-memory sequence.

        Args:
            variables: network variables.
            frames: [N x H x W x 3] uint8 array (N >= 2).
            K, K_inv: [3 x 3] numpy intrinsics.

        Returns:
            {frame: [4 x 4]} absolute poses (frame 0 = identity).
        """
        frames = np.asarray(frames)
        n = len(frames)
        variables = self.frontend.prepare_variables(variables)
        Kj = jnp.asarray(K, jnp.float32)
        Kij = jnp.asarray(K_inv, jnp.float32)

        depth0 = self._init_depth(variables, jnp.asarray(frames[0]))
        carry = (
            jnp.asarray(frames[0]),
            depth0,
            jnp.eye(4, dtype=jnp.float32),
            jnp.asarray(1.0, jnp.float32),
        )

        rel_poses = []
        t = self.chunk
        base = jax.random.PRNGKey(rng_seed)
        for start in range(1, n, t):
            chunk = frames[start : start + t]
            pad = t - len(chunk)
            if pad:  # static chunk shape; padded frames discarded below
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            rngs = jax.vmap(
                lambda i: jax.random.fold_in(base, i)
            )(jnp.arange(start, start + t))
            poses, modes, carry = self._chunk_step(
                variables, jnp.asarray(chunk), carry, rngs, Kj, Kij
            )
            rel_poses.append(np.asarray(poses)[: t - pad if pad else t])

        rel = np.concatenate(rel_poses, axis=0)
        out = {0: np.eye(4)}
        T = np.eye(4)
        for i in range(len(rel)):
            T = T @ rel[i].astype(np.float64)
            out[i + 1] = T
        return out
