"""Multi-sequence parallel tracking and finetuning over a device mesh.

The reference is strictly single-process/single-GPU (SURVEY.md §2.12).
This module is the framework's new distributed capability: many video
sequences tracked in parallel, one (or more) sequence per TPU core, via
``jax.shard_map`` over a 1-D ``seq`` mesh axis. Network weights are
replicated (tiny: ResNet-18 + LiteFlowNet ≈ 20 M params); only the frame
batch is sharded, so the VO path needs no collectives at all — exactly the
layout that keeps ICI idle except for the finetuning all-reduce.

Distributed online finetuning shards frame pairs the same way and
mean-psums the loss gradients across ``seq`` before a replicated Adam step
(classic data parallelism; this is the "FULL training step" exercised by
__graft_entry__.dryrun_multichip).
"""

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..pipeline.finetune import OnlineFinetuner
from ..pipeline.frontend import DeepFrontend
from ..pipeline.tracking import TrackingConfig, tracking_step


def make_seq_mesh(devices=None, axis_name="seq"):
    """1-D mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


# (frontend static key, tracking config, mesh, axis name) -> jitted
# sharded VO step, shared across MultiSeqRunner instances (tracing the
# shard_mapped full step is expensive; see dfvo._STEP_FN_CACHE)
_VO_STEP_CACHE = {}


class MultiSeqRunner:
    """Builds sharded multi-sequence step functions for a config."""

    def __init__(self, cfg, mesh=None, axis_name="seq"):
        self.cfg = cfg
        self.axis_name = axis_name
        self.mesh = mesh if mesh is not None else make_seq_mesh(axis_name=axis_name)
        self.frontend = DeepFrontend(cfg)
        self.tcfg = TrackingConfig.from_cfg(cfg)
        self.finetuner = OnlineFinetuner(self.frontend, cfg)

    # ------------------------------------------------------------------
    def make_vo_step(self):
        """Sharded batched VO step.

        Returns a jitted fn(variables, img_cur_u8 [S x H x W x 3],
        img_ref_u8 [S], depth_ref [S x H x W], prev_motion [S x 4 x 4],
        rngs [S x 2], K [S x 3 x 3], K_inv [S x 3 x 3]) ->
        (poses [S x 4 x 4], modes [S], depth_cur [S x H x W]) with S
        sequences (and their per-sequence intrinsics) sharded over the mesh.
        """
        key = (
            self.frontend.static_key(),
            self.tcfg,
            self.mesh,
            self.axis_name,
        )
        cached = _VO_STEP_CACHE.get(key)
        if cached is not None:
            return cached
        frontend = self.frontend
        tcfg = self.tcfg

        def one(variables, img_cur_u8, img_ref_u8, depth_ref, prev_motion, rng, K, K_inv):
            img_cur = img_cur_u8.astype(jnp.float32) / 255.0
            img_ref = img_ref_u8.astype(jnp.float32) / 255.0
            fo = frontend.infer(variables, img_cur, img_ref)
            tr = tracking_step(
                rng, fo["flow_fwd"], fo["flow_diff"], fo["depth_cur"],
                depth_ref, prev_motion, K, K_inv, tcfg,
            )
            return tr["pose"], tr["mode"], fo["depth_cur"]

        def local_batch(variables, img_cur, img_ref, depth_ref, prev, rngs, K, K_inv):
            return jax.vmap(
                one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)
            )(variables, img_cur, img_ref, depth_ref, prev, rngs, K, K_inv)

        sharded = jax.shard_map(
            local_batch,
            mesh=self.mesh,
            in_specs=(
                P(),  # variables replicated
                P(self.axis_name),
                P(self.axis_name),
                P(self.axis_name),
                P(self.axis_name),
                P(self.axis_name),
                P(self.axis_name),  # per-sequence intrinsics
                P(self.axis_name),
            ),
            out_specs=(P(self.axis_name), P(self.axis_name), P(self.axis_name)),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        _VO_STEP_CACHE[key] = fn
        return fn

    # ------------------------------------------------------------------
    def make_chunk_step(self):
        """Sharded CHUNKED VO step (``tpu.execution: scan`` across a mesh).

        Each device runs the fused scan-mode chunk program
        (pipeline/scan_runner.py:make_chunk_step) on its own sequences: T
        frames per dispatch instead of one, so the multi-sequence CLI gets
        the same dispatch amortization as the single-sequence scan path.

        Returns a jitted fn(variables, imgs_u8 [S x T x H x W x 3],
        carry (img_ref_u8 [S], depth_ref [S], prev_motion [S x 4 x 4],
        prev_scale [S]), rngs [S x T x 2], K [S x 3 x 3], K_inv [S]) ->
        (poses [S x T x 4 x 4], modes [S x T], new carry), everything but
        the replicated variables sharded over ``seq``.
        """
        key = (
            self.frontend.static_key(),
            self.tcfg,
            self.mesh,
            self.axis_name,
            "chunk",
        )
        cached = _VO_STEP_CACHE.get(key)
        if cached is not None:
            return cached
        from ..pipeline.scan_runner import make_chunk_step as _build

        chunk_fn, _ = _build(self.frontend, self.tcfg)

        def local_chunk(variables, imgs, carry, rngs, K, K_inv):
            if imgs.shape[0] == 1:
                # one sequence per device (the common deployment): run the
                # chunk program directly so the deferred-PnP lax.cond stays
                # a real branch (an outer vmap would lower it to a select
                # that executes the fallback for every chunk)
                poses, modes, nc = chunk_fn(
                    variables,
                    imgs[0],
                    jax.tree.map(lambda c: c[0], carry),
                    rngs[0],
                    K[0],
                    K_inv[0],
                )
                return (
                    poses[None],
                    modes[None],
                    jax.tree.map(lambda c: c[None], nc),
                )
            return jax.vmap(
                lambda im, ca, rg, k, ki: chunk_fn(
                    variables, im, ca, rg, k, ki
                )
            )(imgs, carry, rngs, K, K_inv)

        axis = self.axis_name
        sharded = jax.shard_map(
            local_chunk,
            mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False,
        )
        fn = jax.jit(sharded)
        _VO_STEP_CACHE[key] = fn
        return fn

    # ------------------------------------------------------------------
    def make_train_step(self):
        """Sharded distributed finetuning step (data-parallel over ``seq``).

        Returns a jitted fn(variables, opt_state, img_ref [S x H x W x 3]
        float, img_cur [S], poses [S x 4 x 4]) -> (variables, opt_state,
        loss). Gradients are pmean-reduced over the mesh axis; parameters
        and optimizer state stay replicated.
        """
        finetuner = self.finetuner
        axis = self.axis_name

        def local_train(variables, opt_state, img_ref, img_cur, poses):
            trainable = finetuner._trainable(variables)
            loss, grads = jax.value_and_grad(finetuner.loss_fn)(
                trainable, variables, img_ref, img_cur, poses
            )
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            updates, opt_state = finetuner.optimizer.update(
                grads, opt_state, trainable
            )
            trainable = optax.apply_updates(trainable, updates)
            variables = finetuner._merge(variables, trainable)
            return variables, opt_state, loss

        sharded = jax.shard_map(
            local_train,
            mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)
