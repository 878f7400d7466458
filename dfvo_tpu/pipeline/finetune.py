"""Online self-supervised finetuning of the flow/depth networks.

Rebuild of the reference's online adaptation
(libs/deep_models/deep_models.py:232-338 + flow losses deep_flow.py:226-344
+ depth losses depth/deep_depth.py:118-297) as a jitted optax update:

* flow: multi-scale photometric warp loss (0.85 SSIM + 0.15 L1), edge-aware
  smoothness of the mean-normalized flow magnitude (both directions), and
  forward-backward consistency, each scaled by 1/2^s;
* depth: photometric reprojection with the DF-VO pose (translation divided
  by the 5.4 stereo multiplier, deep_models.py:257-260), identity
  auto-masking (min with the unwarped loss), and normalized-disparity
  smoothness;
* one Adam step over the enabled networks' parameters; runs for
  ``num_frames`` frames then stops (deep_models.py:268).

``make_update_fn(axis_name=...)`` emits the same step with gradients
psum-averaged over a mesh axis — the multi-sequence distributed training
step (parallel/multiseq.py).
"""

import functools

import jax
import jax.numpy as jnp
import optax

from ..geometry.ops import reproject
from ..ops.losses import reprojection_loss, smooth_loss
from ..ops.warp import grid_sample, flow_to_coords
from .frontend import forward_backward_consistency, resize_dense_flow


class OnlineFinetuner:
    def __init__(self, frontend, cfg):
        self.frontend = frontend
        self.cfg = cfg
        self.ft_cfg = cfg.online_finetune
        self.lr = self.ft_cfg.lr
        self.num_frames = self.ft_cfg.num_frames
        self.train_flow = bool(self.ft_cfg.flow.enable)
        self.train_depth = bool(self.ft_cfg.depth.enable)
        # depth-loss pose source (ref deep_models.py:257-266): the DF-VO
        # pose rescaled to network units, the pose CNN's raw prediction, or
        # the DF-VO direction carrying the pose CNN's scale
        self.pose_src = self.ft_cfg.depth.get("pose_src") or "DF-VO"
        if self.pose_src not in ("DF-VO", "deep_pose", "DF-VO2"):
            raise ValueError(
                f"online_finetune.depth.pose_src: {self.pose_src!r} not in "
                "['DF-VO', 'deep_pose', 'DF-VO2']"
            )
        if (
            self.train_depth
            and self.pose_src != "DF-VO"
            and not getattr(frontend, "use_pose_net", False)
        ):
            raise ValueError(
                f"pose_src {self.pose_src!r} needs the pose CNN "
                "(deep_pose.enable: True)"
            )
        if self.train_flow and getattr(frontend, "flow_kind", "liteflow") not in (
            "liteflow",
            "hd3",
        ):
            raise ValueError(
                "online flow finetuning supports liteflow and hd3 "
                f"(got {frontend.flow_kind!r})"
            )
        self.optimizer = optax.adam(self.lr)
        self.update = self.make_update_fn()

    # -- loss pieces --------------------------------------------------------
    def flow_loss(self, flow_vars, img_ref, img_cur):
        """Flow finetuning loss over cfg scales (ref deep_flow.py:226-344).

        The generic DeepFlow losses apply to both flow nets: LiteFlowNet
        exposes a real pyramid (flows[s] at scale s), while the reference's
        HD3 "multi-scale" dict maps every configured scale to the SAME
        final-level vector resized to full resolution
        (ref hd3_flow.py:139-146: ``output['vect'] * 1/2**(7-levels)``
        duplicated over ``flow_scales``), so for hd3 only the 1/2^s loss
        weights differ per scale.
        """
        h, w = self.frontend.h, self.frontend.w
        img1 = jnp.concatenate([img_ref, img_cur], axis=0)  # fwd+bwd batch
        img2 = jnp.concatenate([img_cur, img_ref], axis=0)
        th, tw = getattr(self.frontend, "flow_feed", (h, w))
        if (th, tw) != (h, w):
            from ..models.layers import resize_bilinear

            img1 = resize_bilinear(img1, th, tw, align_corners=True)
            img2 = resize_bilinear(img2, th, tw, align_corners=True)
        if getattr(self.frontend, "flow_kind", "liteflow") == "hd3":
            _, ms_vect = self.frontend.flow_net.apply(flow_vars, img1, img2)
            levels = len(ms_vect)
            final = ms_vect[-1].astype(jnp.float32) * (1.0 / 2 ** (7 - levels))
            flows = None
            hd3_full = resize_dense_flow(final, h, w)
        else:
            flows = self.frontend.flow_net.apply(flow_vars, img1, img2)
            hd3_full = None

        w_cons = self.ft_cfg.flow.loss.flow_consistency
        w_smooth = self.ft_cfg.flow.loss.flow_smoothness
        scales = list(self.ft_cfg.flow.scales)

        total = 0.0
        for s in scales:
            flow_full = (
                hd3_full if flows is None else resize_dense_flow(flows[s], h, w)
            )
            f_fwd, f_bwd = flow_full[0:1], flow_full[1:2]

            # photometric: warp cur into ref view by the forward flow
            coords = flow_to_coords(f_fwd)
            warped = grid_sample(img_cur, coords, padding_mode="border")
            loss = jnp.mean(reprojection_loss(warped, img_ref))

            # edge-aware smoothness of normalized flow magnitude (both dirs)
            for f, img in ((f_fwd, img_ref), (f_bwd, img_cur)):
                mag = jnp.linalg.norm(f, axis=-1, keepdims=True)
                norm_flow = mag / (jnp.mean(mag, axis=(1, 2), keepdims=True) + 1e-7)
                loss = loss + w_smooth * smooth_loss(norm_flow, img) / (2**s)

            # forward-backward consistency
            diff = forward_backward_consistency(f_fwd, f_bwd)
            loss = loss + w_cons * jnp.mean(diff) / (2**s)
            total = total + loss
        return total / len(scales)

    def depth_loss(self, depth_vars, img_ref, img_cur, poses_ref2cur):
        """Depth finetuning loss (ref deep_depth.py:155-297): photometric
        reprojection with identity auto-masking + disparity smoothness.
        ``poses_ref2cur`` is batched [B x 4 x 4]."""
        h, w = self.frontend.h, self.frontend.w
        out = self.frontend.depth_net.apply(depth_vars, img_ref)
        K = self._K
        inv_K = self._K_inv

        w_app = self.ft_cfg.depth.loss.apperance_loss
        w_ds = self.ft_cfg.depth.loss.disparity_smoothness
        scales = list(self.ft_cfg.depth.scales)

        total = 0.0
        for s in scales:
            disp = out["disps"][s]
            # upsample disparity to full res, convert to depth
            from ..models.layers import resize_bilinear
            from ..models.monodepth2 import disp_to_depth

            disp_full = resize_bilinear(disp, h, w, align_corners=False)
            _, depth = disp_to_depth(
                disp_full[..., 0],
                self.frontend.depth_net.min_depth,
                self.frontend.depth_net.max_depth,
            )
            coords = reproject(depth, poses_ref2cur, K, inv_K)
            warped = grid_sample(img_cur, coords, padding_mode="border")
            reproj = reprojection_loss(warped, img_ref)
            identity = reprojection_loss(img_cur, img_ref)
            # identity auto-masking (monodepth2): per-pixel min
            photo = jnp.mean(jnp.minimum(reproj, identity))

            mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
            norm_disp = disp / (mean_disp + 1e-7)
            smooth = smooth_loss(norm_disp, resize_bilinear(
                img_ref, disp.shape[1], disp.shape[2], align_corners=False
            ))
            total = total + w_app * photo + w_ds * smooth / (2**s)
        return total / len(scales)

    def loss_fn(self, trainable, variables, img_ref, img_cur, poses):
        """Total finetuning loss for a batch of frame pairs
        ([B x H x W x 3] images, [B x 4 x 4] DF-VO poses)."""
        variables = dict(variables)
        loss = 0.0
        if self.train_flow:
            flow_vars = {**variables["flow"], "params": trainable["flow"]}
            loss = loss + self.flow_loss(flow_vars, img_ref, img_cur)
        if self.train_depth:
            depth_vars = dict(variables["depth"])
            depth_vars["params"] = trainable["depth"]
            poses = self._depth_pose(variables, img_ref, img_cur, poses)
            loss = loss + self.depth_loss(depth_vars, img_ref, img_cur, poses)
        return loss

    def _depth_pose(self, variables, img_ref, img_cur, poses):
        """Pose fed to the depth loss, per ``depth.pose_src``
        (ref deep_models.py:257-266)."""
        if self.pose_src == "DF-VO":
            # DF-VO pose: metric translation back to network scale
            return poses.at[:, :3, 3].divide(
                self.frontend.depth_net.baseline_multiplier
            )
        pair = jnp.concatenate([img_ref, img_cur], axis=-1)
        deep = self.frontend.pose_net.apply(variables["pose"], pair).astype(
            poses.dtype
        )
        if self.pose_src == "deep_pose":
            return deep
        # DF-VO2: DF-VO translation direction x pose-CNN scale
        deep_scale = jnp.linalg.norm(deep[:, :3, 3], axis=-1, keepdims=True)
        t = poses[:, :3, 3]
        t_unit = t / jnp.maximum(
            jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12
        )
        return poses.at[:, :3, 3].set(t_unit * deep_scale)

    # -- update -------------------------------------------------------------
    def make_update_fn(self, axis_name=None):
        """Build the jitted finetuning step. With ``axis_name``, gradients
        are mean-psummed across that mesh axis (distributed finetuning)."""

        loss_fn = self.loss_fn

        def update(variables, opt_state, img_ref, img_cur, pose):
            trainable = self._trainable(variables)
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, variables, img_ref[None], img_cur[None], pose[None]
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                loss = jax.lax.pmean(loss, axis_name)
            updates, opt_state = self.optimizer.update(
                grads, opt_state, trainable
            )
            trainable = optax.apply_updates(trainable, updates)
            variables = self._merge(variables, trainable)
            return variables, opt_state, loss

        if axis_name is None:
            return jax.jit(update)
        return update

    def make_chunk_update_fn(self):
        """Build the jitted CHUNK finetuning step for scan execution
        (pipeline/dfvo.py:_main_scan).

        Runs ONE Adam update per frame pair — the exact reference cadence
        (ref deep_models.py:232-338, one ``adapt()`` per tracked frame) —
        as a ``lax.scan`` over the chunk's pairs, so the whole chunk's
        adaptation is a single device dispatch. The only semantic
        difference from frame execution is staleness: inference for the
        frames of chunk k uses the weights as of the END of chunk k-1
        (frame mode applies each update before the next frame's
        inference), i.e. a gradient delay of at most ``scan_chunk``
        frames; the per-pair losses/updates themselves are computed with
        the incrementally-updated weights exactly like frame mode.

        Signature: ``(variables, opt_state, imgs_u8 [T+1,H,W,3], poses
        [T,4,4], n_active) -> (variables, opt_state, losses [T])`` where
        pair i is (frame i -> frame i+1) and pairs with index >=
        ``n_active`` (chunk padding / past the ``num_frames`` budget) are
        skipped (loss reported as 0).
        """
        loss_fn = self.loss_fn

        def chunk_update(variables, opt_state, imgs_u8, poses, n_active):
            imgs = imgs_u8.astype(jnp.float32) / 255.0
            trainable0 = self._trainable(variables)

            def body(carry, x):
                trainable, opt_state = carry
                i, img_ref, img_cur, pose = x

                def do(operand):
                    tr, st = operand
                    loss, grads = jax.value_and_grad(loss_fn)(
                        tr, variables, img_ref[None], img_cur[None],
                        pose[None],
                    )
                    updates, st = self.optimizer.update(grads, st, tr)
                    return optax.apply_updates(tr, updates), st, loss

                def skip(operand):
                    tr, st = operand
                    return tr, st, jnp.float32(0.0)

                trainable, opt_state, loss = jax.lax.cond(
                    i < n_active, do, skip, (trainable, opt_state)
                )
                return (trainable, opt_state), loss

            n = poses.shape[0]
            (trainable, opt_state), losses = jax.lax.scan(
                body,
                (trainable0, opt_state),
                (jnp.arange(n), imgs[:-1], imgs[1:], poses),
            )
            return self._merge(variables, trainable), opt_state, losses

        return jax.jit(chunk_update)

    def _trainable(self, variables):
        t = {}
        if self.train_flow:
            t["flow"] = variables["flow"]["params"]
        if self.train_depth:
            t["depth"] = variables["depth"]["params"]
        return t

    def _merge(self, variables, trainable):
        variables = dict(variables)
        if self.train_flow:
            variables["flow"] = {
                **variables["flow"],
                "params": trainable["flow"],
            }
        if self.train_depth:
            variables["depth"] = {
                **variables["depth"],
                "params": trainable["depth"],
            }
        return variables

    def init_state(self, variables, K, K_inv):
        self._K = jnp.asarray(K, jnp.float32)
        self._K_inv = jnp.asarray(K_inv, jnp.float32)
        return self.optimizer.init(self._trainable(variables))
