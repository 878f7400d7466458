"""Deep-model frontend: depth + flow (+ pose) inference as one fused jit.

Rebuild of the reference facade (libs/deep_models/deep_models.py:25-229)
without its four host↔device round trips per frame (SURVEY.md §1): images go
in once, geometry-ready arrays come out, and the tracking step consumes them
without leaving the device.
"""

import os

import numpy as np

import math

import jax
import jax.numpy as jnp

from ..models import LiteFlowNet, Monodepth2Depth, Monodepth2Pose
from ..models.hd3 import HD3Net
from ..models.layers import resize_bilinear
from ..ops.warp import flow_to_coords, grid_sample


def flow_target_size(h, w, divisor):
    """Closest (th, tw) divisible by ``divisor`` with best aspect-ratio
    match (ref deep_flow.py:89-105 for /32, hd3_flow.py:108-113 for /64)."""
    hs = [divisor * (h // divisor), divisor * (h // divisor + 1)]
    ws = [divisor * (w // divisor), divisor * (w // divisor + 1)]
    best = None
    for th in hs:
        for tw in ws:
            if th == 0 or tw == 0:
                continue
            ratio = abs(th / tw - h / w)
            if best is None or ratio < best[0]:
                best = (ratio, th, tw)
    return best[1], best[2]


def forward_backward_consistency(flow_fwd, flow_bwd):
    """Flow inconsistency map |flow_fwd - warp(-flow_bwd)| per pixel
    (ref deep_flow.py:171-196).

    Args:
        flow_fwd: [N x H x W x 2] forward flow (view1 -> view2).
        flow_bwd: [N x H x W x 2] backward flow.

    Returns:
        [N x H x W] inconsistency norm.
    """
    coords = flow_to_coords(flow_fwd)
    warped = grid_sample(-flow_bwd, coords, padding_mode="zeros")
    return jnp.linalg.norm(flow_fwd - warped, axis=-1)


def resize_dense_flow(flow, out_h, out_w):
    """Bilinear flow resize with magnitude rescaling
    (ref deep_flow.py:107-129, align_corners=True)."""
    n, h, w, _ = flow.shape
    resized = resize_bilinear(flow, out_h, out_w, align_corners=True)
    scale = jnp.array([out_w / w, out_h / h], flow.dtype)
    return resized * scale


class DeepFrontend:
    """Owns the Flax networks and the fused inference function."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.h = cfg.image.height
        self.w = cfg.image.width
        # network compute dtype (geometry always runs float32; network
        # outputs are cast back at the boundary)
        tpu_cfg = cfg.get("tpu", {})
        self.dtype = (
            jnp.bfloat16
            if str(tpu_cfg.get("dtype", "float32")) == "bfloat16"
            else jnp.float32
        )
        dataset = cfg.dataset
        if "kitti" in dataset or "robotcar" in dataset:
            depth_kw = dict(min_depth=0.1, max_depth=100.0, baseline_multiplier=5.4)
        elif "tum" in dataset:
            depth_kw = dict(min_depth=0.1, max_depth=10.0, baseline_multiplier=1.0)
        else:
            depth_kw = dict(min_depth=0.1, max_depth=100.0, baseline_multiplier=5.4)
        self.depth_kw = depth_kw
        self.depth_net = Monodepth2Depth(**depth_kw)
        self.flow_kind = cfg.deep_flow.network
        if self.flow_kind == "liteflow":
            self.flow_net = LiteFlowNet()
            self.flow_feed = flow_target_size(self.h, self.w, 32)
        elif self.flow_kind == "hd3":
            self.flow_net = HD3Net(task="flow", encoder="dlaup", decoder="hda",
                                   corr_range=(4, 4, 4, 4, 4), context=False)
            self.flow_feed = flow_target_size(self.h, self.w, 64)
        else:
            raise ValueError(f"unknown flow network: {self.flow_kind}")
        self.use_pose_net = bool(cfg.deep_pose.enable)
        if self.use_pose_net:
            self.pose_net = Monodepth2Pose(
                baseline_multiplier=depth_kw["baseline_multiplier"]
            )

    def static_key(self):
        """Hashable key capturing everything that shapes this frontend's
        traced programs: two frontends with equal keys produce identical
        jaxprs for ``infer``/``infer_chunk``, so jitted step functions
        built around one can serve the other. Used to share traces (and
        hence compiles) across pipeline instances — on the single-core CI
        host, re-tracing the fused step per DFVO instance was the
        dominant suite cost."""
        return (
            self.h,
            self.w,
            jnp.dtype(self.dtype).name,
            tuple(sorted(self.depth_kw.items())),
            self.flow_kind,
            self.flow_feed,
            self.use_pose_net,
        )

    # -- parameters ---------------------------------------------------------
    def init_variables(self, rng):
        """Random-init all network variables (shapes from config)."""
        dummy = jnp.zeros((1, self.h, self.w, 3), jnp.float32)
        th, tw = self.flow_feed
        dummy_f = jnp.zeros((1, th, tw, 3), jnp.float32)
        k1, k2, k3 = jax.random.split(rng, 3)
        variables = {
            "depth": self.depth_net.init(k1, dummy),
            "flow": self.flow_net.init(k2, dummy_f, dummy_f),
        }
        if self.use_pose_net:
            dummy6 = jnp.zeros((1, self.h, self.w, 6), jnp.float32)
            variables["pose"] = self.pose_net.init(k3, dummy6)
        return variables

    def load_variables(self, rng):
        """Load converted torch-zoo weights when configured paths exist;
        otherwise random-init (weights are not shipped in this environment)."""
        variables = self.init_variables(rng)
        from ..models import convert as C

        depth_dir = str(self.cfg.depth.deep_depth.pretrained_model or "")
        enc = os.path.join(depth_dir, "encoder.pth")
        dec = os.path.join(depth_dir, "depth.pth")
        if os.path.isfile(enc) and os.path.isfile(dec):
            variables["depth"] = jax.tree.map(
                jnp.asarray,
                C.convert_monodepth2_depth(
                    C.load_torch_state_dict(enc), C.load_torch_state_dict(dec)
                ),
            )
            print(f"==> Initialize Depth-CNN with [{depth_dir}]")
        flow_path = str(self.cfg.deep_flow.flow_net_weight or "")
        if os.path.isfile(flow_path):
            if self.flow_kind == "liteflow":
                variables["flow"] = jax.tree.map(
                    jnp.asarray,
                    C.convert_liteflownet(C.load_torch_state_dict(flow_path)),
                )
            else:
                import torch

                ckpt = torch.load(flow_path, map_location="cpu",
                                  weights_only=False)
                sd = ckpt.get("state_dict", ckpt)
                sd = {
                    (k[len("module."):] if k.startswith("module.") else k): v
                    for k, v in sd.items()
                }
                sd = {k: C._np(v) for k, v in sd.items() if hasattr(v, "shape")}
                variables["flow"] = jax.tree.map(
                    jnp.asarray, C.convert_hd3(sd)
                )
            print(
                f"==> Initialize {self.flow_kind} flow net with [{flow_path}]"
            )
        if self.use_pose_net:
            pose_dir = str(self.cfg.deep_pose.pretrained_model or "")
            penc = os.path.join(pose_dir, "pose_encoder.pth")
            pdec = os.path.join(pose_dir, "pose.pth")
            if os.path.isfile(penc) and os.path.isfile(pdec):
                variables["pose"] = jax.tree.map(
                    jnp.asarray,
                    C.convert_monodepth2_pose(
                        C.load_torch_state_dict(penc),
                        C.load_torch_state_dict(pdec),
                    ),
                )
                print(f"==> Initialize Pose-CNN with [{pose_dir}]")
        return variables

    def prepare_variables(self, variables):
        """Cast network variables to the inference dtype (call once after
        loading/finetuning; avoids re-converting ~25M weights per frame)."""
        if self.dtype == jnp.float32:
            return variables

        def cast(x):
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(self.dtype)
            return x

        return jax.tree.map(cast, variables)

    # -- batched chunk inference ---------------------------------------------
    def infer_chunk(self, variables, all_imgs):
        """Network inference for a whole frame chunk in ONE batch.

        The per-frame step launches ~150 small convolutions whose dispatch
        latency dominates at VO resolutions; batching T frames per launch
        amortizes it T-fold. Features are additionally shared across the
        forward/backward pair structure (LiteFlowNet ``consecutive`` mode).

        Args:
            variables: network variables.
            all_imgs: [M x H x W x 3] float images in [0, 1] — M-1
                consecutive pairs (i -> i+1).

        Returns:
            dict with ``depths`` [M-1 x H x W] (raw metric depth of frames
            1..M-1), ``flow_fwd`` [M-1 x H x W x 2], ``flow_diff``
            [M-1 x H x W].
        """
        m = all_imgs.shape[0]
        imgs_net = all_imgs.astype(self.dtype)

        depths = self.depth_net.apply(variables["depth"], imgs_net[1:])[
            "depth"
        ].astype(jnp.float32)

        th, tw = self.flow_feed
        if (th, tw) != (self.h, self.w):
            feed = resize_bilinear(imgs_net, th, tw, align_corners=True)
        else:
            feed = imgs_net
        if self.flow_kind == "liteflow":
            flows = self.flow_net.apply(
                variables["flow"], feed, feed, pair_mode="consecutive"
            )
            flow_feed_res = flows[1]
        else:
            img1 = jnp.concatenate([feed[:-1], feed[1:]], axis=0)
            img2 = jnp.concatenate([feed[1:], feed[:-1]], axis=0)
            _, ms_vect = self.flow_net.apply(variables["flow"], img1, img2)
            flow_feed_res = ms_vect[-1] * (1.0 / 2 ** (7 - 5))
        flow_feed_res = flow_feed_res.astype(jnp.float32)

        f_fwd_n = flow_feed_res[: m - 1]
        f_bwd_n = flow_feed_res[m - 1 :]
        flow_fwd = resize_dense_flow(f_fwd_n, self.h, self.w)

        hn, wn = f_fwd_n.shape[1], f_fwd_n.shape[2]
        warp = grid_sample(
            -f_bwd_n, flow_to_coords(f_fwd_n), padding_mode="zeros"
        )
        unit_scale = jnp.array([self.w / wn, self.h / hn], jnp.float32)
        diff_n = jnp.linalg.norm(
            (f_fwd_n - warp) * unit_scale, axis=-1, keepdims=True
        )
        flow_diff = resize_bilinear(
            diff_n, self.h, self.w, align_corners=True
        )[..., 0]

        return {
            "depths": depths,
            "flow_fwd": flow_fwd,
            "flow_diff": flow_diff,
        }

    # -- fused inference ----------------------------------------------------
    def infer(self, variables, img_cur, img_ref, depth_cur=None):
        """Depth of the current view + bidirectional flow ref<->cur.

        Args:
            variables: network variables pytree.
            img_cur, img_ref: [H x W x 3] float images in [0, 1].
            depth_cur: optional [H x W] externally-supplied raw depth (the
                ``depth_src: gt`` path, ref dfvo.py:304-319) — when given,
                the depth CNN is skipped entirely.

        Returns:
            dict with ``depth_cur`` [H x W] (raw metric depth),
            ``flow_fwd`` [H x W x 2] (ref -> cur, full-res pixels),
            ``flow_bwd`` [H x W x 2], ``flow_diff`` [H x W].
        """
        img_cur = img_cur[None].astype(self.dtype)
        img_ref = img_ref[None].astype(self.dtype)

        if depth_cur is None:
            depth_out = self.depth_net.apply(variables["depth"], img_cur)
            depth_cur = depth_out["depth"][0].astype(jnp.float32)
        else:
            depth_cur = depth_cur.astype(jnp.float32)

        # batched forward+backward like the reference (lite_flow.py:108-113)
        img1 = jnp.concatenate([img_ref, img_cur], axis=0)
        img2 = jnp.concatenate([img_cur, img_ref], axis=0)
        th, tw = self.flow_feed
        if (th, tw) != (self.h, self.w):
            img1f = resize_bilinear(img1, th, tw, align_corners=True)
            img2f = resize_bilinear(img2, th, tw, align_corners=True)
        else:
            img1f, img2f = img1, img2
        if self.flow_kind == "liteflow":
            # img2f is img1f with the batch flipped: share the feature pass
            flows = self.flow_net.apply(
                variables["flow"], img1f, img2f, pair_mode="shared"
            )
            flow_feed_res = flows[1]
        else:
            # HD3: final-level vector x 1/2^(7-levels) (hd3_flow.py:139-141)
            _, ms_vect = self.flow_net.apply(variables["flow"], img1f, img2f)
            flow_feed_res = ms_vect[-1] * (1.0 / 2 ** (7 - 5))
        # geometry runs float32 from here on
        flow_feed_res = flow_feed_res.astype(jnp.float32)
        flow_full = resize_dense_flow(flow_feed_res, self.h, self.w)
        flow_fwd = flow_full[0:1]
        flow_bwd = flow_full[1:2]

        # forward-backward consistency at the flow's NATIVE resolution, then
        # bilinear-upsample the 1-channel map: the flow field has no
        # information between native samples, and the full-resolution
        # data-dependent warp was the single most expensive op in the
        # pipeline (gathers; ~12 ms at 192x640 on v5e)
        hn, wn = flow_feed_res.shape[1], flow_feed_res.shape[2]
        f_fwd_n = flow_feed_res[0:1]
        f_bwd_n = flow_feed_res[1:2]
        warp = grid_sample(
            -f_bwd_n, flow_to_coords(f_fwd_n), padding_mode="zeros"
        )
        unit_scale = jnp.array(
            [self.w / wn, self.h / hn], jnp.float32
        )  # native -> full-res pixel units
        diff_n = jnp.linalg.norm(
            (f_fwd_n - warp) * unit_scale, axis=-1, keepdims=True
        )
        flow_diff = resize_bilinear(
            diff_n, self.h, self.w, align_corners=True
        )[..., 0]

        out = {
            "depth_cur": depth_cur,
            "flow_fwd": flow_fwd[0],
            "flow_bwd": flow_bwd[0],
            "flow_diff": flow_diff[0],
        }
        if self.use_pose_net:
            pair = jnp.concatenate([img_ref, img_cur], axis=-1)
            out["deep_pose"] = self.pose_net.apply(variables["pose"], pair)[
                0
            ].astype(jnp.float32)
        return out
