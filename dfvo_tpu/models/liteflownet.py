"""LiteFlowNet in Flax (NHWC) with the Pallas/XLA cost-volume op.

Rebuild of the reference architecture
(libs/deep_models/flow/lite_flow_net/lite_flow_net.py:31-325): a 6-level
feature pyramid processed coarse-to-fine (levels 6→2), each level running
Matching (cost volume → flow delta), Subpixel (feature-concat refinement)
and Regularization (feature-driven local flow filtering). Outputs a dict of
flows {1..5} where flows[k] lives at 1/2^(k+1) resolution and is scaled by
20·0.5^k to pixel units of the full-resolution input.

Param naming mirrors the torch module tree (moduleFeatures.moduleOne.0 →
features/one_0) so the weight converter (convert.py) is a mechanical map.
"""

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp

from ..ops.correlation import correlation
from ..ops.warp import warp_image_by_flow
from .layers import resize_bilinear

# per-level constants, indexed by pyramid level 2..6
# (ref lite_flow_net.py:92,128,158,172,196-240)
_FLOW_SCALE = {2: 10.0, 3: 5.0, 4: 2.5, 5: 1.25, 6: 0.625}
_LEVEL_KERNEL = {2: 7, 3: 5, 4: 5, 5: 3, 6: 3}
_DIST_CH = {2: 49, 3: 25, 4: 25, 5: 9, 6: 9}
_FEAT_CH = {1: 32, 2: 32, 3: 64, 4: 96, 5: 128, 6: 192}


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


def _trunk_barrier(x):
    """Optional `optimization_barrier` in front of the per-level conv
    trunks (DFVO_TRUNK_BARRIER=1): forces the concat/cost-volume feeding a
    trunk to materialize instead of fusing into the first conv — an
    experiment lever for the layout-seam slowdown (r4 profile)."""
    import os

    if os.environ.get("DFVO_TRUNK_BARRIER", "0") != "0":
        import jax.lax as lax

        return lax.optimization_barrier(x)
    return x


class _MMConv(nn.Module):
    """3x3 stride-1 SAME conv expressed as 9 shifted-slice matmuls.

    Same parameter names/shapes as nn.Conv (kernel [3,3,Cin,Cout], bias
    [Cout]) so the torch weight converter is untouched. Probe variant
    (DFVO_TRUNK_MM) for the small-Cout trunk convs that XLA's conv emitter
    runs at 3-6% MXU under a batch-in-lanes {0,3,2,1} layout (r5mid
    ledger): einsum lowers to dot_general, which never receives that
    layout assignment. Accumulates the 9 taps in f32 and rounds once —
    numerically equivalent to the conv's single f32 accumulation up to
    reduction order (parity-tested in tests/test_geometry.py).
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
        )
        h, w = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        k = kernel.astype(x.dtype)
        out = None
        for dy in range(3):
            for dx in range(3):
                t = jnp.einsum(
                    "nhwc,cf->nhwf",
                    xp[:, dy : dy + h, dx : dx + w, :],
                    k[dy, dx],
                    preferred_element_type=jnp.float32,
                )
                out = t if out is None else out + t
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            out = out + bias.astype(jnp.float32)
        return out.astype(x.dtype)


def _trunk_mm_threshold():
    import os

    v = os.environ.get("DFVO_TRUNK_MM", "0")
    if v not in ("0", "32", "64"):
        raise ValueError(f"DFVO_TRUNK_MM={v!r} not in 0|32|64")
    return int(v)


def _conv(features, kernel, stride=1, name=None, use_bias=True):
    pad = (kernel - 1) // 2
    if features <= 4 and stride == 1:
        # flow-delta heads (Cout=2) and the 1x1 scale heads: Pallas
        # pixel-packed kernel (see models/layers.py:HeadConv)
        from .layers import HeadConv

        return HeadConv(
            features,
            (kernel, kernel),
            use_bias=use_bias,
            name=name,
        )
    if (
        kernel == 3
        and stride == 1
        and features <= _trunk_mm_threshold()
    ):
        return _MMConv(features, use_bias=use_bias, name=name)
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=use_bias,
        name=name,
    )


class _DepthwiseDeconv2x(nn.Module):
    """Per-channel 4x4 stride-2 transposed conv (groups == channels), used
    for flow/correlation upsampling (ref lite_flow_net.py:109,117).

    Implemented as an input-dilated depthwise correlation; torch weights are
    spatially flipped by the converter. With ``DFVO_DECONV_EW=1`` the same
    op runs as four elementwise 2x2-tap phase maps interleaved by reshape —
    bit-identical, but avoids the depthwise-conv op whose XLA:TPU layout
    choice ({0,3,2,1}, batch-in-lanes) anchors relayout seams into the
    downstream trunk convs (r4 profile, docs/profiles/r4/README.md).
    """

    channels: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.02),
            (4, 4, 1, self.channels),
        )
        import os

        import jax.lax as lax

        if os.environ.get("DFVO_DECONV_EW", "0") != "0":
            return _deconv2x_elementwise(x, kernel)
        padc = os.environ.get("DFVO_DECONV_PAD", "0")
        if padc not in ("0", "8", "16"):
            raise ValueError(f"DFVO_DECONV_PAD={padc!r} not in 0|8|16")
        pc = int(padc)
        if pc > self.channels:
            # Probe variant (r5): pad the depthwise channel count with
            # runtime zero channels so XLA's layout assignment sees a wider
            # deconv and stops anchoring batch-in-lanes {0,3,2,1} into the
            # neighbouring trunk convs (same rationale as DFVO_HEAD_PAD in
            # ops/headconv.py). Barriers block the simplifier from folding
            # the pads away. Bit-identical output.
            xz = lax.optimization_barrier(
                jnp.concatenate(
                    [
                        x,
                        jnp.zeros(
                            x.shape[:3] + (pc - self.channels,), x.dtype
                        ),
                    ],
                    axis=-1,
                )
            )
            kz = jnp.concatenate(
                [
                    kernel,
                    jnp.zeros(
                        kernel.shape[:3] + (pc - self.channels,),
                        kernel.dtype,
                    ),
                ],
                axis=-1,
            )
            y = lax.conv_general_dilated(
                xz,
                kz,
                window_strides=(1, 1),
                padding=((2, 2), (2, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=pc,
            )
            return lax.optimization_barrier(y)[..., : self.channels]
        return lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.channels,
        )


def _deconv2x_elementwise(x, kernel):
    """4x4 stride-2 depthwise transposed conv as shifted elementwise taps.

    Derivation (1-D, per axis): out[2i] = w[0]·x[i-1] + w[2]·x[i] and
    out[2i+1] = w[1]·x[i] + w[3]·x[i+1]; the 2-D op is the outer product of
    the two phase rules, so each of the four output phases is a 2x2-tap
    combination of shifted copies of x. XLA fuses the whole thing into one
    elementwise pass plus the interleaving reshape — no depthwise conv op,
    hence no batch-in-lanes layout anchor.
    """
    n, h, w, c = x.shape
    wk = kernel[:, :, 0, :].astype(x.dtype)  # [4, 4, C]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def s(a, b):  # x[i-1+a, j-1+b]
        return xp[:, a : a + h, b : b + w, :]

    p00 = wk[0, 0] * s(0, 0) + wk[0, 2] * s(0, 1) + wk[2, 0] * s(1, 0) + wk[2, 2] * s(1, 1)
    p01 = wk[0, 1] * s(0, 1) + wk[0, 3] * s(0, 2) + wk[2, 1] * s(1, 1) + wk[2, 3] * s(1, 2)
    p10 = wk[1, 0] * s(1, 0) + wk[1, 2] * s(1, 1) + wk[3, 0] * s(2, 0) + wk[3, 2] * s(2, 1)
    p11 = wk[1, 1] * s(1, 1) + wk[1, 3] * s(1, 2) + wk[3, 1] * s(2, 1) + wk[3, 3] * s(2, 2)
    row0 = jnp.stack([p00, p01], axis=3)  # [n, h, w, 2(px), c]
    row1 = jnp.stack([p10, p11], axis=3)
    out = jnp.stack([row0, row1], axis=2)  # [n, h, 2(py), w, 2(px), c]
    return out.reshape(n, 2 * h, 2 * w, c)


def _pair_refs(f):
    """M consecutive frames -> the 2(M-1) reference-side batch (forward
    pairs i->i+1 then backward pairs i+1->i): refs are frames [0..M-2] then
    [1..M-1]."""
    return jnp.concatenate([f[:-1], f[1:]], axis=0)


def _pair_targets(f):
    """Target-side batch of the forward+backward pairing: frames [1..M-1]
    then [0..M-2]."""
    return jnp.concatenate([f[1:], f[:-1]], axis=0)


class _Matching(nn.Module):
    level: int
    use_pallas: Any = None

    @nn.compact
    def __call__(self, feat1, feat2, flow, ids2=None):
        """``ids2`` enables the unique-frame form (consecutive pair mode):
        ``feat2`` holds the M unique frames and every warp gathers from a
        patch table built ONCE over them (ids2 maps the 2(M-1) output rows
        to source frames); at level 2 ``feat1`` is also the unique array and
        feat_conv runs on M frames instead of 2 x 2(M-1)."""
        lvl = self.level
        if lvl == 2:
            feat_conv = _conv(64, 1, name="feat_conv")  # shared for both views
            if ids2 is not None:
                u = _leaky(feat_conv(feat1))
                feat1 = _pair_refs(u)
                feat2 = u
            else:
                feat1 = _leaky(feat_conv(feat1))
                feat2 = _leaky(feat_conv(feat2))
        if flow is not None:
            flow = _DepthwiseDeconv2x(2, name="upflow")(flow)
        if lvl >= 4:
            if flow is not None:
                feat2 = warp_image_by_flow(
                    feat2, flow * _FLOW_SCALE[lvl], frame_ids=ids2
                )
            elif ids2 is not None:
                feat2 = _pair_targets(feat2)  # level 6: unwarped correlation
            corr = _leaky(
                correlation(feat1, feat2, 3, 1, use_pallas=self.use_pallas)
            )
        else:
            # stride-2 correlation only ever reads the phase-(0,0)
            # subsample of the warped map (corr(f1,f2,D,2) ==
            # corr(f1[::2],f2[::2],D,1), see pallas_corr.py), so warp only
            # those sites: 4x fewer gather rows at the two biggest levels —
            # bit-identical to warp-then-subsample (pointwise op)
            from ..ops.warp import flow_to_coords, grid_sample

            coords = flow_to_coords(flow * _FLOW_SCALE[lvl])[:, ::2, ::2]
            feat2_sub = grid_sample(feat2, coords, frame_ids=ids2)
            corr = _leaky(
                correlation(
                    feat1[:, ::2, ::2],
                    feat2_sub,
                    3,
                    1,
                    use_pallas=self.use_pallas,
                )
            )
            corr = _DepthwiseDeconv2x(49, name="upcorr")(corr)
        x = _leaky(_conv(128, 3, name="main_0")(_trunk_barrier(corr)))
        x = _leaky(_conv(64, 3, name="main_1")(x))
        x = _leaky(_conv(32, 3, name="main_2")(x))
        delta = _conv(2, _LEVEL_KERNEL[lvl], name="main_3")(x)
        return delta if flow is None else flow + delta


class _Subpixel(nn.Module):
    level: int

    @nn.compact
    def __call__(self, feat1, feat2, flow, ids2=None):
        lvl = self.level
        if lvl == 2:
            feat_conv = _conv(64, 1, name="feat_conv")  # shared for both views
            if ids2 is not None:
                u = _leaky(feat_conv(feat1))
                feat1 = _pair_refs(u)
                feat2 = u
            else:
                feat1 = _leaky(feat_conv(feat1))
                feat2 = _leaky(feat_conv(feat2))
        feat2 = warp_image_by_flow(
            feat2, flow * _FLOW_SCALE[lvl], frame_ids=ids2
        )
        x = _trunk_barrier(jnp.concatenate([feat1, feat2, flow], axis=-1))
        x = _leaky(_conv(128, 3, name="main_0")(x))
        x = _leaky(_conv(64, 3, name="main_1")(x))
        x = _leaky(_conv(32, 3, name="main_2")(x))
        delta = _conv(2, _LEVEL_KERNEL[lvl], name="main_3")(x)
        return flow + delta


class _ConvParams(nn.Module):
    """Declares nn.Conv-compatible 'kernel'/'bias' parameters (same names
    and logical shapes, so the torch weight converter is untouched) and
    returns them raw — for ops consuming the weights directly."""

    in_ch: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _Regularization(nn.Module):
    level: int
    use_pallas: Any = None

    @nn.compact
    def __call__(self, img1, img2, feat1, flow, ids2=None):
        lvl = self.level
        k = _LEVEL_KERNEL[lvl]
        dist_ch = _DIST_CH[lvl]

        diff = img1 - warp_image_by_flow(
            img2, flow * _FLOW_SCALE[lvl], frame_ids=ids2
        )
        diff = jnp.sqrt(jnp.sum(diff**2, axis=-1, keepdims=True) + 1e-6)

        if lvl < 5:
            feat1 = _leaky(_conv(128, 1, name="feat_conv")(feat1))
        flow_centered = flow - jnp.mean(flow, axis=(1, 2), keepdims=True)

        x = _trunk_barrier(jnp.concatenate([diff, flow_centered, feat1], axis=-1))
        x = _leaky(_conv(128, 3, name="main_0")(x))
        x = _leaky(_conv(128, 3, name="main_1")(x))
        x = _leaky(_conv(64, 3, name="main_2")(x))
        x = _leaky(_conv(64, 3, name="main_3")(x))
        x = _leaky(_conv(32, 3, name="main_4")(x))
        x = _leaky(_conv(32, 3, name="main_5")(x))

        if lvl >= 5:
            dist = _conv(dist_ch, k, name="dist")(x)
        else:
            # separable kx1 then 1xk (ref lite_flow_net.py:232-235)
            pad = (k - 1) // 2
            dist = nn.Conv(
                dist_ch,
                (k, 1),
                padding=((pad, pad), (0, 0)),
                name="dist_ver",
            )(x)
            dist = nn.Conv(
                dist_ch,
                (1, k),
                padding=((0, 0), (pad, pad)),
                name="dist_hor",
            )(dist)

        dist = -(dist**2)
        dist = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))

        # confidence-weighted local flow filtering as one fused kernel
        # (ops/regfilter.py) — the unfold materialized two [N,H,W,k²]
        # tensors per level in XLA
        from ..ops.regfilter import reg_scale_filter

        wx, bx = _ConvParams(dist_ch, 1, name="scale_x")()
        wy, by = _ConvParams(dist_ch, 1, name="scale_y")()
        return reg_scale_filter(
            dist, flow, wx, bx, wy, by, k, use_pallas=self.use_pallas
        )


class _Features(nn.Module):
    """6-level shared feature pyramid (ref lite_flow_net.py:35-86)."""

    @nn.compact
    def __call__(self, x):
        f1 = _leaky(_conv(32, 7, name="one_0")(x))
        f2 = _leaky(_conv(32, 3, 2, name="two_0")(f1))
        f2 = _leaky(_conv(32, 3, name="two_1")(f2))
        f2 = _leaky(_conv(32, 3, name="two_2")(f2))
        f3 = _leaky(_conv(64, 3, 2, name="thr_0")(f2))
        f3 = _leaky(_conv(64, 3, name="thr_1")(f3))
        f4 = _leaky(_conv(96, 3, 2, name="fou_0")(f3))
        f4 = _leaky(_conv(96, 3, name="fou_1")(f4))
        f5 = _leaky(_conv(128, 3, 2, name="fiv_0")(f4))
        f6 = _leaky(_conv(192, 3, 2, name="six_0")(f5))
        return [f1, f2, f3, f4, f5, f6]


class LiteFlowNet(nn.Module):
    """Full coarse-to-fine flow network.

    Call with two [N x H x W x 3] images (H, W divisible by 32, intensities
    [0, 1]); returns {1: [N x H/4 x W/4 x 2], ..., 5: [N x H/64 x W/64 x 2]}
    flows in full-resolution pixel units (ref lite_flow_net.py:285-325).
    """

    use_pallas: Any = None

    @nn.compact
    def __call__(self, img1, img2, pair_mode="two") -> Dict[int, Any]:
        """Pairing modes (all bit-exact; they only change how the shared
        feature pass is amortized):

        * ``two``: independent img1/img2 batches (reference semantics).
        * ``shared``: img2 == img1 with the batch axis reversed (the
          forward+backward inference pattern, lite_flow.py:108-113);
          features computed once.
        * ``consecutive``: img1 is a stack of M unique frames (img2
          ignored); flows are predicted for all forward pairs
          (frame i -> i+1) followed by all backward pairs (i+1 -> i),
          output batch 2(M-1). Features computed once for M frames instead
          of 4(M-1) — the batch-mode amortization (pipeline/scan_runner.py).
        """
        import os

        unique_tables = os.environ.get("DFVO_UNIQUE_TABLES", "1")
        if unique_tables not in ("0", "1"):
            raise ValueError(
                f"DFVO_UNIQUE_TABLES={unique_tables!r} not in 0|1"
            )
        # Unique-frame warp tables (r5): in consecutive mode the 2(M-1)
        # target-side batch rows are shuffled copies of the M unique
        # frames, so every packed warp table (ops/warp.py) was built — and
        # the level-2 feat_convs run — twice over the same data. Keep the
        # target side as the M unique frames and let each warp gather with
        # a frame-id map instead; bit-identical (same table rows selected),
        # gated by tests/test_liteflownet.py.
        ids2 = None
        if pair_mode == "consecutive" and unique_tables == "1":
            m = img1.shape[0]
            ids2 = jnp.concatenate(
                [jnp.arange(1, m), jnp.arange(0, m - 1)]
            ).astype(jnp.int32)

        features = _Features(name="features")  # shared for both views
        if pair_mode == "consecutive":
            feats_all: List = features(img1)
            feats1 = [jnp.concatenate([f[:-1], f[1:]], axis=0) for f in feats_all]
            if ids2 is None:
                feats2 = [
                    jnp.concatenate([f[1:], f[:-1]], axis=0) for f in feats_all
                ]
            else:
                feats2 = feats_all  # unique frames; warps map via ids2
        else:
            feats1 = features(img1)
            if pair_mode == "shared":
                feats2 = [f[::-1] for f in feats1]
            else:
                feats2 = features(img2)

        # image pyramid at feature resolutions (levels 2..6)
        if pair_mode == "consecutive":
            pyr = {1: img1}
            for lvl in range(2, 7):
                h, w = feats_all[lvl - 1].shape[1], feats_all[lvl - 1].shape[2]
                pyr[lvl] = resize_bilinear(pyr[lvl - 1], h, w)
            imgs1 = {
                l: jnp.concatenate([p[:-1], p[1:]], axis=0)
                for l, p in pyr.items()
            }
            if ids2 is None:
                imgs2 = {
                    l: jnp.concatenate([p[1:], p[:-1]], axis=0)
                    for l, p in pyr.items()
                }
            else:
                imgs2 = pyr
        else:
            imgs1 = {1: img1}
            imgs2 = {1: img2}
            for lvl in range(2, 7):
                h, w = feats1[lvl - 1].shape[1], feats1[lvl - 1].shape[2]
                imgs1[lvl] = resize_bilinear(imgs1[lvl - 1], h, w)
                imgs2[lvl] = (
                    imgs1[lvl][::-1]
                    if pair_mode == "shared"
                    else resize_bilinear(imgs2[lvl - 1], h, w)
                )

        flow = None
        flows = {}
        for lvl in range(6, 1, -1):
            f1, f2 = feats1[lvl - 1], feats2[lvl - 1]
            if lvl == 2 and ids2 is not None:
                # level-2 modules feat_conv the raw features themselves;
                # hand them the unique array so the conv runs on M frames
                mf1 = feats_all[1]
            else:
                mf1 = f1
            flow = _Matching(
                lvl, use_pallas=self.use_pallas, name=f"matching_{lvl}"
            )(mf1, f2, flow, ids2=ids2)
            flow = _Subpixel(lvl, name=f"subpixel_{lvl}")(
                mf1, f2, flow, ids2=ids2
            )
            flow = _Regularization(
                lvl, use_pallas=self.use_pallas,
                name=f"regularization_{lvl}",
            )(imgs1[lvl], imgs2[lvl], f1, flow, ids2=ids2)
            flows[lvl - 1] = flow

        return {i: flows[i] * (20.0 * 0.5**i) for i in flows}
