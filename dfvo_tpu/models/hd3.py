"""HD3 flow/stereo network in Flax (NHWC).

Rebuild of the reference HD3 stack (libs/deep_models/flow/hd3/models/:
hd3net.py:73-198, dla.py, dla_up.py, vgg.py, decoder.py): a DLA-34 (or VGG)
feature pyramid, per-level 81-channel cost volumes (our shared correlation
op with D=4), and discrete motion-distribution decoding
(models/hd3_ops.py). Supports task='flow' (2-D motion) and task='stereo'
(1-D disparity, used by the reference's stereo.enable mode).

Module names mirror the torch attribute tree exactly (Sequential indices
become `_i` suffixes) so the generic torch→flax converter in convert.py is
mechanical.
"""

from typing import Sequence

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp

from ..ops.correlation import correlation
from .hd3_ops import density2vector, disp2flow, flow_warp, resize_dense_vector
from .layers import FrozenBatchNorm, resize_bilinear


def _conv(features, kernel, stride=1, dilation=1, bias=False, name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        name=name,
    )


class Deconv(nn.Module):
    """Transposed convolution as an input-dilated correlation (optionally
    depthwise); torch ConvTranspose2d weights are flipped by the converter."""

    features: int
    kernel: int
    stride: int
    padding: int
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param(
            "kernel",
            nn.initializers.normal(0.02),
            (self.kernel, self.kernel, cin // self.groups, self.features),
        )
        pad = self.kernel - 1 - self.padding
        return lax.conv_general_dilated(
            x,
            k,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )


# ---------------------------------------------------------------------------
# DLA-34 (ref dla.py)
# ---------------------------------------------------------------------------


class DLABasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        out = _conv(
            self.planes, 3, self.stride, self.dilation, name="conv1"
        )(x)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(out))
        out = _conv(self.planes, 3, 1, self.dilation, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    features: int
    kernel: int = 1
    residual: bool = False

    @nn.compact
    def __call__(self, *xs):
        cat = jnp.concatenate(xs, axis=-1)
        out = _conv(self.features, self.kernel, name="conv")(cat)
        out = FrozenBatchNorm(self.features, name="bn")(out)
        if self.residual:
            out = out + xs[0]
        return nn.relu(out)


class Tree(nn.Module):
    """Deep-layer-aggregation tree (ref dla.py:181-257)."""

    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_kernel_size: int = 1
    dilation: int = 1
    root_residual: bool = False

    @nn.compact
    def __call__(self, x, residual=None, children=None):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else children
        bottom = (
            nn.max_pool(
                x,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
            )
            if self.stride > 1
            else x
        )
        if self.in_channels != self.out_channels:
            proj = _conv(self.out_channels, 1, name="project_0")(bottom)
            residual = FrozenBatchNorm(self.out_channels, name="project_1")(
                proj
            )
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = DLABasicBlock(
                self.out_channels, self.stride, self.dilation, name="tree1"
            )(x, residual)
            x2 = DLABasicBlock(
                self.out_channels, 1, self.dilation, name="tree2"
            )(x1)
            return Root(
                self.out_channels,
                self.root_kernel_size,
                self.root_residual,
                name="root",
            )(x2, x1, *children)

        x1 = Tree(
            self.levels - 1,
            self.in_channels,
            self.out_channels,
            self.stride,
            root_dim=0,
            root_kernel_size=self.root_kernel_size,
            dilation=self.dilation,
            root_residual=self.root_residual,
            name="tree1",
        )(x, residual)
        children.append(x1)
        return Tree(
            self.levels - 1,
            self.out_channels,
            self.out_channels,
            root_dim=root_dim + self.out_channels,
            root_kernel_size=self.root_kernel_size,
            dilation=self.dilation,
            root_residual=self.root_residual,
            name="tree2",
        )(x1, children=children)


class DLA(nn.Module):
    """DLA-34 trunk returning all 7 level outputs (ref dla.py:260-353)."""

    levels: Sequence[int]
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        ch = self.channels
        x = _conv(ch[0], 7, name="base_layer_0")(x)
        x = nn.relu(FrozenBatchNorm(ch[0], name="base_layer_1")(x))

        outs = []
        # level0/level1: plain conv stages (Sequential of conv+bn+relu)
        def conv_level(x, planes, convs, stride, prefix):
            for i in range(convs):
                x = _conv(
                    planes, 3, stride if i == 0 else 1,
                    name=f"{prefix}_{3 * i}",
                )(x)
                x = nn.relu(
                    FrozenBatchNorm(planes, name=f"{prefix}_{3 * i + 1}")(x)
                )
            return x

        x = conv_level(x, ch[0], self.levels[0], 1, "level0")
        outs.append(x)
        x = conv_level(x, ch[1], self.levels[1], 2, "level1")
        outs.append(x)
        x = Tree(self.levels[2], ch[1], ch[2], 2, level_root=False, name="level2")(x)
        outs.append(x)
        x = Tree(self.levels[3], ch[2], ch[3], 2, level_root=True, name="level3")(x)
        outs.append(x)
        x = Tree(self.levels[4], ch[3], ch[4], 2, level_root=True, name="level4")(x)
        outs.append(x)
        x = Tree(self.levels[5], ch[4], ch[5], 2, level_root=True, name="level5")(x)
        outs.append(x)
        x = Tree(self.levels[6], ch[5], ch[6], 2, level_root=True, name="level6")(x)
        outs.append(x)
        return outs


class IDAUp(nn.Module):
    """Iterative deep aggregation upsampler (ref dla_up.py:31-93)."""

    node_kernel: int
    out_dim: int
    channels: Sequence[int]
    up_factors: Sequence[int]

    @nn.compact
    def __call__(self, layers):
        assert len(layers) == len(self.channels)
        layers = list(layers)
        for i, c in enumerate(self.channels):
            l = layers[i]
            if c != self.out_dim:
                l = _conv(self.out_dim, 1, name=f"proj_{i}_0")(l)
                l = nn.relu(
                    FrozenBatchNorm(self.out_dim, name=f"proj_{i}_1")(l)
                )
            f = int(self.up_factors[i])
            if f != 1:
                l = Deconv(
                    self.out_dim, f * 2, f, f // 2, groups=self.out_dim,
                    name=f"up_{i}",
                )(l)
            layers[i] = l
        x = layers[0]
        y = []
        for i in range(1, len(layers)):
            cat = jnp.concatenate([x, layers[i]], axis=-1)
            x = _conv(
                self.out_dim, self.node_kernel, name=f"node_{i}_0"
            )(cat)
            x = nn.relu(FrozenBatchNorm(self.out_dim, name=f"node_{i}_1")(x))
            y.append(x)
        return x, y


class DLAUp(nn.Module):
    """Multi-scale aggregation over the DLA pyramid (ref dla_up.py:96-124)."""

    channels: Sequence[int]

    @nn.compact
    def __call__(self, layers):
        import numpy as np

        layers = list(layers)
        channels = list(self.channels)
        scales = np.array([2**i for i in range(len(channels))], int)
        in_channels = list(channels)

        idas = []
        for i in range(len(channels) - 1):
            j = -i - 2
            idas.append(
                (
                    IDAUp(
                        3,
                        channels[j],
                        tuple(in_channels[j:]),
                        tuple(scales[j:] // scales[j]),
                        name=f"ida_{i}",
                    ),
                    j,
                )
            )
            scales[j + 1 :] = scales[j]
            in_channels[j + 1 :] = [channels[j] for _ in channels[j + 1 :]]

        ms_feat = [layers[-1]]
        for i, (ida, j) in enumerate(idas):
            x, y = ida(layers[-i - 2 :])
            layers[-i - 1 :] = y
            ms_feat.append(x)
        return ms_feat


class DLAUpEncoder(nn.Module):
    """DLA-34 + DLAUp pyramid encoder (ref dla_up.py:127-141); returns
    fine→coarse aggregated features over channels[1:]."""

    planes: Sequence[int] = (16, 32, 64, 128, 256, 512, 512)

    @nn.compact
    def __call__(self, x):
        feats = DLA((1, 1, 1, 2, 2, 1, 1), tuple(self.planes), name="base")(x)
        ms = DLAUp(tuple(self.planes[1:]), name="dla_up")(feats[1:])
        return ms[::-1]


class VGGEncoder(nn.Module):
    """Plain strided-conv pyramid (ref vgg.py:6-90)."""

    planes: Sequence[int] = (16, 32, 64, 96, 128, 196)

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, p in enumerate(self.planes):
            x = _conv(p, 3, 2, name=f"block_{i}_conv1")(x)
            x = nn.relu(FrozenBatchNorm(p, name=f"block_{i}_bn1")(x))
            x = _conv(p, 3, 1, name=f"block_{i}_conv2")(x)
            x = nn.relu(FrozenBatchNorm(p, name=f"block_{i}_bn2")(x))
            x = _conv(p, 3, 1, name=f"block_{i}_conv3")(x)
            x = nn.relu(FrozenBatchNorm(p, name=f"block_{i}_bn3")(x))
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# decoders (ref decoder.py)
# ---------------------------------------------------------------------------


class PreActBlock(nn.Module):
    planes: int
    normalize: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        out = x
        if self.normalize:
            out = nn.relu(FrozenBatchNorm(cin, name="bn1")(out))
        if cin != self.planes:
            shortcut = _conv(self.planes, 1, name="shortcut_0")(out)
        else:
            shortcut = x
        out = _conv(self.planes, 3, name="conv1")(out)
        out = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(out))
        out = _conv(self.planes, 3, name="conv2")(out)
        return out + shortcut


class ResnetDecoder(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x):
        x = PreActBlock(self.planes, normalize=False, name="block1")(x)
        return PreActBlock(self.planes, normalize=True, name="block2")(x)


class HDADecoder(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x):
        y1 = PreActBlock(self.planes, normalize=False, name="block1")(x)
        y2 = PreActBlock(self.planes, normalize=True, name="block2")(y1)
        cat = jnp.concatenate([y1, y2], axis=-1)
        out = nn.relu(FrozenBatchNorm(2 * self.planes, name="root_0")(cat))
        return _conv(self.planes, 1, name="root_2")(out)


class HD3Decoder(nn.Module):
    """Per-level decoder head: mapping block + classifier (+ upsampled
    feature for the next level; ref hd3net.py:45-70)."""

    classes: int
    up_classes: int
    block: str  # 'resnet' | 'hda'

    @nn.compact
    def __call__(self, x):
        block_cls = ResnetDecoder if self.block == "resnet" else HDADecoder
        out = block_cls(128, name="mapping")(x)
        prob = nn.relu(FrozenBatchNorm(128, name="cls_0")(out))
        prob = nn.Conv(
            self.classes, (1, 1), use_bias=True, name="cls_2"
        )(prob)
        up_feat = None
        if self.up_classes > 0:
            u = nn.relu(FrozenBatchNorm(128, name="up_0")(out))
            u = Deconv(self.up_classes, 4, 2, 1, name="up_2")(u)
            u = nn.relu(FrozenBatchNorm(self.up_classes, name="up_3")(u))
            up_feat = u
        return prob, up_feat


class HD3Context(nn.Module):
    """Dilated context head (ref hd3net.py:13-42)."""

    classes: int

    @nn.compact
    def __call__(self, x):
        dilations = [1, 1, 2, 4, 8, 16, 1]
        for i, d in enumerate(dilations):
            x = _conv(128, 3, dilation=d, name=f"dc_conv_{i}_0")(x)
            x = nn.relu(FrozenBatchNorm(128, name=f"dc_conv_{i}_1")(x))
        return nn.Conv(self.classes, (1, 1), use_bias=True, name="cls")(x), None


# ---------------------------------------------------------------------------
# HD3Net
# ---------------------------------------------------------------------------


class HD3Net(nn.Module):
    """Coarse-to-fine discrete-distribution matching (ref hd3net.py:73-198).

    Call with two [N x H x W x 3] images (H, W divisible by 64). Returns
    (ms_prob, ms_vect): per-level probability maps and motion vectors in
    full-resolution units (vect * 2^(ds - l)).
    """

    task: str = "flow"  # 'flow' | 'stereo'
    encoder: str = "dlaup"  # 'dlaup' | 'vgg'
    decoder: str = "hda"  # 'hda' | 'resnet'
    corr_range: Sequence[int] = (4, 4, 4, 4, 4)
    context: bool = False
    ds: int = 6

    @nn.compact
    def __call__(self, img1, img2):
        dim = 1 if self.task == "stereo" else 2
        levels = len(self.corr_range)
        if self.task == "flow":
            classes = [(2 * d + 1) ** 2 for d in self.corr_range]
        else:
            classes = [2 * d + 1 for d in self.corr_range]

        if self.encoder == "vgg":
            pyr_channels = [16, 32, 64, 96, 128, 196]
            feats = VGGEncoder(tuple(pyr_channels), name="encoder")(
                jnp.concatenate([img1, img2], axis=0)
            )
        else:
            pyr_channels = [16, 32, 64, 128, 256, 512, 512]
            feats = DLAUpEncoder(tuple(pyr_channels), name="encoder")(
                jnp.concatenate([img1, img2], axis=0)
            )
        bs = img1.shape[0]
        fp_0 = [f[:bs] for f in feats[::-1]]
        fp_1 = [f[bs:] for f in feats[::-1]]

        feat_d_offset = pyr_channels[::-1]
        feat_d_offset[0] = 0
        up_d_offset = [0] + classes[1:]

        ms_prob, ms_vect = [], []
        up_curr_vect = None
        prev_up_feat = None
        for l in range(levels):
            ref_feat = fp_0[l]
            tar_feat = fp_1[l]
            if l == 0:
                tar_feat_corr = tar_feat
            else:
                vect = up_curr_vect
                if vect.shape[-1] < 2:
                    vect = disp2flow(vect)
                tar_feat_corr = flow_warp(tar_feat, vect)

            cost_vol = correlation(ref_feat, tar_feat_corr, max_disp=4, stride=1)
            if self.task == "stereo":
                c = classes[l] // 2
                cost_vol = cost_vol[..., c * (2 * c + 1) : (c + 1) * (2 * c + 1)]
            cost_vol = FrozenBatchNorm(
                cost_vol.shape[-1], name=f"cost_bn_{l}"
            )(cost_vol)

            if l == 0:
                decoder_input = cost_vol
            else:
                decoder_input = jnp.concatenate(
                    [cost_vol, ref_feat, prev_up_feat, up_curr_vect], axis=-1
                )

            up_classes = classes[l + 1] if l < levels - 1 else -1
            if self.context and l == levels - 1:
                prob_map, up_feat = HD3Context(
                    classes[l], name=f"Decoder_{l}"
                )(decoder_input)
            else:
                prob_map, up_feat = HD3Decoder(
                    classes[l], up_classes, self.decoder, name=f"Decoder_{l}"
                )(decoder_input)

            curr_vect = density2vector(prob_map, dim, True)
            if l > 0:
                curr_vect = curr_vect + up_curr_vect
            if self.task == "stereo":
                curr_vect = jnp.minimum(curr_vect, 0.0)
            ms_prob.append(prob_map)
            ms_vect.append(curr_vect * 2 ** (self.ds - l))
            prev_up_feat = up_feat

            if l < levels - 1:
                h, w = curr_vect.shape[1], curr_vect.shape[2]
                up_curr_vect = 2.0 * resize_bilinear(
                    curr_vect, 2 * h, 2 * w, align_corners=True
                )

        return ms_prob, ms_vect
