"""Shared Flax layers for the network stack.

Rebuilds of the torch building blocks in the reference
(libs/deep_models/depth/monodepth2/layers.py:106-136 and torchvision basic
blocks) in NHWC layout. All convolutions use explicit torch-equivalent
padding tuples so converted weights reproduce activations exactly.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """Inference-semantics batch norm: y = γ(x-μ)/√(σ²+ε) + β.

    Running statistics live in the ``batch_stats`` collection so optimizers
    never touch them. The reference finetunes with torch's train-mode BN at
    batch size 1 (monodepth2.py:62-64) — frozen statistics are the
    numerically saner choice for online adaptation and keep inference and
    finetuning consistent.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.features,)
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.features,)
        )
        inv = jax.lax.rsqrt(var.value + self.eps) * scale
        return x * inv + (bias - mean.value * inv)


class HeadConv(nn.Module):
    """nn.Conv drop-in for tiny-output-channel "head" convolutions
    (stride 1), backed by the Pallas pixel-packed kernel.

    XLA:TPU's emitters are pathological for Cout <= 2 heads (the
    LiteFlowNet flow-delta heads and Monodepth2 disparity heads): the
    im2col path moves ~3 GB/step of patch data and padding the kernel's
    output channels gets algebraically simplified back (both measured,
    /tmp/bench_headconv.py r2). ops/headconv.py packs output PIXELS into
    the spare MXU lanes instead (~17x device-time on the 7x7x32->2 head).
    Parameter tree is identical to nn.Conv ('kernel'/'bias', logical
    shapes), so the torch weight converter is untouched.

    ``padding`` is 'SAME' (zero pad) or 'PREPADDED' (input already padded
    by (k-1)//2 per side, e.g. reflect-padded Conv3x3 heads).
    """

    features: int
    kernel_size: tuple
    padding: str = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from ..ops.headconv import head_conv

        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return head_conv(
            x, kernel, bias, prepadded=self.padding == "PREPADDED"
        )


class Conv3x3(nn.Module):
    """Reflection-padded 3x3 convolution (ref layers.py:121-136)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        if self.features <= 4:
            return HeadConv(
                self.features, (3, 3), padding="PREPADDED", name="conv"
            )(x)
        return nn.Conv(self.features, (3, 3), padding="VALID", name="conv")(x)


class ConvBlock(nn.Module):
    """Conv3x3 followed by ELU (ref layers.py:106-118)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.elu(Conv3x3(self.features, name="conv")(x))


def upsample2x_nearest(x):
    """Nearest-neighbor 2x spatial upsample for NHWC (ref layers.py:347-350)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(src, dst, align_corners):
    """[dst x src] 1-D bilinear interpolation matrix (NUMPY — cached;
    a cached jnp constant would leak tracers, see matching/kp_selection)."""
    if align_corners and dst > 1:
        pos = np.linspace(0.0, src - 1.0, dst)
    else:
        pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        pos = np.clip(pos, 0.0, src - 1.0)  # border clamp (torch semantics)
    i0 = np.clip(np.floor(pos).astype(int), 0, src - 1)
    i1 = np.minimum(i0 + 1, src - 1)
    w1 = pos - i0
    M = np.zeros((dst, src), np.float32)
    M[np.arange(dst), i0] += 1.0 - w1
    M[np.arange(dst), i1] += w1
    return M


def resize_bilinear(x, out_h, out_w, align_corners=False):
    """Bilinear resize for NHWC tensors.

    ``align_corners=True`` matches torch's F.interpolate(align_corners=True)
    used for flow/image resizing in the reference (deep_flow.py:122-124,
    lite_flow.py:73-75); False matches the torch default used for disparity
    upsampling (monodepth2.py:112-113). No antialiasing on downsampling
    (torch semantics; jax.image.resize would filter and diverge).

    Implemented as two separable matmuls with constant interpolation
    matrices — exact, and runs on the MXU instead of the gather unit
    (gather-based resizing measured ~10x slower on TPU).
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if not align_corners and h == 2 * out_h and w == 2 * out_w:
        # exact-2x half-pixel downsample == 2x2 mean pool (cheaper still)
        return x.reshape(n, out_h, 2, out_w, 2, c).mean(axis=(2, 4))
    dtype = x.dtype
    Mr = jnp.asarray(_interp_matrix(h, out_h, align_corners), dtype)
    Mc = jnp.asarray(_interp_matrix(w, out_w, align_corners), dtype)
    y = jnp.einsum("hH,nHwc->nhwc", Mr, x)
    return jnp.einsum("wW,nhWc->nhwc", Mc, y)
