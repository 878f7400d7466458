"""Pallas TPU kernel for LiteFlowNet's Regularization flow filtering.

The reference computes (lite_flow_net.py:236-263, torch):

    sx = conv1x1_scale_x(dist * unfold_k(flow_x)) / sum_j(dist_j)
    sy = conv1x1_scale_y(dist * unfold_k(flow_y)) / sum_j(dist_j)

i.e. a k x k local filter of the flow with per-pixel data-dependent
weights ``dist`` (already softmax-normalized confidence) times a learned
per-offset weight. The XLA formulation materializes two [N,H,W,k²]
unfolded-flow tensors (~125 MB each at level 2) plus the elementwise
product; this kernel streams k² statically-shifted flow loads against the
resident dist block instead — one read of dist, one of flow, no
intermediates (same shifted-slice pattern as the correlation kernel,
pallas_corr.py:39-46).

Backward for online finetuning reuses XLA autodiff of the identical
unfold formulation via custom VJP.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unfold_mul_xla(dist, flow, wx, bx, wy, by, k):
    """Shift-accumulate formulation: sum_j (w_j * dist_j) * flow(p+off_j).

    Mathematically identical to the reference's unfold + 1x1 conv but
    never materializes the [N,H,W,k²] unfolded-flow tensors — the shifted
    reads are views XLA fuses into one elementwise pass."""
    p = (k - 1) // 2
    fp = jnp.pad(flow, ((0, 0), (p, p), (p, p), (0, 0)))
    h, w = flow.shape[1], flow.shape[2]
    wx_v = wx.reshape(k * k)
    wy_v = wy.reshape(k * k)
    accx = jnp.zeros(flow.shape[:3], dist.dtype) + bx.reshape(1)
    accy = jnp.zeros(flow.shape[:3], dist.dtype) + by.reshape(1)
    for j in range(k * k):
        ky, kx = j // k, j % k
        dj = dist[..., j]
        accx = accx + (wx_v[j] * dj) * fp[:, ky : ky + h, kx : kx + w, 0]
        accy = accy + (wy_v[j] * dj) * fp[:, ky : ky + h, kx : kx + w, 1]
    inv = 1.0 / jnp.sum(dist, axis=-1)
    return jnp.stack([accx * inv, accy * inv], axis=-1)


def _regfilter_pallas(dist, flow, wx, bx, wy, by, k, band):
    n, h, w, kk = dist.shape
    p = (k - 1) // 2
    # pad the flow's column extent to a multiple of 8: with only 2 lane
    # channels Mosaic tiles (cols, 2) as the (sublane, lane) pair, and
    # slices need 8-aligned sublane extents
    cols = -(-(w + 2 * p) // 8) * 8
    fp = jnp.pad(flow, ((0, 0), (p, p), (p, cols - w - p), (0, 0)))

    n_bands = -(-h // band)
    hb = n_bands * band
    if hb != h:
        dist = jnp.pad(dist, ((0, 0), (0, hb - h), (0, 0), (0, 0)))
        fp = jnp.pad(fp, ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    # k row-shifted copies: banded blocks then need no halo (overlapping
    # blocks are inexpressible, and every halo workaround — explicit DMA,
    # dynamic sublane offsets, whole-item static unroll — either violates
    # Mosaic slice tiling or compiles pathologically; all measured)
    fsh = jnp.stack(
        [fp[:, dy : dy + hb] for dy in range(k)], axis=1
    )  # [n, k, hb, cols, 2]

    # per-offset weights and biases as one small SMEM-friendly VMEM block
    wvec = jnp.stack(
        [wx.reshape(kk), wy.reshape(kk)], axis=0
    ).astype(jnp.float32)  # [2, k²]
    bvec = jnp.stack([bx.reshape(()), by.reshape(())]).reshape(2, 1).astype(
        jnp.float32
    )

    def kernel(dist_ref, fsh_ref, w_ref, b_ref, out_ref):
        accx = jnp.full((band, w), b_ref[0, 0], jnp.float32)
        accy = jnp.full((band, w), b_ref[1, 0], jnp.float32)
        dsum = jnp.zeros((band, w), jnp.float32)
        for j in range(kk):
            dy, dx = j // k, j % k
            dj = dist_ref[0, :, :, j].astype(jnp.float32)
            fx = fsh_ref[0, dy, :, dx : dx + w, 0].astype(jnp.float32)
            fy = fsh_ref[0, dy, :, dx : dx + w, 1].astype(jnp.float32)
            accx = accx + w_ref[0, j] * dj * fx
            accy = accy + w_ref[1, j] * dj * fy
            dsum = dsum + dj
        inv = 1.0 / dsum
        out_ref[0, :, :, 0] = (accx * inv).astype(out_ref.dtype)
        out_ref[0, :, :, 1] = (accy * inv).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(n, n_bands),
        in_specs=[
            pl.BlockSpec(
                (1, band, w, kk),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, band, cols, 2),
                lambda i, j: (i, 0, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, kk), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (2, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, band, w, 2), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hb, w, 2), flow.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * hb * w * kk,
            bytes_accessed=(n * hb * w * (kk + 2 * k) + n * hb * w * 2)
            * dist.dtype.itemsize,
            transcendentals=0,
        ),
    )(dist, fsh, wvec, bvec)
    return out[:, :h] if hb != h else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _regfilter(dist, flow, wx, bx, wy, by, k):
    # NOTE: _regfilter_pallas is numerically correct in its banded
    # shifted-copy form but the remote Mosaic compiler takes >30 min on
    # it (r2; two attempts timed out — the lane-extent-2 flow blocks
    # force heavy relayouts). The shift-accumulate XLA formulation
    # below fuses well and already avoids the unfold materialization,
    # so the kernel stays disabled until a faster-compiling variant
    # exists.
    return _unfold_mul_xla(dist, flow, wx, bx, wy, by, k)


def _rf_fwd(dist, flow, wx, bx, wy, by, k):
    return _regfilter(dist, flow, wx, bx, wy, by, k), (
        dist, flow, wx, bx, wy, by,
    )


def _rf_bwd(k, res, g):
    dist, flow, wx, bx, wy, by = res
    _, vjp = jax.vjp(
        lambda d, f, a, b, c, e: _unfold_mul_xla(d, f, a, b, c, e, k),
        dist, flow, wx, bx, wy, by,
    )
    return vjp(g)


_regfilter.defvjp(_rf_fwd, _rf_bwd)


def reg_scale_filter(dist, flow, wx, bx, wy, by, k):
    """Confidence-weighted k x k flow filtering (ref lite_flow_net.py
    Regularization ``moduleScaleX/Y`` + unfold, :236-263).

    Args:
        dist: [N,H,W,k²] softmax-normalized confidence (ky-major offsets).
        flow: [N,H,W,2] flow to filter.
        wx/bx, wy/by: scale_x / scale_y 1x1-conv kernel ([1,1,k²,1]) and
            bias ([1]) parameters.
        k: filter size (static).

    Returns:
        [N,H,W,2] filtered flow.
    """
    return _regfilter(dist, flow, wx, bx, wy, by, k)
