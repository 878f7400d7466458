"""LiteFlowNet Regularization flow filtering, TPU-layout-aware.

The reference computes (lite_flow_net.py:236-263, torch):

    sx = conv1x1_scale_x(dist * unfold_k(flow_x)) / sum_j(dist_j)
    sy = conv1x1_scale_y(dist * unfold_k(flow_y)) / sum_j(dist_j)

i.e. a k x k local filter of the flow with per-pixel data-dependent
weights ``dist`` (already softmax-normalized confidence) times a learned
per-offset weight.

Layout is everything here. A per-component shift-accumulate over
[N,H,W]-shaped arrays looks fine in source, but the [N,H,W,2] stack at
the end made XLA assign the accumulator fusions a *channel-minor*
[N,H,W,1] layout — 1 of 128 lanes active, 0.54 ms/frame at level 3 alone
(round-3 device trace, %fusion.762/.776). This formulation keeps every
heavy operand tap-major [N,k²,H,W] so W stays the lane dimension end to
end; only the final 2-channel stack relayouts (a few MB, ~µs).

Backward for online finetuning reuses XLA autodiff of the identical
formulation via custom VJP.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unfold_mul_xla(dist, flow, wx, bx, wy, by, k):
    """Tap-major weighted unfold: sum_j (w_j * dist_j) * flow(p+off_j).

    Mathematically identical to the reference's unfold + 1x1 conv. The
    k² statically-shifted flow views and the transposed dist are
    [N,k²,H,W] (W minor = full lane occupancy); the tap reduction runs
    over a non-minor axis, which XLA fuses with the products without
    materializing intermediates. Accumulation in f32."""
    n, h, w, kk = dist.shape
    p = (k - 1) // 2
    fp = jnp.pad(flow, ((0, 0), (p, p), (p, p), (0, 0)))
    dist_t = jnp.moveaxis(dist, -1, 1).astype(jnp.float32)  # [N,k²,H,W]
    shx = jnp.stack(
        [fp[:, j // k : j // k + h, j % k : j % k + w, 0] for j in range(kk)],
        axis=1,
    ).astype(jnp.float32)
    shy = jnp.stack(
        [fp[:, j // k : j // k + h, j % k : j % k + w, 1] for j in range(kk)],
        axis=1,
    ).astype(jnp.float32)
    wxv = wx.reshape(1, kk, 1, 1).astype(jnp.float32)
    wyv = wy.reshape(1, kk, 1, 1).astype(jnp.float32)
    accx = bx.reshape(()).astype(jnp.float32) + jnp.sum(
        dist_t * wxv * shx, axis=1
    )
    accy = by.reshape(()).astype(jnp.float32) + jnp.sum(
        dist_t * wyv * shy, axis=1
    )
    inv = 1.0 / jnp.sum(dist_t, axis=1)
    return jnp.stack([accx * inv, accy * inv], axis=-1).astype(flow.dtype)


def _regfilter_pallas(dist, flow, wx, bx, wy, by, k, band=16):
    """One fused VMEM pass for the whole k x k weighted filter.

    The XLA tap-major formulation above still materializes the k² shifted
    flow views and the transposed dist ([N,k²,H,W] each) through HBM —
    ~0.65 ms/frame spread over dozens of small fusions at LiteFlowNet
    levels 2-4 in the round-3 device trace. Here every tap is a
    ``pltpu.roll`` of a VMEM-resident padded flow plane (shift >= 0 on
    either axis is Mosaic-legal; arbitrary-offset sublane *slices* are
    not — same trick as ops/pallas_corr.py `_pallas_corr_rowchunk`), so
    HBM traffic drops to dist + flow + output, read once.

    Grid walks (batch, row-band). The k²-tap dist block is banded; the
    two zero-padded flow planes stay in HBM (ANY) and the kernel DMAs
    the (band + k - 1)-row haloed window itself. Scalar per-tap weights
    ride in SMEM. Accumulation in f32, like the XLA path.
    """
    n, h, w, kk = dist.shape
    p = (k - 1) // 2
    dt = flow.dtype
    w8 = -(-w // 8) * 8
    hp = -(-h // band) * band
    n_bands = hp // band
    if hp != h or w8 != w:
        dist = jnp.pad(
            dist, ((0, 0), (0, hp - h), (0, w8 - w), (0, 0)),
            constant_values=1.0,  # keep the divisor finite in pad rows
        )
    # Mosaic legality of the haloed-window DMA (probed on real v5e): the
    # sliced window must be tiling-aligned in BOTH trailing dims — 2nd-minor
    # offset and size multiples of 8, minor size a multiple of 128 ("Slice
    # shape along dimension 1 must be aligned to tiling (8), but is 20" /
    # "... dimension 2 ... (128), but is 328"). Round the halo window up to
    # 8 rows and the padded plane width up to full lanes, and pad the
    # planes so the last band's window stays in bounds.
    wp = -(-(w8 + 2 * p) // 128) * 128
    b2 = band + 2 * p
    # sublane alignment follows the plane dtype's Mosaic tiling: (8, 128)
    # for 4-byte, (16, 128) for 2-byte, (32, 128) for 1-byte elements —
    # the DMA'd window slice and the scratch rows must both be aligned
    sub = {4: 8, 2: 16, 1: 32}[jnp.dtype(dt).itemsize]
    if band % sub:
        # DMA offsets j*band must stay sublane-aligned too
        return _unfold_mul_xla(dist, flow, wx, bx, wy, by, k)
    b2r = -(-b2 // sub) * sub
    row_pad_lo = p
    row_pad_hi = (hp + (b2r - band)) - h - p
    fx = jnp.pad(
        flow[..., 0], ((0, 0), (row_pad_lo, row_pad_hi), (p, wp - w - p))
    )
    fy = jnp.pad(
        flow[..., 1], ((0, 0), (row_pad_lo, row_pad_hi), (p, wp - w - p))
    )
    if fx.shape[1] < (n_bands - 1) * band + b2r:
        raise ValueError(
            "regfilter window bounds: padded plane has "
            f"{fx.shape[1]} rows < last band window end "
            f"{(n_bands - 1) * band + b2r}"
        )
    dist_t = jnp.moveaxis(dist, -1, 1)  # [N, k², H, W] (W minor)
    wvec = jnp.concatenate(
        [
            wx.reshape(kk),
            wy.reshape(kk),
            bx.reshape(1),
            by.reshape(1),
        ]
    ).astype(jnp.float32)

    def kernel(w_ref, dist_ref, fx_hbm, fy_hbm, outx_ref, outy_ref,
               sfx, sfy, semx, semy):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cx = pltpu.make_async_copy(
            fx_hbm.at[i, pl.ds(j * band, b2r)], sfx, semx
        )
        cy = pltpu.make_async_copy(
            fy_hbm.at[i, pl.ds(j * band, b2r)], sfy, semy
        )
        cx.start()
        cy.start()
        cx.wait()
        cy.wait()
        fxb = sfx[...].astype(jnp.float32)
        fyb = sfy[...].astype(jnp.float32)
        accx = jnp.zeros((band, w8), jnp.float32)
        accy = jnp.zeros((band, w8), jnp.float32)
        den = jnp.zeros((band, w8), jnp.float32)
        for dy in range(k):
            # rolled[r] == plane[r + dy] for r < band (never wraps:
            # r + dy <= band - 1 + 2p < b2r)
            rx = pltpu.roll(fxb, (b2r - dy) % b2r, 0)
            ry = pltpu.roll(fyb, (b2r - dy) % b2r, 0)
            for dx in range(k):
                jj = dy * k + dx
                sxv = pltpu.roll(rx, (wp - dx) % wp, 1)[:band, :w8]
                syv = pltpu.roll(ry, (wp - dx) % wp, 1)[:band, :w8]
                dj = dist_ref[0, jj].astype(jnp.float32)
                accx = accx + dj * (w_ref[jj] * sxv)
                accy = accy + dj * (w_ref[kk + jj] * syv)
                den = den + dj
        inv = 1.0 / den
        outx_ref[0] = ((accx + w_ref[2 * kk]) * inv).astype(dt)
        outy_ref[0] = ((accy + w_ref[2 * kk + 1]) * inv).astype(dt)

    outx, outy = pl.pallas_call(
        kernel,
        grid=(n, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, kk, band, w8),
                lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, band, w8), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, band, w8), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hp, w8), dt),
            jax.ShapeDtypeStruct((n, hp, w8), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b2r, wp), dt),
            pltpu.VMEM((b2r, wp), dt),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * hp * w8 * kk,
            bytes_accessed=(
                n * hp * w8 * kk * dist.dtype.itemsize
                + 4 * n * hp * w8 * flow.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(wvec, dist_t, fx, fy)
    return jnp.stack([outx[:, :h, :w], outy[:, :h, :w]], axis=-1)


def _dispatch(dist, flow, wx, bx, wy, by, k, use_pallas):
    n, h, w, kk = dist.shape
    if use_pallas is None:
        import os

        use_pallas = (
            os.environ.get("DFVO_REGFILTER_PALLAS", "1") != "0"
            and any(d.platform == "tpu" for d in jax.devices())
        )
    if use_pallas and w >= 80 and h >= 16:
        try:
            return _regfilter_pallas(dist, flow, wx, bx, wy, by, k)
        except Exception:
            pass  # Pallas unavailable: XLA fallback
    return _unfold_mul_xla(dist, flow, wx, bx, wy, by, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _regfilter(dist, flow, wx, bx, wy, by, k, use_pallas):
    return _dispatch(dist, flow, wx, bx, wy, by, k, use_pallas)


def _rf_fwd(dist, flow, wx, bx, wy, by, k, use_pallas):
    return _regfilter(dist, flow, wx, bx, wy, by, k, use_pallas), (
        dist, flow, wx, bx, wy, by,
    )


def _rf_bwd(k, use_pallas, res, g):
    dist, flow, wx, bx, wy, by = res
    _, vjp = jax.vjp(
        lambda d, f, a, b, c, e: _unfold_mul_xla(d, f, a, b, c, e, k),
        dist, flow, wx, bx, wy, by,
    )
    return vjp(g)


_regfilter.defvjp(_rf_fwd, _rf_bwd)


def reg_scale_filter(dist, flow, wx, bx, wy, by, k, use_pallas=None):
    """Confidence-weighted k x k flow filtering (ref lite_flow_net.py
    Regularization ``moduleScaleX/Y`` + unfold, :236-263).

    Args:
        dist: [N,H,W,k²] softmax-normalized confidence (ky-major offsets).
        flow: [N,H,W,2] flow to filter.
        wx/bx, wy/by: scale_x / scale_y 1x1-conv kernel ([1,1,k²,1]) and
            bias ([1]) parameters.
        k: filter size (static).
        use_pallas: force the fused Pallas kernel (True), the XLA
            tap-major fallback (False), or auto-detect (None: Pallas on
            TPU for the level-2/3/4 shapes, XLA otherwise).

    Returns:
        [N,H,W,2] filtered flow.
    """
    return _regfilter(dist, flow, wx, bx, wy, by, k, use_pallas)
