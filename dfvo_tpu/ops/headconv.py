"""Pallas TPU kernel for tiny-output-channel "head" convolutions.

LiteFlowNet's flow-delta heads (k=7/5/3, Cout=2; ref lite_flow_net.py
Matching/Subpixel ``moduleSix``) and Monodepth2's disparity heads (3x3,
Cout=1; ref depth_decoder.py:17-65) are the worst case for XLA:TPU's conv
emitters: with 1-2 output channels the MXU runs < 5% occupied and the
im2col-style emitter moves ~3 GB/step of patch data through HBM (measured
~6 ms for one 7x7x32->2 head at [32,96,320] — /tmp/bench_headconv.py r2;
channel-padding tricks don't help because the cost is patch-bandwidth, not
lane count).

This kernel restores MXU efficiency by packing P consecutive output PIXELS
alongside the channels into the 128 MXU lanes (block-Toeplitz weights):

    out[b, g*P + dp, co] = sum_{dy, dxe, ci}
        patch[b, g, dy, dxe, ci] * Wt[dy, dxe*Cin + ci, dp*Cout + co]

where ``patch`` is the (k + P - 1)-wide input window shared by the P packed
pixels of group g and ``Wt[dy, (dxe, ci), (dp, co)] = W[dy, dxe - dp, ci,
co]`` (zero outside 0 <= dxe - dp < k). Per dy the kernel stacks the G =
W/P overlapping windows of a row band (static slices in VMEM) and performs
one [band*G, (k+P-1)*Cin] @ [(k+P-1)*Cin, P*Cout] matmul — lanes carry
(pixel, channel) pairs, so utilization no longer depends on Cout. Effective
MXU work for the 7x7 head drops 394 -> 62 GFLOP/step and all patch
assembly stays in VMEM.

Backward (needed for online finetuning) reuses XLA autodiff of the plain
conv, as the correlation kernel does (pallas_corr.py:185-201).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_pack(w, cout):
    """Largest P dividing W with P * Cout <= 128."""
    best = None
    for p in (128, 64, 32, 20, 16, 10, 8, 5, 4, 2):
        if p * cout <= 128 and w % p == 0:
            best = p
            break
    return best


def _toeplitz_weights(kernel, p, win_pad):
    """[k, k, Cin, Cout] -> [k, win_pad*Cin, P*Cout] block-Toeplitz form
    (window positions beyond k+P-1 are zero-weighted padding)."""
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    cols = []
    for dp in range(p):
        # W[dy, dxe - dp] placed at window offset dxe in [0, win_pad)
        shifted = jnp.pad(
            kernel, ((0, 0), (dp, win_pad - k - dp), (0, 0), (0, 0))
        )
        cols.append(shifted)  # [k, win_pad, Cin, Cout]
    wt = jnp.stack(cols, axis=3)  # [k, win_pad, Cin, P, Cout]
    return wt.reshape(k, win_pad * cin, p * cout)


def _headconv_pallas(x, kernel, bias, k, p, band):
    """x: [N, H + 2pad, W + 2pad, Cin] spatially pre-padded input;
    kernel: [k, k, Cin, Cout]. Returns [N, H, W, Cout].

    Mosaic cannot reshape a (win, Cin) slice into one contraction axis, so
    the row data is passed as 128-lane blocks [N, rows, BLOCKS, 128]: a
    group's patch is then an 8-aligned slice on the block dim (p*Cin/128
    and win_b are multiples of 8) whose (band, win_b, 128) load reshapes
    losslessly to the (band, win_b*128) matmul operand — all verified
    Mosaic-supported (probe r2). Output lanes carry (dp, co) pairs so
    [.., G, P*Cout] -> [.., W, Cout] outside the kernel is a bitcast.
    """
    n, hp_rows, wp_cols, cin = x.shape
    pad = (k - 1) // 2
    h = hp_rows - 2 * pad
    w = wp_cols - 2 * pad
    g = w // p
    cout = kernel.shape[3]
    win = p + k - 1
    pb = p * cin // 128  # blocks per group step (multiple of 8, gated)
    # window block count: multiple of 8 so in-kernel slices stay aligned
    win_b = -(-(win * cin) // 1024) * 8
    win_pad = win_b * 128 // cin
    blocks = max(-(-(wp_cols * cin) // 1024) * 8, (g - 1) * pb + win_b)

    n_bands = -(-h // band)
    hb = n_bands * band
    if hb != h:
        x = jnp.pad(x, ((0, 0), (0, hb - h), (0, 0), (0, 0)))
    rows = hb + 2 * pad

    x2 = x.reshape(n, rows, wp_cols * cin)
    if blocks * 128 != wp_cols * cin:
        x2 = jnp.pad(
            x2, ((0, 0), (0, 0), (0, blocks * 128 - wp_cols * cin))
        )
    x2 = x2.reshape(n, rows, blocks, 128)
    wt = _toeplitz_weights(kernel, p, win_pad)
    bias_l = jnp.tile(bias.reshape(-1), p).reshape(1, p * cout)

    def kernel_fn(x_ref, wt_ref, bias_ref, out_ref, scratch, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_ref.at[i, pl.ds(j * band, band + 2 * pad)], scratch, sem
        )
        dma.start()
        dma.wait()
        bias_v = bias_ref[0].astype(jnp.float32)  # pre-tiled (dp, co) lanes
        for gi in range(g):
            acc = jnp.zeros((band, p * cout), jnp.float32)
            for dy in range(k):
                a = scratch[
                    dy : dy + band, gi * pb : gi * pb + win_b, :
                ].reshape(band, win_b * 128)
                acc = acc + jnp.dot(
                    a, wt_ref[dy], preferred_element_type=jnp.float32
                )
            out_ref[0, :, gi * p * cout : (gi + 1) * p * cout] = (
                acc + bias_v
            ).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel_fn,
        grid=(n, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (k, win_pad * cin, p * cout),
                lambda i, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, p * cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, band, g * p * cout), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hb, g * p * cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((band + 2 * pad, blocks, 128), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hb * g * win_pad * cin * p * cout,
            bytes_accessed=(n * hb * blocks * 128 + n * hb * w * cout)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, wt, bias_l)
    out = out.reshape(n, hb, w, cout)  # (gi, dp, co) lanes -> (W, Cout)
    return out[:, :h] if hb != h else out


def _headconv_xla(x, kernel, bias, pad):
    import os

    padc = os.environ.get("DFVO_HEAD_PAD", "0")
    if padc not in ("0", "8", "16", "32"):
        # fail loudly: a typo'd probe flag would silently measure the base
        # path (ADVICE r4 convention). Read at TRACE time — cached step fns
        # do not reflect mid-process changes.
        raise ValueError(f"DFVO_HEAD_PAD={padc!r} not in 0|8|16|32")
    cout = kernel.shape[3]
    pc = int(padc)
    if pc > cout:
        # Probe variant: pad Cout with runtime zero channels so XLA's
        # layout assignment sees a wider conv and stops anchoring the
        # batch-in-lanes {0,3,2,1} layout backward into the trunk (r5
        # ledger: tiny-Cout heads pollute the 64->32 main_2 convs). The
        # optimization_barrier between conv and slice keeps the algebraic
        # simplifier from folding the slice back into the kernel (which
        # un-pads it; r2 finding). Bit-identical to the plain head.
        kz = jnp.concatenate(
            [
                kernel,
                jnp.zeros(kernel.shape[:3] + (pc - cout,), kernel.dtype),
            ],
            axis=3,
        )
        y = jax.lax.conv_general_dilated(
            x,
            kz.astype(x.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bz = jnp.concatenate(
            [bias, jnp.zeros((pc - cout,), bias.dtype)]
        )
        y = jax.lax.optimization_barrier(y + bz.astype(y.dtype))
        return y[..., :cout]
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _headconv_fused(x, kernel, bias, prepadded):
    k = kernel.shape[0]
    pad = 0 if prepadded else (k - 1) // 2
    n, h, w, cin = x.shape
    if prepadded:
        h, w = h - (k - 1), w - (k - 1)
    cout = kernel.shape[3]
    import os

    p = _pick_pack(w, cout)
    use_pallas = (
        os.environ.get("DFVO_HEADCONV_PALLAS", "1") != "0"
        and p is not None
        and k > 1  # 1x1 heads are a cheap fused reduce in XLA already
        and w >= 160
        and h >= 8
        # measured crossover on v5e (tools/bench_flownet.py, r4): at batch
        # >= 64 XLA's conv emitter beats the kernel + its layout-boundary
        # copies (6.06 vs 6.35 ms/frame whole-flow-net), at batch <= 32 the
        # kernel wins (6.48 vs 6.98)
        and n < 64
        and (p * cin) % 1024 == 0  # group steps must be 8-block aligned
        and 128 % cin == 0
        and any(d.platform == "tpu" for d in jax.devices())
    )
    if not use_pallas:
        return _headconv_xla(x, kernel, bias, pad)
    band = 16 if h % 16 == 0 else 8
    if prepadded:
        xp = x
    else:
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    try:
        return _headconv_pallas(
            xp, kernel.astype(x.dtype), bias, k, p, band
        )
    except Exception:
        return _headconv_xla(x, kernel, bias, pad)


def _hc_fwd(x, kernel, bias, prepadded):
    return _headconv_fused(x, kernel, bias, prepadded), (x, kernel, bias)


def _hc_bwd(prepadded, res, gout):
    x, kernel, bias = res
    pad = 0 if prepadded else (kernel.shape[0] - 1) // 2
    _, vjp = jax.vjp(
        lambda a, k, b: _headconv_xla(a, k, b, pad), x, kernel, bias
    )
    return vjp(gout)


_headconv_fused.defvjp(_hc_fwd, _hc_bwd)


def head_conv(x, kernel, bias=None, prepadded=False):
    """Small-Cout conv, stride 1: [N,H,W,Cin] x [k,k,Cin,Cout].

    'Same' zero padding by default; ``prepadded=True`` treats ``x`` as
    already spatially padded by (k-1)//2 on each side (VALID conv), for
    reflect-padded heads (Monodepth2 Conv3x3, ref layers.py:121-136).
    Pallas pixel-packed kernel on TPU for the hot shapes, XLA conv
    elsewhere; numerically within bf16 rounding of the plain conv.
    """
    if bias is None:
        bias = jnp.zeros((kernel.shape[3],), x.dtype)
    return _headconv_fused(x, kernel, bias, prepadded)
