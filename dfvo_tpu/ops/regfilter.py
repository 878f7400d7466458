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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _regfilter(dist, flow, wx, bx, wy, by, k):
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
