"""Regularization scale-filter op: the fused formulation must equal the
reference unfold + 1x1-conv + divisor chain (ref lite_flow_net.py:236-263).
On CPU ``reg_scale_filter`` runs the XLA fallback; the Pallas kernel is a
transcription of the same per-tap sum (device-checked separately)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfvo_tpu.ops.regfilter import reg_scale_filter


def _reference(dist, flow, wx, bx, wy, by, k):
    """The pre-kernel module math: unfold -> dist-weighted 1x1 conv."""
    p = (k - 1) // 2
    n, h, w, _ = flow.shape
    fp = jnp.pad(flow, ((0, 0), (p, p), (p, p), (0, 0)))
    cols_x, cols_y = [], []
    for ky in range(k):
        for kx in range(k):
            cols_x.append(fp[:, ky : ky + h, kx : kx + w, 0])
            cols_y.append(fp[:, ky : ky + h, kx : kx + w, 1])
    ux = jnp.stack(cols_x, axis=-1)
    uy = jnp.stack(cols_y, axis=-1)
    divisor = 1.0 / jnp.sum(dist, axis=-1, keepdims=True)

    def conv1x1(x, kern, bias):
        return (
            jax.lax.conv_general_dilated(
                x, kern, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias
        )

    sx = conv1x1(dist * ux, wx, bx) * divisor
    sy = conv1x1(dist * uy, wy, by) * divisor
    return jnp.concatenate([sx, sy], axis=-1)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_reg_scale_filter_matches_unfold_conv(k):
    rng = np.random.RandomState(k)
    n, h, w = 2, 12, 40
    dist = jnp.asarray(rng.rand(n, h, w, k * k).astype(np.float32) + 0.1)
    flow = jnp.asarray((rng.rand(n, h, w, 2) - 0.5).astype(np.float32))
    wx = jnp.asarray((rng.rand(1, 1, k * k, 1) - 0.5).astype(np.float32))
    wy = jnp.asarray((rng.rand(1, 1, k * k, 1) - 0.5).astype(np.float32))
    bx = jnp.asarray(rng.rand(1).astype(np.float32))
    by = jnp.asarray(rng.rand(1).astype(np.float32))

    got = np.asarray(reg_scale_filter(dist, flow, wx, bx, wy, by, k))
    want = np.asarray(_reference(dist, flow, wx, bx, wy, by, k))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize(
    "n,h,w,k",
    [
        (2, 32, 96, 7),   # level-2-like: exact band/lane tiling
        (1, 20, 88, 5),   # tail band (20 rows, band 16)
        (1, 16, 84, 3),   # width not a multiple of 8
    ],
)
def test_pallas_regfilter_interpret_matches_xla(n, h, w, k):
    from jax.experimental.pallas import tpu as pltpu

    from dfvo_tpu.ops.regfilter import _regfilter_pallas, _unfold_mul_xla

    rng = np.random.RandomState(h + k)
    kk = k * k
    dist = jnp.asarray(rng.rand(n, h, w, kk).astype(np.float32) + 0.1)
    flow = jnp.asarray((rng.rand(n, h, w, 2) - 0.5).astype(np.float32) * 3)
    wx = jnp.asarray((rng.rand(1, 1, kk, 1) - 0.5).astype(np.float32))
    wy = jnp.asarray((rng.rand(1, 1, kk, 1) - 0.5).astype(np.float32))
    bx = jnp.asarray(rng.rand(1).astype(np.float32))
    by = jnp.asarray(rng.rand(1).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            _regfilter_pallas(dist, flow, wx, bx, wy, by, k)
        )
    want = np.asarray(_unfold_mul_xla(dist, flow, wx, bx, wy, by, k))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_reg_scale_filter_grad():
    k = 5
    rng = np.random.RandomState(0)
    dist = jnp.asarray(rng.rand(1, 8, 16, k * k).astype(np.float32) + 0.1)
    flow = jnp.asarray((rng.rand(1, 8, 16, 2) - 0.5).astype(np.float32))
    wx = jnp.asarray((rng.rand(1, 1, k * k, 1) - 0.5).astype(np.float32))
    wy = jnp.asarray((rng.rand(1, 1, k * k, 1) - 0.5).astype(np.float32))
    bx = jnp.asarray(rng.rand(1).astype(np.float32))
    by = jnp.asarray(rng.rand(1).astype(np.float32))

    g1 = jax.grad(
        lambda f: jnp.sum(reg_scale_filter(dist, f, wx, bx, wy, by, k) ** 2)
    )(flow)
    g2 = jax.grad(
        lambda f: jnp.sum(_reference(dist, f, wx, bx, wy, by, k) ** 2)
    )(flow)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
