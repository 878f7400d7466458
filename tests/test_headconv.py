"""Head-conv op tests (CPU: XLA path parity + the Pallas kernel's
block-Toeplitz math checked against the plain convolution).

The Pallas path itself only compiles on TPU; its device correctness is
additionally pinned by the same Toeplitz construction tested here (the
kernel is a direct transcription of ``_toeplitz_weights`` + group dots).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfvo_tpu.ops.headconv import (
    _headconv_xla,
    _pick_pack,
    _toeplitz_weights,
    head_conv,
)


def _conv_ref(x, k, b, pad):
    return np.asarray(_headconv_xla(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), pad))


@pytest.mark.parametrize(
    "shape",
    [(2, 12, 320, 32, 2, 7), (1, 8, 160, 32, 2, 5), (2, 16, 640, 16, 1, 3)],
)
def test_head_conv_matches_nn_conv(shape):
    n, h, w, cin, cout, k = shape
    rng = np.random.RandomState(0)
    x = rng.rand(n, h, w, cin).astype(np.float32)
    kern = (rng.rand(k, k, cin, cout).astype(np.float32) - 0.5)
    b = rng.rand(cout).astype(np.float32)
    got = np.asarray(head_conv(jnp.asarray(x), jnp.asarray(kern), jnp.asarray(b)))
    want = _conv_ref(x, kern, b, (k - 1) // 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_head_conv_prepadded_matches_valid_conv():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 10, 162, 16).astype(np.float32)
    kern = (rng.rand(3, 3, 16, 1).astype(np.float32) - 0.5)
    b = rng.rand(1).astype(np.float32)
    got = np.asarray(
        head_conv(jnp.asarray(x), jnp.asarray(kern), jnp.asarray(b), prepadded=True)
    )
    want = _conv_ref(x, kern, b, 0)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("case", [(320, 32, 2, 7), (640, 16, 1, 3)])
def test_toeplitz_construction_equals_conv(case):
    """The pixel-packed matmul the Pallas kernel performs — padded row
    blocks x block-Toeplitz weights — must reproduce the convolution."""
    w, cin, cout, k = case
    h, n = 8, 1
    p = _pick_pack(w, cout)
    assert p is not None and (p * cin) % 1024 == 0
    pad = (k - 1) // 2
    win = p + k - 1
    win_b = -(-(win * cin) // 1024) * 8
    win_pad = win_b * 128 // cin
    g = w // p

    rng = np.random.RandomState(2)
    x = rng.rand(n, h, w, cin).astype(np.float32)
    kern = (rng.rand(k, k, cin, cout).astype(np.float32) - 0.5)
    b = np.zeros(cout, np.float32)

    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = max(w + 2 * pad, (g - 1) * p + win_pad)
    xp = np.pad(xp, ((0, 0), (0, 0), (0, cols - (w + 2 * pad)), (0, 0)))
    flat = xp.reshape(n, h + 2 * pad, cols * cin)
    wt = np.asarray(_toeplitz_weights(jnp.asarray(kern), p, win_pad))

    out = np.zeros((n, h, g, p * cout), np.float32)
    for gi in range(g):
        for dy in range(k):
            a = flat[:, dy : dy + h, gi * p * cin : gi * p * cin + win_pad * cin]
            out[:, :, gi, :] += a @ wt[dy]
    got = out.reshape(n, h, w, cout)
    want = _conv_ref(x, kern, b, pad)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_head_conv_grad_matches_conv_grad():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 8, 160, 32).astype(np.float32))
    kern = jnp.asarray(rng.rand(5, 5, 32, 2).astype(np.float32) - 0.5)
    b = jnp.asarray(rng.rand(2).astype(np.float32))

    g1 = jax.grad(lambda k: jnp.sum(head_conv(x, k, b) ** 2))(kern)
    g2 = jax.grad(lambda k: jnp.sum(_headconv_xla(x, k, b, 2) ** 2))(kern)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
