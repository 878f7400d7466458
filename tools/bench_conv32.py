"""Microbenchmark: small-Cout 3x3 conv formulations on the real chip.

The r5mid ledger (docs/profiles/r5mid/README.md) shows the L2 trunk convs
with Cout<=32 running at 3-6% MXU / ~7x off HBM bandwidth: XLA picks a
batch-in-lanes {0,3,2,1} output layout for them and every layout lever
probed (channel padding, HWNC, barriers) came back flat. This probes
whether reformulating the conv itself — as 9 shifted-slice matmuls, or as
one matmul over a patch-concat — dodges the layout assignment entirely.

Shapes are the L2 trunk's (batch 64 pairs, 96x320): main_2 (64->32) and the
main_1 (128->64) stage, each measured alone and in a producer/consumer
sandwich (conv 128->in_ch before, 3x3 in->32 after) to expose seams.

Run: python tools/bench_conv32.py [case ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dfvo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax

N, H, W = 64, 96, 320


def conv_xla(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_mm9(x, k):
    """3x3 conv as 9 shifted-slice matmuls (no conv op => no conv layout
    assignment). SAME padding via explicit zero pad."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h, dx : dx + w, :]
            t = jnp.einsum("nhwc,cf->nhwf", xs, k[dy, dx])
            out = t if out is None else out + t
    return out


def conv_patch_mm(x, k):
    """3x3 conv as ONE matmul over a channel-concat of the 9 shifts."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    kf = k.reshape(9 * c, -1)
    return jnp.einsum("nhwc,cf->nhwf", cols, kf)


FORMS = {"xla": conv_xla, "mm9": conv_mm9, "patch": conv_patch_mm}


def bench(fn_jit, args, chunk_frames=32):
    def run(k):
        t = jnp.zeros((), jnp.bfloat16)
        for _ in range(k):
            t = fn_jit(*args, t)
        return float(t)

    run(1)
    k1, k2 = 2, 10

    # delta-workload timing
    def timed(k):
        t0 = time.perf_counter()
        run(k)
        return time.perf_counter() - t0

    t1 = min(timed(k1) for _ in range(3))
    t2 = min(timed(k2) for _ in range(3))
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    cases = sys.argv[1:] or ["solo_64_32", "sandwich_64_32", "sandwich_128_64"]
    rng = np.random.RandomState(0)

    for case in cases:
        kind, cin, cout = case.split("_")
        cin, cout = int(cin), int(cout)
        x = jnp.asarray(rng.rand(N, H, W, cin).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(
            rng.rand(3, 3, cin, cout).astype(np.float32) * 0.1, jnp.bfloat16
        )
        if kind == "sandwich":
            kp = jnp.asarray(
                rng.rand(3, 3, 128, cin).astype(np.float32) * 0.1, jnp.bfloat16
            )
            kc = jnp.asarray(
                rng.rand(3, 3, cout, 32).astype(np.float32) * 0.1, jnp.bfloat16
            )
            xw = jnp.asarray(
                rng.rand(N, H, W, 128).astype(np.float32), jnp.bfloat16
            )
        for name, form in FORMS.items():
            if kind == "solo":
                @jax.jit
                def step(xx, kk, t, form=form):
                    y = form(xx + t * jnp.zeros((), xx.dtype), kk)
                    y = jnp.where(y > 0, y, 0.1 * y)
                    return jnp.sum(y.astype(jnp.float32)).astype(jnp.bfloat16) * jnp.bfloat16(1e-12)

                ms = bench(step, (x, k))
            else:
                @jax.jit
                def step(xx, kkp, kk, kkc, t, form=form):
                    a = conv_xla(xx + t * jnp.zeros((), xx.dtype), kkp)
                    a = jnp.where(a > 0, a, 0.1 * a)
                    y = form(a, kk)
                    y = jnp.where(y > 0, y, 0.1 * y)
                    z = conv_xla(y, kkc)
                    z = jnp.where(z > 0, z, 0.1 * z)
                    return jnp.sum(z.astype(jnp.float32)).astype(jnp.bfloat16) * jnp.bfloat16(1e-12)

                ms = bench(step, (xw, kp, k, kc))
            print(f"{case:18s} {name:6s} {ms:8.3f} ms/step", flush=True)

        # parity check (CPU-precision tolerant: bf16 accumulation differs)
        y0 = np.asarray(conv_xla(x, k).astype(jnp.float32))
        for name, form in FORMS.items():
            if name == "xla":
                continue
            y1 = np.asarray(jax.jit(form)(x, k).astype(jnp.float32))
            err = np.max(np.abs(y0 - y1)) / (np.max(np.abs(y0)) + 1e-9)
            print(f"  parity {name}: rel max err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
