"""Probe: do XLA:TPU convolutions run at native speed with HWNC logical
dimension numbers?

Hypothesis (r5): the flow/depth trunk slowdowns are layout seams — XLA:TPU
convs natively want physical [H, W, N, C] ({3,0,2,1} on NHWC logical), but
tiny-Cout heads anchor N-in-lanes ({0,3,2,1}) backward into the 64->32
trunk convs, and Pallas custom-calls anchor row-major {3,2,1,0}; the
conflicting anchors insert relayout copies and force convs into 3-6% MXU
layouts (docs/profiles/r4, r5 ledger). If the SAME subgraph is expressed
with [H, W, N, C] *logical* arrays and ("HWNC", "HWIO", "HWNC") dimension
numbers, row-major logical = conv-native physical, and a row-major (8,128)
tile on the minor (N, C) dims packs lanes fully even for Cout<=2 heads —
one layout for everything, no copies.

Measures, at LiteFlowNet L2 Regularization-trunk shape (batch 64, 96x320):

    nhwc        5-conv trunk (130->128->128->64->64->32) + 7x7->2 head, NHWC
    hwnc        identical math, HWNC logical
    nhwc_head   the 7x7x32->2 head alone, NHWC
    hwnc_head   the head alone, HWNC
    nhwc_mix    trunk with a {3,2,1,0}-anchored consumer (simulated Pallas
                boundary via reshape-flatten), NHWC
    hwnc_mix    same, HWNC

Run: python tools/bench_hwnc.py [case ...]
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

H, W, N = 96, 320, 64
CH = [130, 128, 128, 64, 64, 32]


def conv(x, w, dn):
    return lax.conv_general_dilated(
        x, w, (1, 1),
        ((w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2),
        dimension_numbers=dn,
    )


def leaky(x):
    return jnp.where(x >= 0, x, 0.1 * x)


def make_weights(rng, head_k=7):
    ws = [
        jnp.asarray(
            rng.randn(3, 3, CH[i], CH[i + 1]).astype(np.float32) * 0.05,
            jnp.bfloat16,
        )
        for i in range(len(CH) - 1)
    ]
    wh = jnp.asarray(
        rng.randn(head_k, head_k, CH[-1], 2).astype(np.float32) * 0.05,
        jnp.bfloat16,
    )
    return ws, wh


def trunk(x, ws, wh, dn, with_head=True, mix=False):
    for w in ws:
        x = leaky(conv(x, w, dn))
    out = conv(x, wh, dn) if with_head else x
    if mix:
        # simulate a row-major-anchored consumer (Pallas-like): flatten in
        # logical order, forcing a {3,2,1,0}-compatible read
        out = out.reshape(-1, out.shape[-1]) * 1.000001
    return jnp.sum(out.astype(jnp.float32)) * 1e-9


def head_only(x, wh, dn):
    return jnp.sum(conv(x, wh, dn).astype(jnp.float32)) * 1e-9


def timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def bench(name, step, x):
    @jax.jit
    def chain(x, t):
        return step(x + (t * 0).astype(x.dtype)) + t

    def run(k):
        t = jnp.zeros((), jnp.float32)
        for _ in range(k):
            t = chain(x, t)
        return float(t)

    t0 = time.perf_counter()
    run(1)
    compile_s = time.perf_counter() - t0
    k1, k2 = 2, 10
    t1 = min(timed(run, k1) for _ in range(3))
    t2 = min(timed(run, k2) for _ in range(3))
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{name:12s} {ms:8.3f} ms/step (compile {compile_s:.0f}s)", flush=True)
    return ms


def main():
    rng = np.random.RandomState(0)
    ws, wh = make_weights(rng)
    x_nhwc = jnp.asarray(
        rng.rand(N, H, W, CH[0]).astype(np.float32), jnp.bfloat16
    )
    x_hwnc = jnp.transpose(x_nhwc, (1, 2, 0, 3))
    dn_n = ("NHWC", "HWIO", "NHWC")
    dn_h = ("HWNC", "HWIO", "HWNC")
    x32_n = jnp.asarray(
        rng.rand(N, H, W, 32).astype(np.float32), jnp.bfloat16
    )
    x32_h = jnp.transpose(x32_n, (1, 2, 0, 3))

    cases = {
        "nhwc": lambda: bench("nhwc", lambda x: trunk(x, ws, wh, dn_n), x_nhwc),
        "hwnc": lambda: bench("hwnc", lambda x: trunk(x, ws, wh, dn_h), x_hwnc),
        "nhwc_head": lambda: bench(
            "nhwc_head", lambda x: head_only(x, wh, dn_n), x32_n
        ),
        "hwnc_head": lambda: bench(
            "hwnc_head", lambda x: head_only(x, wh, dn_h), x32_h
        ),
        "nhwc_mix": lambda: bench(
            "nhwc_mix", lambda x: trunk(x, ws, wh, dn_n, mix=True), x_nhwc
        ),
        "hwnc_mix": lambda: bench(
            "hwnc_mix", lambda x: trunk(x, ws, wh, dn_h, mix=True), x_hwnc
        ),
    }
    names = sys.argv[1:] or list(cases)
    for n in names:
        cases[n]()


if __name__ == "__main__":
    main()
