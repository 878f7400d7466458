"""Microbenchmark: packed-corner warp-table BUILD cost in isolation.

The r5 profile attributes ~0.66 ms/frame (pre-unique-tables) to the two
L2 feature-table builds: XLA splits the 4-corner concat into a slice-tuple
fusion + a pad/concat fusion — two materializing passes over the
4x-amplified table, each measured well below HBM bandwidth
(docs/profiles/r5/README.md, %fusion.4030/4031 + %pad_maximum_fusion.50/51).

This probe times each DFVO_WARP_BUILD variant's build+gather at L2 feature
shapes (src [M x 96 x 320 x 64] -> table + one dense gather), isolating the
table construction from the rest of the flow net so the winner is chosen by
measurement. Run on the real chip:

    python tools/bench_tablebuild.py [variant ...]
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

M = int(os.environ.get("TB_M", "33"))  # unique frames (chunk 32 + 1)
B = 2 * (M - 1)  # output batch rows (fwd+bwd pairs)
H, W, C = 96, 320, 64

VARIANTS = ["base", "pre_t", "stack", "xonly"]


def timed(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


def bench(name):
    os.environ["DFVO_WARP_BUILD"] = name

    from dfvo_tpu.ops import warp as warp_mod

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(M, H, W, C).astype(np.float32), jnp.bfloat16)
    flow = jnp.asarray(
        (rng.rand(B, H, W, 2) * 4 - 2).astype(np.float32)
    )
    ids = jnp.concatenate(
        [jnp.arange(1, M), jnp.arange(0, M - 1)]
    ).astype(jnp.int32)

    @jax.jit
    def step(s, f, t):
        coords = warp_mod.flow_to_coords(f + t)
        out = warp_mod.grid_sample(s, coords, frame_ids=ids)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def run(k):
        t = jnp.zeros((B, H, W, 2), flow.dtype)
        for _ in range(k):
            t = t.at[0, 0, 0, 0].set(step(src, flow, t) * 1e-9)
        return float(jnp.sum(t))

    run(1)
    k1, k2 = 2, 10
    t1 = min(timed(run, k1) for _ in range(3))
    t2 = min(timed(run, k2) for _ in range(3))
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{name:8s} {ms:8.3f} ms/warp (build+gather, M={M}, B={B})",
          flush=True)
    # drop the traced fn so the next variant re-traces with its flag
    step._clear_cache()


def main():
    names = sys.argv[1:] or VARIANTS
    for n in names:
        bench(n)


if __name__ == "__main__":
    main()
