"""Microbenchmark: bilinear-warp implementations on the real TPU chip.

The round-1 wall is LiteFlowNet's 15 data-dependent warps (reference
``Backward``, lite_flow_net.py:10-28), implemented as 4 flat gathers
(ops/warp.py). Round-1 measured the gather cost flat in batch and dtype,
i.e. bound by gather *row count*, not bytes — so the candidates here trade
fewer/wider gather rows (patch packing) and MXU-based interpolation
(one-hot matmuls) against the baseline.

Run: python tools/bench_warp.py   (on the real chip; uses delta-workload
timing per CLAUDE.md to cancel the relay's fixed sync overhead)
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dfvo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from dfvo_tpu.ops.warp import grid_sample as gs_baseline, flow_to_coords


# ---------------------------------------------------------------- variants
def gs_patch4(src, coords):
    """One gather of 4C-wide rows from a precomputed 2x2-patch table.

    Table: p[y, x] = (src[y,x], src[y,x+1], src[y+1,x], src[y+1,x+1]) built
    with shifts (bandwidth-bound), so the data-dependent gather touches 4x
    fewer rows, each 4x wider.

    Zeros-padding correctness without masks: clamp the patch ORIGIN into
    bounds and weight each patch cell by hat(x - cell_x)·hat(y - cell_y)
    with hat(d) = max(0, 1-|d|). For interior samples the cells are the 4
    bilinear corners with standard weights; for border/outside samples
    every in-range source pixel within distance < 1 is still inside the
    clamped patch and all other cells get weight 0 — exactly
    grid_sample(padding_mode='zeros').
    """
    n, h, w, c = src.shape
    out_shape = coords.shape[:-1]
    x = coords[..., 0]
    y = coords[..., 1]
    x0c = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    y0c = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)

    def hat(d):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(src.dtype)

    fx0 = x - x0c.astype(x.dtype)
    fy0 = y - y0c.astype(y.dtype)
    w00 = (hat(fy0) * hat(fx0))[..., None]
    w10 = (hat(fy0) * hat(fx0 - 1))[..., None]
    w01 = (hat(fy0 - 1) * hat(fx0))[..., None]
    w11 = (hat(fy0 - 1) * hat(fx0 - 1))[..., None]

    p = jnp.concatenate(
        [
            src[:, :-1, :-1, :],
            src[:, :-1, 1:, :],
            src[:, 1:, :-1, :],
            src[:, 1:, 1:, :],
        ],
        axis=-1,
    )  # [n, h-1, w-1, 4c]
    p_flat = p.reshape(n * (h - 1) * (w - 1), 4 * c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * ((h - 1) * (w - 1))).reshape(
        (n,) + (1,) * (len(out_shape) - 1)
    )
    idx = (y0c * (w - 1) + x0c + batch_off).reshape(-1)
    g = jnp.take(p_flat, idx, axis=0).reshape(out_shape + (4 * c,))
    v00, v10, v01, v11 = (
        g[..., :c],
        g[..., c : 2 * c],
        g[..., 2 * c : 3 * c],
        g[..., 3 * c :],
    )
    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def gs_pairx(src, coords):
    """Two gathers of 2C-wide rows (x-corner pairs packed).

    Horizontal handling = clamped origin + hat weights (see gs_patch4);
    vertical corners are gathered separately (clamped row index) with hat
    weights against the UNCLAMPED row position, masked where the true row
    is outside — the two gathered rows coincide at the border, and the
    mask keeps the duplicate from double counting.
    """
    n, h, w, c = src.shape
    out_shape = coords.shape[:-1]
    x = coords[..., 0]
    y = coords[..., 1]
    y0 = jnp.floor(y)
    x0c = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

    def hat(d):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(src.dtype)

    fx0 = x - x0c.astype(x.dtype)
    wy0 = hat(y - y0) * ((y0 >= 0) & (y0 <= h - 1)).astype(src.dtype)
    wy1 = hat(y - y0 - 1) * ((y0 + 1 >= 0) & (y0 + 1 <= h - 1)).astype(
        src.dtype
    )

    p = jnp.concatenate([src[:, :, :-1, :], src[:, :, 1:, :]], axis=-1)
    p_flat = p.reshape(n * h * (w - 1), 2 * c)
    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * (w - 1))).reshape(
        (n,) + (1,) * (len(out_shape) - 1)
    )

    def gather(yi):
        idx = (yi * (w - 1) + x0c + batch_off).reshape(-1)
        return jnp.take(p_flat, idx, axis=0).reshape(out_shape + (2 * c,))

    gtop = gather(y0c)
    gbot = gather(y1c)
    w00 = (wy0 * hat(fx0))[..., None]
    w10 = (wy0 * hat(fx0 - 1))[..., None]
    w01 = (wy1 * hat(fx0))[..., None]
    w11 = (wy1 * hat(fx0 - 1))[..., None]
    return (
        gtop[..., :c] * w00
        + gtop[..., c:] * w10
        + gbot[..., :c] * w01
        + gbot[..., c:] * w11
    )


def gs_onehot_mm(src, coords):
    """MXU formulation: per output row, horizontal interp = one-hot matmul
    over the full width, vertical interp = one-hot matmul over the full
    height. out[y',x',c] = sum_y Wy[y',x'?...] — exact only via per-row
    matmuls; here we do the full dense two-sided contraction per row:
      hb[y, x', c] = sum_x Wx[y', x', x] src[y, x, c]   (depends on y')
    so per output row: Wx [W', W] @ src [H, W, C] -> [H, W', C] batched
    matmul, then vertical weights [W', H] contract -> [W', C].
    FLOPs: H' * (H*W'*W*C*2): huge; only viable on small levels. Included
    to measure MXU-vs-gather crossover.
    """
    n, h, w, c = src.shape
    n2, ho, wo, _ = coords.shape
    x = coords[..., 0]
    y = coords[..., 1]
    # interpolation weight matrices (linear hat functions)
    xs = jnp.arange(w, dtype=src.dtype)
    ys = jnp.arange(h, dtype=src.dtype)
    # Wx[n, y', x', x] = hat(x - sx)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - xs))
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - ys))
    # hb[n, y', x', c] = sum_y Wy * (sum_x Wx * src)
    hb = jnp.einsum("nijx,nyxc->nijyc", Wx, src)
    out = jnp.einsum("nijy,nijyc->nijc", Wy, hb)
    return out


VARIANTS = {
    "baseline_4gather": lambda s, c: gs_baseline(s, c),
    "patch4_1gather": gs_patch4,
    "pairx_2gather": gs_pairx,
}


def timeit(fn, src, coords, reps=32):
    """Delta-workload timing: one jitted program chains K applications of
    ``fn`` via fori_loop (output shape == input shape for these warps), so
    per-call dispatch through the relay is paid once; K-chained minus
    2-chained divided by K-2 cancels all fixed overhead (CLAUDE.md)."""

    def chained(k):
        @jax.jit
        def prog(s, c):
            return jax.lax.fori_loop(0, k, lambda i, a: fn(a, c), s)

        return prog

    p2, pk = chained(2), chained(reps)
    float(jnp.sum(p2(src, coords)))  # compile + handshake
    float(jnp.sum(pk(src, coords)))

    def timed(prog):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            float(jnp.sum(prog(src, coords)))
            best = min(best, time.perf_counter() - t0)
        return best

    ta = timed(p2)
    tb = timed(pk)
    return (tb - ta) / (reps - 2)


def main():
    shapes = [
        ("L2 (96x320x64) N2", (2, 96, 320, 64)),
        ("L3 (48x160x64) N2", (2, 48, 160, 64)),
        ("L4 (24x80x96) N2", (2, 24, 80, 96)),
        ("L2 consec N16", (16, 96, 320, 64)),
    ]
    rng = np.random.RandomState(0)
    print(f"devices: {jax.devices()}")
    for label, (n, h, w, c) in shapes:
        src = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        flow = jnp.asarray(
            (rng.rand(n, h, w, 2).astype(np.float32) - 0.5) * 10.0
        )
        coords = flow_to_coords(flow)
        ref = np.asarray(gs_baseline(src, coords))
        for name, fn in VARIANTS.items():
            jfn = jax.jit(fn)
            out = np.asarray(jfn(src, coords))
            err = float(np.abs(out - ref).max())
            dt = timeit(jfn, src, coords)
            print(
                f"{label:22s} {name:18s} {dt*1e3:8.3f} ms  maxerr={err:.2e}"
            )
        # bf16 variants (cast back so the fori_loop carry dtype is stable)
        for name, fn in [("baseline", gs_baseline), ("patch4", gs_patch4),
                         ("pairx", gs_pairx)]:
            jfn = lambda s, c, _f=fn: _f(s, c).astype(jnp.bfloat16)
            dt = timeit(jfn, src.astype(jnp.bfloat16), coords)
            print(f"{label:22s} {name + '_bf16':18s} {dt*1e3:8.3f} ms")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
