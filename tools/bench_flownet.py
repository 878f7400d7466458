"""Microbenchmark: LiteFlowNet chunk-inference variants on the real chip.

The r4 profile (docs/profiles/r4/README.md) attributes ~1.7 ms/frame to
layout seams around the finest-level conv trunks. This probe isolates the
flow network at bench shapes (consecutive mode, chunk 32 -> batch 64 pairs)
and measures env-flag variants of the suspect ops so the seam fixes are
chosen by measurement, not theory:

    base          current shipped configuration
    deconv_ew     DFVO_DECONV_EW=1      upflow/upcorr as elementwise phases
    barrier       DFVO_TRUNK_BARRIER=1  materialize trunk inputs
    ew+barrier    both of the above
    headconv_xla  DFVO_HEADCONV_PALLAS=0
    corr_xla      DFVO_CORR_PALLAS=0

Run: python tools/bench_flownet.py [variant ...] (default: all). Uses
delta-workload timing (CLAUDE.md) to cancel the relay's fixed sync cost.
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

H, W = 192, 640
CHUNK = int(os.environ.get("FLOWNET_CHUNK", "32"))

VARIANTS = {
    "base": {},
    "deconv_ew": {"DFVO_DECONV_EW": "1"},
    "barrier": {"DFVO_TRUNK_BARRIER": "1"},
    "ew+barrier": {"DFVO_DECONV_EW": "1", "DFVO_TRUNK_BARRIER": "1"},
    "headconv_xla": {"DFVO_HEADCONV_PALLAS": "0"},
    "corr_xla": {"DFVO_CORR_PALLAS": "0"},
    "warp_pre_t": {"DFVO_WARP_BUILD": "pre_t"},
    "hx+pre_t": {"DFVO_HEADCONV_PALLAS": "0", "DFVO_WARP_BUILD": "pre_t"},
    "hx+pre_t+bar": {
        "DFVO_HEADCONV_PALLAS": "0",
        "DFVO_WARP_BUILD": "pre_t",
        "DFVO_TRUNK_BARRIER": "1",
    },
    "hx+corrx": {"DFVO_HEADCONV_PALLAS": "0", "DFVO_CORR_PALLAS": "0"},
    "src_barrier": {"DFVO_WARP_SRC_BARRIER": "1"},
    "warp_stack": {"DFVO_WARP_BUILD": "stack"},
    "warp_xonly": {"DFVO_WARP_BUILD": "xonly"},
    "no_unique": {"DFVO_UNIQUE_TABLES": "0"},
    "img_stack": {"DFVO_WARP_BUILD_SMALLC": "stack"},
    "img_pre_t": {"DFVO_WARP_BUILD_SMALLC": "pre_t"},
    "img_xonly": {"DFVO_WARP_BUILD_SMALLC": "xonly"},
    "trunk_mm32": {"DFVO_TRUNK_MM": "32"},
    "trunk_mm64": {"DFVO_TRUNK_MM": "64"},
    "head_pad8": {"DFVO_HEAD_PAD": "8"},
    "head_pad32": {"DFVO_HEAD_PAD": "32"},
    "deconv_pad8": {"DFVO_DECONV_PAD": "8"},
    "hp8+dp8": {"DFVO_HEAD_PAD": "8", "DFVO_DECONV_PAD": "8"},
    "hp32+dp16": {"DFVO_HEAD_PAD": "32", "DFVO_DECONV_PAD": "16"},
}
_ALL_FLAGS = sorted({k for v in VARIANTS.values() for k in v})


def timed_call(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def bench_variant(name, flags, variables, imgs):
    from dfvo_tpu.models import LiteFlowNet

    for k in _ALL_FLAGS:
        os.environ.pop(k, None)
    os.environ.update(flags)

    net = LiteFlowNet()

    # fresh lambda per variant -> fresh jit trace (flags are read at trace
    # time); chain iterations through a scalar so the device serializes them
    @jax.jit
    def step(v, x, t):
        out = net.apply(v, x + t * jnp.zeros((), x.dtype), x,
                        pair_mode="consecutive")
        return jnp.sum(out[1].astype(jnp.float32)) * 1e-12

    def run(k):
        t = jnp.zeros((), imgs.dtype)
        for _ in range(k):
            t = step(variables, imgs, t.astype(imgs.dtype))
        return float(t)  # dependent scalar fetch = the only reliable sync

    t_c0 = time.perf_counter()
    run(1)  # compile + handshake
    compile_s = time.perf_counter() - t_c0
    k1, k2 = 2, 8
    t1 = min(timed_call(run, k1) for _ in range(3))
    t2 = min(timed_call(run, k2) for _ in range(3))
    ms_step = (t2 - t1) / (k2 - k1) * 1e3
    ms_frame = ms_step / CHUNK
    print(
        f"{name:14s} {ms_step:8.2f} ms/step  {ms_frame:6.3f} ms/frame "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )
    return ms_step


def trace_variant(name, flags, variables, imgs, outdir="/tmp/flownet_trace"):
    """Capture an xplane trace of one variant (reuses profile_tpu's parser)."""
    from dfvo_tpu.models import LiteFlowNet
    from tools.profile_tpu import summarize_xplane

    for k in _ALL_FLAGS:
        os.environ.pop(k, None)
    os.environ.update(flags)
    net = LiteFlowNet()

    @jax.jit
    def step(v, x, t):
        out = net.apply(v, x + t * jnp.zeros((), x.dtype), x,
                        pair_mode="consecutive")
        return jnp.sum(out[1].astype(jnp.float32)) * 1e-12

    def run(k):
        t = jnp.zeros((), imgs.dtype)
        for _ in range(k):
            t = step(variables, imgs, t.astype(imgs.dtype))
        return float(t)

    run(1)
    run(3)
    jax.profiler.start_trace(outdir)
    run(3)
    jax.profiler.stop_trace()
    summarize_xplane(outdir, top=60)


def bench_depth():
    """Time the Monodepth2 depth net alone at chunk-batch shapes."""
    from dfvo_tpu.models import Monodepth2Depth

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.rand(CHUNK, H, W, 3).astype(np.float32), jnp.bfloat16
    )
    net = Monodepth2Depth(min_depth=0.1, max_depth=100.0,
                          baseline_multiplier=5.4)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3),
                                                          jnp.bfloat16))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )

    @jax.jit
    def step(v, x, t):
        out = net.apply(v, x + t * jnp.zeros((), x.dtype))
        return jnp.sum(out["depth"].astype(jnp.float32)) * 1e-12

    def run(k):
        t = jnp.zeros((), imgs.dtype)
        for _ in range(k):
            t = step(variables, imgs, t.astype(imgs.dtype))
        return float(t)

    run(1)
    k1, k2 = 2, 8
    t1 = min(timed_call(run, k1) for _ in range(3))
    t2 = min(timed_call(run, k2) for _ in range(3))
    ms_step = (t2 - t1) / (k2 - k1) * 1e3
    print(
        f"depth_net      {ms_step:8.2f} ms/step  {ms_step / CHUNK:6.3f}"
        " ms/frame",
        flush=True,
    )


def main():
    names = sys.argv[1:] or list(VARIANTS)
    trace = False
    if names and names[0] == "--depth":
        bench_depth()
        names = names[1:]
        if not names:
            return
    if names and names[0] == "--trace":
        trace = True
        names = names[1:] or ["base"]
    from dfvo_tpu.models import LiteFlowNet

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.rand(CHUNK + 1, H, W, 3).astype(np.float32), jnp.bfloat16
    )
    net = LiteFlowNet()
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 3), jnp.bfloat16),
        jnp.zeros((1, H, W, 3), jnp.bfloat16),
    )
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )
    for name in names:
        if trace:
            trace_variant(name, VARIANTS[name], variables, imgs)
        else:
            bench_variant(name, VARIANTS[name], variables, imgs)


if __name__ == "__main__":
    main()
