"""Persistent XLA compilation cache.

The fused per-frame step takes minutes to compile on a cold TPU toolchain;
caching compiled executables on disk makes every run after the first start
in seconds. Used by apis/run.py and bench.py.
"""

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir=None):
    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
