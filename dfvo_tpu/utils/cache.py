"""Persistent XLA compilation cache.

The fused per-frame step takes minutes to compile on a cold TPU toolchain;
caching compiled executables on disk makes every run after the first start
in seconds. Used by apis/run.py and bench.py.

This module also hardens the cache against concurrent processes (the test
suite runs several pytest-xdist workers against one cache directory):

* jax's ``LRUCache.put`` writes entries with a bare ``write_bytes`` and —
  with eviction disabled — no lock, so a reader can observe a partially
  written entry; ``backend.deserialize_executable`` then SEGFAULTS the
  process on the garbage bytes (observed killing xdist workers mid-suite).
  ``_atomic_put`` writes to a same-directory temp file and ``os.replace``s
  it into place, which is atomic on POSIX: readers see either nothing or
  the full entry.
* ``_healing_get_executable_and_time`` deletes an entry and reports a
  cache miss when decompression/deserialization raises, so an entry that
  was corrupted by an earlier crash or kill heals itself instead of
  failing every subsequent run.
* ``put_executable_and_time`` serializes + compresses the executable
  (seconds of CPU per big program, and ``executable.serialize()`` has
  been observed to SEGFAULT rarely on this XLA:CPU build) *before* the
  LRUCache.put existence check; ``_skipping_put`` checks for an existing
  entry first and returns without serializing when another worker/run
  already persisted the program — faster warm test suites and fewer
  trips through the flaky native serializer.
"""

import logging
import os
import time

import jax

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_PATCHED = False


def _patch_cache_concurrency():
    global _PATCHED
    if _PATCHED:
        return
    _PATCHED = True

    try:
        from jax._src import lru_cache as _lru
    except ImportError:  # pragma: no cover - future jax refactor
        logger.warning("jax lru_cache layout changed; skipping atomic-put patch")
        return

    def _atomic_put(self, key, val):
        if not key:
            raise ValueError("key cannot be empty")
        if self.eviction_enabled and len(val) > self.max_size:
            return
        cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
        if self.eviction_enabled:
            self.lock.acquire(timeout=self.lock_timeout_secs)
        try:
            if cache_path.exists():
                return
            if self.eviction_enabled:
                self._evict_if_needed(additional_size=len(val))
            tmp = self.path / f".{key}.{os.getpid()}.tmp"
            tmp.write_bytes(val)
            os.replace(tmp, cache_path)
            if self.eviction_enabled:
                timestamp = time.time_ns().to_bytes(8, "little")
                atime_path = self.path / f"{key}{_lru._ATIME_SUFFIX}"
                atime_path.write_bytes(timestamp)
        finally:
            if self.eviction_enabled:
                self.lock.release()

    _lru.LRUCache.put = _atomic_put

    try:
        from jax._src import compilation_cache as _cc
        from jax._src import compiler as _compiler
    except ImportError:  # pragma: no cover
        return

    _orig_get = _cc.get_executable_and_time

    def _healing_get(cache_key, compile_options, backend, executable_devices):
        try:
            return _orig_get(
                cache_key, compile_options, backend, executable_devices
            )
        except Exception as e:  # corrupt entry: drop it, report a miss
            logger.warning(
                "evicting unreadable compilation-cache entry %s (%s)",
                cache_key,
                e,
            )
            cache = _cc._get_cache(backend)
            path = getattr(cache, "path", None)
            if path is not None:
                try:
                    from jax._src import lru_cache as _lru

                    (path / f"{cache_key}{_lru._CACHE_SUFFIX}").unlink(
                        missing_ok=True
                    )
                except OSError:
                    pass
            return None, None

    _cc.get_executable_and_time = _healing_get

    _orig_put_exec = _cc.put_executable_and_time

    def _skipping_put(cache_key, module_name, executable, backend,
                      compile_time):
        cache = _cc._get_cache(backend)
        path = getattr(cache, "path", None)
        if path is not None:
            from jax._src import lru_cache as _lru

            if (path / f"{cache_key}{_lru._CACHE_SUFFIX}").exists():
                return  # already persisted by another worker/run
        return _orig_put_exec(
            cache_key, module_name, executable, backend, compile_time
        )

    _cc.put_executable_and_time = _skipping_put
    # compiler.py resolves the function through the module attribute at
    # call time (compilation_cache.get_executable_and_time), so patching
    # the compilation_cache module suffices; patch the compiler's module
    # reference defensively in case of a direct import.
    if hasattr(_compiler, "get_executable_and_time"):  # pragma: no cover
        _compiler.get_executable_and_time = _healing_get


def enable_compilation_cache(cache_dir=None):
    cache_dir = cache_dir or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    _patch_cache_concurrency()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
