"""ctypes bindings for the native C++ frame loader (native/frame_loader.cpp).

Compiles the shared library on first use (cached beside the source) and
exposes a :class:`FramePrefetcher` that decodes + resizes frames on a C++
worker pool AHEAD of the tracking loop — the async data-loader runtime
component replacing the reference's synchronous per-frame cv2 reads
(dfvo.py:289-297). Falls back to a Python-threaded cv2 prefetcher when the
toolchain or libraries are unavailable.
"""

import ctypes
import os
import queue
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "frame_loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libframe_loader.so")

_lib = None
_lib_tried = False


def _load_library():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-o", _SO, _SRC, "-ljpeg", "-lpng", "-pthread",
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.fl_create.restype = ctypes.c_void_p
        lib.fl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fl_next.restype = ctypes.c_int
        lib.fl_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.fl_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class NativeFramePrefetcher:
    """Ordered async frame stream backed by the C++ worker pool."""

    def __init__(self, paths, out_h, out_w, n_threads=3, queue_depth=8):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native frame loader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h, self._w = out_h, out_w
        self._handle = lib.fl_create(
            arr, len(self._paths), out_h, out_w, n_threads, queue_depth
        )
        self._buf = ctypes.create_string_buffer(out_h * out_w * 3)

    def next(self):
        """-> (index, [H x W x 3] uint8 RGB) or (None, None) at end."""
        idx = self._lib.fl_next(self._handle, self._buf)
        if idx == -1:
            return None, None
        if idx == -2:
            raise IOError("native frame loader: decode failed")
        img = np.frombuffer(self._buf.raw, np.uint8).reshape(
            self._h, self._w, 3
        )
        return idx, img.copy()

    def close(self):
        if self._handle:
            self._lib.fl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class ThreadedFramePrefetcher:
    """cv2-based fallback with the same interface (cv2 releases the GIL
    during imdecode, so decode still overlaps device compute)."""

    def __init__(self, paths, out_h, out_w, n_threads=2, queue_depth=8):
        self._paths = paths
        self._h, self._w = out_h, out_w
        self._q = queue.Queue(maxsize=queue_depth)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import cv2

        for i, p in enumerate(self._paths):
            img = cv2.imread(p, 1)
            if img is None:
                self._q.put((i, None))
                continue
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (self._w, self._h))
            self._q.put((i, img))
        self._q.put((None, None))

    def next(self):
        idx, img = self._q.get()
        if idx is not None and img is None:
            raise IOError(f"cannot read image: {self._paths[idx]}")
        return idx, img

    def close(self):
        pass


def make_prefetcher(paths, out_h, out_w, prefer_native=True, **kw):
    if prefer_native:
        try:
            return NativeFramePrefetcher(paths, out_h, out_w, **kw)
        except Exception:
            pass
    return ThreadedFramePrefetcher(paths, out_h, out_w)
