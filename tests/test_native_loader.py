"""Native C++ frame loader tests: build, ordered streaming, cv2 parity."""

import os

import cv2
import numpy as np
import pytest

from dfvo_tpu.utils.native_loader import (
    NativeFramePrefetcher,
    ThreadedFramePrefetcher,
    _load_library,
    make_prefetcher,
)


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = (rng.rand(120, 200, 3) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 2)
        if i % 2 == 0:
            p = root / f"{i:06d}.jpg"
            cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        else:
            p = root / f"{i:06d}.png"
            cv2.imwrite(str(p), img)
        paths.append(str(p))
    return paths


def test_library_builds():
    assert _load_library() is not None, "native loader failed to build"


def test_native_matches_cv2(frames):
    h, w = 60, 100
    native = NativeFramePrefetcher(frames, h, w, n_threads=3)
    for i, path in enumerate(frames):
        idx, img = native.next()
        assert idx == i
        ref = cv2.cvtColor(cv2.imread(path, 1), cv2.COLOR_BGR2RGB)
        ref = cv2.resize(ref, (w, h))
        # small rounding differences between our bilinear and cv2's
        # fixed-point implementation
        diff = np.abs(img.astype(int) - ref.astype(int))
        assert np.mean(diff) < 2.0, f"frame {i}: mean abs diff {diff.mean()}"
        assert np.percentile(diff, 99) <= 6
    idx, img = native.next()
    assert idx is None
    native.close()


def test_threaded_fallback(frames):
    pf = ThreadedFramePrefetcher(frames, 60, 100)
    seen = []
    while True:
        idx, img = pf.next()
        if idx is None:
            break
        seen.append(idx)
        assert img.shape == (60, 100, 3)
    assert seen == list(range(6))


def test_make_prefetcher_returns_working_stream(frames):
    pf = make_prefetcher(frames, 48, 80)
    idx, img = pf.next()
    assert idx == 0 and img.shape == (48, 80, 3)
    pf.close()
