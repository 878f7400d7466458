"""Precision control for geometry/solver code.

TPU matmuls default to bfloat16 passes; that is the right trade for the
convolutional networks but corrupts multi-view geometry (rotations drift off
the SO(3) manifold at ~1e-3, RANSAC inlier counts become unstable). Every
public geometry/solver entry point is wrapped with :func:`highp` so its
matmuls/einsums run in true float32 regardless of the global default, while
network code keeps the fast path.
"""

import functools

import jax


def highp(fn):
    """Decorator: trace ``fn`` under float32 (highest) matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
