"""Local cost-volume (correlation) op — the framework's hot native kernel.

TPU-native replacement for the reference's two inline CUDA/cupy kernels:
LiteFlowNet's ±3-window correlation
(libs/deep_models/flow/lite_flow_net/correlation.py:11-236) and HD3's
±4-window variant (flow/hd3/models/correlation.py), parameterized by window
and stride.

Semantics (pinned against the CUDA source, correlation.py:38-105):
    out[n, y, x, (dy+D)·(2D+1)+(dx+D)] =
        mean_c f1[n, y·s, x·s, c] · f2[n, y·s+dy·s, x·s+dx·s, c]
with f2 zero-padded, D = max_displacement, s = stride, and output spatial
size ceil(H/s) x ceil(W/s). Channel order is dy-major, matching the CUDA
kernel's ``top_channel % 7`` = x displacement.

Two implementations:
* ``correlation_xla`` — shift-multiply-reduce, pure XLA; differentiable;
  used on CPU and as the reference for the Pallas kernel.
* ``correlation_pallas`` — fused Pallas TPU kernel (one VMEM pass over a
  haloed f2 tile; see pallas_corr.py) with a custom VJP that reuses the XLA
  backward. Selected automatically on TPU via ``correlation``.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_disp", "stride"))
def correlation_xla(f1, f2, max_disp=3, stride=1):
    """Cost volume via (2D+1)² shifted elementwise products (XLA fuses the
    shifts into a small number of passes).

    Args:
        f1, f2: [N x H x W x C] feature maps (NHWC).
        max_disp: D, displacement window radius (static).
        stride: output subsampling and displacement step (static).

    Returns:
        [N x ceil(H/s) x ceil(W/s) x (2D+1)²] correlation volume.
    """
    n, h, w, c = f1.shape
    d = max_disp
    pad = d * stride
    f1s = f1[:, ::stride, ::stride, :]
    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            y0 = pad + dy * stride
            x0 = pad + dx * stride
            f2s = f2p[:, y0 : y0 + h : stride, x0 : x0 + w : stride, :]
            outs.append(jnp.mean(f1s * f2s, axis=-1))
    return jnp.stack(outs, axis=-1)


def correlation(f1, f2, max_disp=3, stride=1, use_pallas=None):
    """Dispatch to the Pallas kernel on TPU, XLA elsewhere.

    ``use_pallas`` forces the choice (tests exercise both paths).
    """
    if use_pallas is None:
        import os

        use_pallas = (
            os.environ.get("DFVO_CORR_PALLAS", "1") != "0"
            and f1.ndim == 4
            and any(d.platform == "tpu" for d in jax.devices())
        )
    if use_pallas:
        # VMEM sizing (whole-item vs row-banded kernel) is handled inside
        # correlation_pallas itself (pallas_corr.py)
        from .pallas_corr import correlation_pallas

        try:
            return correlation_pallas(f1, f2, max_disp=max_disp, stride=stride)
        except Exception:
            # Pallas unavailable (e.g. CPU interpreter quirks): XLA fallback
            return correlation_xla(f1, f2, max_disp=max_disp, stride=stride)
    return correlation_xla(f1, f2, max_disp=max_disp, stride=stride)
