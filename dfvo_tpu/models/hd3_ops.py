"""HD3 discrete-distribution ops (NHWC).

Rebuild of libs/deep_models/flow/hd3/models/hd3_ops.py:12-246: masked flow
warping, motion-vector <-> probability-density conversions (the core of
HD3's discrete distribution decoding), and vector resizing.
"""

import jax
import jax.numpy as jnp

from ..ops.warp import flow_to_coords, grid_sample


def flow_warp(x, flo, mul=True):
    """Backward-warp ``x`` [N x H x W x C] by ``flo`` [N x H x W x 2] with
    border padding; out-of-bounds pixels are zeroed via a warped validity
    mask (ref hd3_ops.py:12-48)."""
    coords = flow_to_coords(flo)
    out = grid_sample(x, coords, padding_mode="border")
    mask = grid_sample(jnp.ones_like(x), coords, padding_mode="zeros")
    mask = jnp.where(mask < 0.9999, 0.0, 1.0)
    if mul:
        return out * mask
    return out, mask


def disp2flow(disp):
    """[N x H x W x 1] disparity -> [N x H x W x 2] flow with zero dy."""
    return jnp.concatenate([disp, jnp.zeros_like(disp)], axis=-1)


def vector2density(vect, c, dim):
    """Point motion estimate -> bilinear probability density over the
    (2c+1)² (flow) or 2c+1 (stereo) support (ref hd3_ops.py:51-60,
    _flow2distribution :142-190)."""
    if dim == 2:
        return _flow2distribution(vect, c)
    dist = _flow2distribution(disp2flow(vect), c)
    return dist[..., c * (2 * c + 1) : (c + 1) * (2 * c + 1)]


def _flow2distribution(flo, c):
    n, h, w, _ = flo.shape
    d = 2 * c + 1
    flo = jnp.clip(flo, -c, c)
    x = flo[..., 0]
    y = flo[..., 1]
    x0 = jnp.floor(x)
    x1 = x0 + 1
    y0 = jnp.floor(y)
    y1 = y0 + 1

    def safe(v):
        return jnp.clip(v, -c, c)

    wt_x0 = (x1 - x) * (x0 == safe(x0))
    wt_x1 = (x - x0) * (x1 == safe(x1))
    wt_y0 = (y1 - y) * (y0 == safe(y0))
    wt_y1 = (y - y0) * (y1 == safe(y1))

    out = jnp.zeros((n, h, w, d * d), flo.dtype)

    def put(out, xs, ys, wt):
        label = ((safe(ys) + c) * d + safe(xs) + c).astype(jnp.int32)
        return out + jax.nn.one_hot(label, d * d, dtype=flo.dtype) * wt[..., None]

    out = put(out, x0, y0, wt_x0 * wt_y0)
    out = put(out, x1, y0, wt_x1 * wt_y0)
    out = put(out, x0, y1, wt_x0 * wt_y1)
    out = put(out, x1, y1, wt_x1 * wt_y1)
    return out


def _prob2cornerflow(prob, normalize=True):
    """Best 2x2 corner block of the d x d probability grid + corner flows
    (ref hd3_ops.py:193-219)."""
    if normalize:
        prob = jax.nn.softmax(prob, axis=-1)
    n, h, w, C = prob.shape
    d = int(round(C**0.5))
    pr = prob.reshape(n, h, w, d, d)  # [..., dy, dx]
    # 2x2 average pooling over the support grid
    avg = (
        pr[..., :-1, :-1] + pr[..., :-1, 1:] + pr[..., 1:, :-1] + pr[..., 1:, 1:]
    ) / 4.0
    flat = avg.reshape(n, h, w, (d - 1) * (d - 1))
    idx = jnp.argmax(flat, axis=-1)
    r = idx // (d - 1)
    col = idx % (d - 1)
    ind = r * d + col  # top-left corner in d x d coordinates

    def gather(offset):
        return jnp.take_along_axis(prob, (ind + offset)[..., None], axis=-1)[
            ..., 0
        ]

    def ind2flow(i):
        return jnp.stack(
            [(i % d - d // 2).astype(prob.dtype), (i // d - d // 2).astype(prob.dtype)],
            axis=-1,
        )

    corners = [0, 1, d, d + 1]  # tl, tr, bl, br
    cor_prob = [gather(o) for o in corners]
    cor_flow = [ind2flow(ind + o) for o in corners]
    return cor_prob, cor_flow


def density2vector(prob, dim, normalize=True):
    """Probability density -> expected motion vector via the best-corner
    expectation (ref hd3_ops.py:63-74, :222-235)."""
    if dim == 1:
        prob = _disp_prob2flow_prob(prob, normalize)
        flow = density2vector(prob, 2, normalize=False)
        return flow[..., 0:1]
    cor_prob, cor_flow = _prob2cornerflow(prob, normalize)
    s = cor_prob[0] + cor_prob[1] + cor_prob[2] + cor_prob[3]
    pn = [p / jnp.maximum(s, 1e-12) for p in cor_prob]
    out_x = cor_flow[1][..., 0] - pn[0] - pn[2]
    out_y = cor_flow[2][..., 1] - pn[0] - pn[1]
    return jnp.stack([out_x, out_y], axis=-1)


def _disp_prob2flow_prob(prob, normalize=True):
    if normalize:
        prob = jax.nn.softmax(prob, axis=-1)
    n, h, w, d = prob.shape
    pad = jnp.zeros((n, h, w, d * (d - 1) // 2), prob.dtype)
    return jnp.concatenate([pad, prob, pad], axis=-1)


def prob_gather(prob, normalize=True, dim=2):
    """Confidence map: 4x the best 2x2-averaged probability
    (ref hd3_ops.py:77-96)."""
    if normalize:
        prob = jax.nn.softmax(prob, axis=-1)
    if dim == 1:
        prob = _disp_prob2flow_prob(prob, False)
    n, h, w, C = prob.shape
    d = int(round(C**0.5))
    pr = prob.reshape(n, h, w, d, d)
    avg = (
        pr[..., :-1, :-1] + pr[..., :-1, 1:] + pr[..., 1:, :-1] + pr[..., 1:, 1:]
    ) / 4.0
    return 4.0 * jnp.max(avg.reshape(n, h, w, -1), axis=-1, keepdims=True)


def resize_dense_vector(vec, des_height, des_width):
    """Bilinear resize of a motion field with magnitude rescaling
    (ref hd3_ops.py:128-139; align_corners=True)."""
    from .layers import resize_bilinear

    n, h, w, c = vec.shape
    out = resize_bilinear(vec, des_height, des_width, align_corners=True)
    if c == 1:
        return out * (des_width / w)
    scale = jnp.array([des_width / w, des_height / h], vec.dtype)
    return out * scale
