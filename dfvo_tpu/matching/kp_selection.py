"""Correspondence (keypoint) selection as fixed-shape device kernels.

Rebuild of /root/reference/libs/matching/kp_selection.py — the paper's key
contribution (forward-backward flow-consistency keypoint selection). The
reference loops over a 10x10 grid of image cells in Python, running
numpy argpartition per cell (kp_selection.py:127-173, the hot loop marked in
SURVEY.md §3.2). Here every method is a single fixed-shape JAX computation:

* cells are materialized as a [n_cells x max_cell_size] view by STATIC
  slicing (gather_cells_view — cells are axis-aligned rectangles, so no
  per-pixel gather is needed), with a matching static index table mapping
  view slots back to flat pixel indices;
* per-cell best-n is k rounds of masked argmin-extraction over the view
  (cheaper than top_k's full sort on TPU, same stable selection);
* outputs are fixed-size [N x 2] keypoint arrays plus validity masks
  (padding slots carry ``valid=False``), so downstream RANSAC never sees a
  dynamic shape.

Cell geometry matches the reference exactly, including its off-by-one: the
slice ``[int(h/R*r) : int(h/R*(r+1)) - 1]`` *excludes* the last row/column
of every cell and the image border (kp_selection.py:129-133).
"""

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _cell_geometry(h, w, num_row, num_col):
    """Reference cell bounds (including its off-by-one, see module
    docstring) plus the padded per-cell view shape."""
    y_bounds = tuple(
        (int(h / num_row * r), int(h / num_row * (r + 1)) - 1)
        for r in range(num_row)
    )
    x_bounds = tuple(
        (int(w / num_col * c), int(w / num_col * (c + 1)) - 1)
        for c in range(num_col)
    )
    hc = max(y1 - y0 for y0, y1 in y_bounds)
    wc = max(x1 - x0 for x0, x1 in x_bounds)
    return y_bounds, x_bounds, hc, wc


@functools.lru_cache(maxsize=None)
def cell_index_table(h, w, num_row, num_col):
    """Static [n_cells x (Hc*Wc)] table of flat pixel indices per cell in
    the *padded view* layout produced by :func:`gather_cells_view`, padded
    with -1 where a cell is smaller than Hc x Wc. Raster order within each
    cell (needed by the uniform variant of opt_rigid_flow_kp).

    Returns NUMPY (not jnp): the result is lru-cached and may first be
    requested inside a jit trace — a cached jnp constant would be a leaked
    tracer in every later trace."""
    y_bounds, x_bounds, hc, wc = _cell_geometry(h, w, num_row, num_col)
    table = np.full((num_row * num_col, hc * wc), -1, dtype=np.int32)
    for r, (y0, y1) in enumerate(y_bounds):
        for c, (x0, x1) in enumerate(x_bounds):
            ys, xs = np.mgrid[y0 : y0 + hc, x0 : x0 + wc]
            flat = ys * w + xs
            valid = (ys < y1) & (xs < x1)
            cell = np.where(valid, flat, -1)
            table[r * num_col + c] = cell.ravel()
    return table


def gather_cells_view(values2d, h, w, num_row, num_col):
    """[H x W] map -> [n_cells x (Hc*Wc)] per-cell view by static slicing.

    Replaces the flat index gather (``values[table]``): a gather of ~120k
    1-element rows cost 0.85 ms/frame on v5e (gathers pay per row — see
    ops/warp.py), while cells are axis-aligned rectangles whose bounds are
    static, so 2x(num_row+num_col) static slice/pad/stack ops produce the
    same view at plain bandwidth. Pad slots hold garbage (neighboring
    pixels) and MUST be masked by the caller via ``table >= 0`` — the same
    contract the gather-based view had.
    """
    y_bounds, x_bounds, hc, wc = _cell_geometry(h, w, num_row, num_col)
    rows = []
    for y0, y1 in y_bounds:
        sl = values2d[y0 : y0 + hc]
        if sl.shape[0] < hc:  # bottom cells: pad reads past the image
            sl = jnp.pad(sl, ((0, hc - sl.shape[0]), (0, 0)))
        rows.append(sl)
    stacked = jnp.stack(rows)  # [R, Hc, W]
    cols = []
    for x0, x1 in x_bounds:
        sl = stacked[:, :, x0 : x0 + wc]
        if sl.shape[2] < wc:
            sl = jnp.pad(sl, ((0, 0), (0, 0), (0, wc - sl.shape[2])))
        cols.append(sl)
    view = jnp.stack(cols, axis=1)  # [R, C, Hc, Wc]
    return view.reshape(num_row * num_col, hc * wc)


class KPSelectionSpec:
    """Static configuration for keypoint selection (shapes, thresholds)."""

    def __init__(self, h, w, num_row=10, num_col=10, num_bestN=2000):
        self.h = h
        self.w = w
        self.num_row = num_row
        self.num_col = num_col
        self.num_bestN = num_bestN
        self.n_per_cell = math.floor(num_bestN / (num_row * num_col))
        self.table = cell_index_table(h, w, num_row, num_col)


def _gather_cells(spec, values2d):
    """Per-cell [n_cells x max_cell] view of a [H x W] map; padding slots
    hold garbage and must be masked by the caller via ``table >= 0``."""
    return gather_cells_view(
        values2d, spec.h, spec.w, spec.num_row, spec.num_col
    )


def _grid_xy(table, w):
    idx = jnp.clip(table, 0, None)
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    return x, y


def _select_best_per_cell(score_cells, valid_cells, k):
    """Per-cell smallest-k scores among valid entries.

    Implemented as k rounds of argmin-extraction instead of ``lax.top_k``:
    XLA lowers top_k to a full bitonic sort of the [n_cells x cell_size]
    score table, which the round-2 device profile measured at 0.85 ms/frame
    — k (=N/cells, typically 20) sequential masked argmin reductions are
    ~an order of magnitude cheaper and produce the SAME selection with the
    same stable lowest-index tie-breaking.

    Returns (local_idx [n_cells x k], sel_valid [n_cells x k]).
    """
    masked = jnp.where(valid_cells, score_cells, jnp.inf)
    n_cells = masked.shape[0]
    rows = jnp.arange(n_cells)

    def body(carry, _):
        scores = carry
        j = jnp.argmin(scores, axis=1)  # first minimal index per cell
        v = scores[rows, j]
        scores = scores.at[rows, j].set(jnp.inf)
        return scores, (j, v)

    _, (idx_T, val_T) = jax.lax.scan(body, masked, None, length=k)
    local_idx = idx_T.T  # [n_cells x k]
    sel_valid = jnp.isfinite(val_T.T)
    return local_idx, sel_valid


def _kp_outputs(spec, flow, table, local_idx, sel_valid):
    """Turn per-cell selections into flat kp1/kp2 arrays + validity."""
    sel_flat_idx = jnp.take_along_axis(
        jnp.clip(table, 0, None), local_idx, axis=1
    ).reshape(-1)
    sel_valid = sel_valid.reshape(-1)
    x = (sel_flat_idx % spec.w).astype(flow.dtype)
    y = (sel_flat_idx // spec.w).astype(flow.dtype)
    kp1 = jnp.stack([x, y], axis=-1)
    flow_flat = flow.reshape(-1, 2)
    kp2 = kp1 + flow_flat[sel_flat_idx]
    return kp1, kp2, sel_valid


@functools.partial(jax.jit, static_argnames=("spec", "score_method"))
def local_bestN(
    spec: KPSelectionSpec,
    flow,
    flow_diff,
    thre=0.1,
    score_method="flow",
    depth_diff=None,
    depth_diff_thre=0.05,
):
    """Best-N keypoints from uniformly divided regions
    (ref kp_selection.py:74-200).

    Args:
        spec: static KPSelectionSpec (cell table, N).
        flow: [H x W x 2] forward flow (ref view -> cur view).
        flow_diff: [H x W] forward-backward flow inconsistency.
        thre: flow-consistency threshold (cfg.kp_selection.local_bestN.thre).
        score_method: 'flow' | 'flow_ratio' (static).
        depth_diff: optional [H x W] depth inconsistency (depth_consistency
            option); selections additionally require depth_diff < threshold.

    Returns:
        dict with ``kp1`` [N x 2], ``kp2`` [N x 2], ``valid`` [N],
        ``good_kp_found`` (scalar bool: both insufficient-keypoint checks,
        kp_selection.py:121-125 & :175-179), ``fb_flow_mask`` [H x W].
    """
    table = spec.table
    pad_mask = table >= 0
    fd_cells = _gather_cells(spec, flow_diff)

    if score_method == "flow":
        score_cells = fd_cells
    elif score_method == "flow_ratio":
        mag = jnp.linalg.norm(flow, axis=-1)
        score_cells = fd_cells / jnp.maximum(_gather_cells(spec, mag), 1e-12)
    else:
        raise ValueError(f"unknown score_method: {score_method}")

    valid_cells = (score_cells < thre) & pad_mask
    if depth_diff is not None:
        dd_cells = _gather_cells(spec, depth_diff)
        valid_cells &= dd_cells < depth_diff_thre

    local_idx, sel_valid = _select_best_per_cell(
        score_cells, valid_cells, spec.n_per_cell
    )
    kp1, kp2, valid = _kp_outputs(spec, flow, table, local_idx, sel_valid)

    # insufficient-keypoint case 1: too few sub-threshold pixels overall
    enough_pixels = jnp.sum(flow_diff < thre) >= spec.num_bestN * 0.1
    # case 2: too few regions contribute any keypoint
    good_regions = jnp.sum(jnp.any(sel_valid, axis=1))
    diverse = good_regions >= spec.num_row * spec.num_col * 0.1

    fb_mask = (
        flow_diff
        if score_method == "flow"
        else flow_diff / jnp.maximum(jnp.linalg.norm(flow, axis=-1), 1e-12)
    )
    return {
        "kp1": kp1,
        "kp2": kp2,
        "valid": valid,
        "good_kp_found": enough_pixels & diverse,
        "fb_flow_mask": fb_mask,
    }


@functools.partial(jax.jit, static_argnames=("num_bestN",))
def bestN_flow_kp(flow, flow_diff, num_bestN=2000):
    """Global best-N by flow inconsistency (ref kp_selection.py:33-71)."""
    h, w, _ = flow.shape
    fd_flat = flow_diff.reshape(-1)
    _, idx = jax.lax.top_k(-fd_flat, num_bestN)
    x = (idx % w).astype(flow.dtype)
    y = (idx // w).astype(flow.dtype)
    kp1 = jnp.stack([x, y], axis=-1)
    kp2 = kp1 + flow.reshape(-1, 2)[idx]
    return {
        "kp1": kp1,
        "kp2": kp2,
        "valid": jnp.ones(num_bestN, bool),
        "good_kp_found": jnp.array(True),
        "fb_flow_mask": flow_diff,
    }


def sampled_kp_indices(h, w, crop, num_kp):
    """Host-side uniform keypoint index list (ref keypoint_sampler.py:52-74);
    returns flat indices into the *cropped* grid plus the crop offsets."""
    y0, y1 = int(crop[0][0] * h), int(crop[0][1] * h)
    x0, x1 = int(crop[1][0] * w), int(crop[1][1] * w)
    total = (y1 - y0) * (x1 - x0) - 1
    kp_list = np.linspace(0, total, num_kp).astype(np.int64)
    cw = x1 - x0
    xs = (kp_list % cw + x0).astype(np.float32)
    ys = (kp_list // cw + y0).astype(np.float32)
    return np.stack([xs, ys], axis=-1)


@jax.jit
def sampled_kp(kp1_fixed, flow):
    """Gather kp2 = kp1 + flow at the fixed uniform kp1 positions
    (ref kp_selection.py:327-378)."""
    h, w, _ = flow.shape
    idx = (
        kp1_fixed[:, 1].astype(jnp.int32) * w + kp1_fixed[:, 0].astype(jnp.int32)
    )
    kp2 = kp1_fixed + flow.reshape(-1, 2)[idx]
    return {
        "kp1": kp1_fixed,
        "kp2": kp2,
        "valid": jnp.ones(kp1_fixed.shape[0], bool),
        "good_kp_found": jnp.array(True),
    }


@functools.partial(jax.jit, static_argnames=("spec", "score_method"))
def opt_rigid_flow_kp(
    spec: KPSelectionSpec,
    flow,
    flow_diff,
    rigid_flow_diff,
    rigid_thre=5.0,
    opt_thre=0.1,
    score_method="opt_flow",
):
    """Keypoints consistent with BOTH forward-backward optical flow and the
    pose-induced rigid flow (ref kp_selection.py:203-324). Returns both the
    best-scoring and the uniformly-strided variants, as the reference does
    (used by iterative kp refinement and iterative scale recovery).
    """
    table = spec.table
    pad_mask = table >= 0
    fd_cells = _gather_cells(spec, flow_diff)
    rd_cells = _gather_cells(spec, rigid_flow_diff)
    valid_cells = (rd_cells < rigid_thre) & (fd_cells < opt_thre) & pad_mask

    if score_method == "rigid_flow":
        score_cells = rd_cells
    elif score_method == "opt_flow":
        score_cells = fd_cells
    else:
        raise ValueError(f"unknown score_method: {score_method}")

    k = spec.n_per_cell
    # best variant
    local_idx, sel_valid = _select_best_per_cell(score_cells, valid_cells, k)
    kp1_b, kp2_b, valid_b = _kp_outputs(spec, flow, table, local_idx, sel_valid)

    # uniform variant: every (count//k)-th valid pixel, in raster order
    # (ref kp_selection.py:277-284)
    order = jnp.argsort(~valid_cells, axis=1, stable=True)  # valid first
    count = jnp.sum(valid_cells, axis=1)
    num_to_pick = jnp.minimum(count, k)
    step = jnp.where(num_to_pick > 0, count // jnp.maximum(num_to_pick, 1), 1)
    pos = jnp.arange(k)[None, :] * step[:, None]
    pos = jnp.minimum(pos, jnp.maximum(count - 1, 0)[:, None])
    uniform_idx = jnp.take_along_axis(order, pos, axis=1)
    uniform_valid = jnp.arange(k)[None, :] < num_to_pick[:, None]
    kp1_u, kp2_u, valid_u = _kp_outputs(
        spec, flow, table, uniform_idx, uniform_valid
    )

    return {
        "kp1_best": kp1_b,
        "kp2_best": kp2_b,
        "valid_best": valid_b,
        "kp1_uniform": kp1_u,
        "kp2_uniform": kp2_u,
        "valid_uniform": valid_u,
        "rigid_flow_mask": rigid_flow_diff,
    }
