"""Bilinear sampling and flow-based warping (XLA gather based).

TPU-native replacement for every `torch.nn.functional.grid_sample` use in the
reference (lite_flow_net.py:28, deep_flow.py:183, depth_consistency.py:106,
hd3_ops.py:47). Convention differences, by design:

* layout is NHWC (TPU-friendly), not NCHW;
* sample coordinates are in *pixel units* ([x, y]), not [-1, 1]-normalized —
  the reference normalizes only so torch can immediately denormalize
  (torch 1.1 grid_sample has align_corners=True semantics, so
  ``x_pix = (x_norm + 1) / 2 * (W - 1)``: working in pixels is exactly
  equivalent and skips two elementwise passes).
"""

import jax.numpy as jnp


def coords_grid(h, w, dtype=jnp.float32):
    """(array, [HxWx2]) pixel grid holding [x, y] per pixel."""
    x = jnp.arange(w, dtype=dtype)
    y = jnp.arange(h, dtype=dtype)
    xv, yv = jnp.meshgrid(x, y)
    return jnp.stack([xv, yv], axis=-1)


def flow_to_coords(flow):
    """Flow ([...xHxWx2], [x, y]) -> absolute sample coordinates (pixels).

    Equivalent of the reference's FlowToPix layer
    (depth/monodepth2/layers.py:193-229) without the [-1,1] normalization.
    """
    h, w = flow.shape[-3], flow.shape[-2]
    return flow + coords_grid(h, w, flow.dtype)


def grid_sample(src, coords, padding_mode="zeros", frame_ids=None):
    """Bilinear sampling of ``src`` at pixel coordinates ``coords``.

    The 'zeros' mode (every hot-path warp) routes to the packed-patch
    single-gather kernel below; 'border' keeps the 4-gather formulation.

    Args:
        src: (array, [NxHxWxC]) source image/feature map.
        coords: (array, [BxH'xW'x2]) sample locations as [x, y] in pixels of
            ``src``'s frame. B == N unless ``frame_ids`` is given.
        padding_mode: 'zeros' (out-of-bounds reads 0) or 'border' (clamped),
            matching torch grid_sample's modes.
        frame_ids: optional (array, [B] int32) mapping each coords batch row
            to a ``src`` frame. Lets several output batch rows sample the
            SAME source frame without materializing duplicate copies of it —
            the scan pipeline's forward+backward pairing over M consecutive
            frames otherwise builds every packed patch table twice
            (2(M-1) batch rows of M unique frames; r5 profile: the L2/L3
            table builds were ~0.66 ms/frame, half of it duplicates).

    Returns:
        (array, [BxH'xW'xC]) sampled values.
    """
    import numpy as _np

    n_out = int(_np.prod(coords.shape[:-1]))
    n_src = src.shape[0] * src.shape[1] * src.shape[2]
    if (
        padding_mode == "zeros"
        and src.shape[1] >= 2
        and src.shape[2] >= 2
        and 8 * n_out > n_src
    ):
        # dense-enough sampling: one wide gather from a packed 2x2-patch
        # table. Profiled crossover (r2): even at 1/4 sampling density
        # (the stride-2 correlation warps) the packed table beats four
        # narrow gathers (0.51 vs 0.65 ms/frame at level 2) — narrow
        # gathers pay the per-row minimum regardless of byte width.
        return _grid_sample_patch4(src, coords, frame_ids)
    # very sparse sampling (keypoint lookups: ~2k of ~100k sites): the
    # full-size patch-table build would dominate — gather only the
    # needed rows
    return _grid_sample_gather4(src, coords, padding_mode, frame_ids)


def _batch_offsets(n, out_shape, frame_ids):
    """Per-output-batch-row source-frame offsets, broadcastable against
    [B, ...spatial] index maps."""
    if frame_ids is None:
        off = jnp.arange(n, dtype=jnp.int32)
    else:
        off = frame_ids.astype(jnp.int32)
    return off.reshape((out_shape[0],) + (1,) * (len(out_shape) - 1))


def _grid_sample_patch4(src, coords, frame_ids=None):
    """Zeros-padding bilinear sampling as ONE gather of 4C-wide rows.

    TPU gathers cost ~(fixed + bytes) *per gathered row* (measured on v5e:
    a 256-byte row costs barely less than a 1KB row — see
    tools/bench_warp.py), so packing the four bilinear corners of each
    sample into one row of a precomputed 2x2-patch table is ~2-4x faster
    than four narrow gathers; the shift-stacked table itself builds at
    plain HBM bandwidth. This is the round-2 replacement for the round-1
    4-gather warp (the single largest item in the device profile,
    CLAUDE.md).

    Zeros-padding correctness without masks: clamp the patch ORIGIN into
    bounds and weight each patch cell by hat(x - cell_x)·hat(y - cell_y),
    hat(d) = max(0, 1 - |d|). Interior samples see the four true corners
    with the standard bilinear weights; for border/outside samples every
    in-range source pixel within distance < 1 of the sample is still inside
    the clamped patch, and every other cell's hat weight is 0 — exactly
    torch grid_sample(padding_mode='zeros', align_corners=True) semantics
    in pixel units (ref lite_flow_net.py:10-28).
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

    import os

    if os.environ.get("DFVO_WARP_SRC_BARRIER", "0") != "0":
        # force the warp source to materialize once: XLA otherwise fuses
        # the producer (e.g. feat_conv's leaky epilogue) into the patch-
        # table build, recomputing it per shifted slice (r4 probe)
        import jax.lax as _lax

        src = _lax.optimization_barrier(src)
    build = os.environ.get("DFVO_WARP_BUILD", "base")
    if build not in ("base", "pre_t", "stack", "xonly"):
        # Fail loudly: a typo'd probe flag would silently measure the base
        # build while the operator believes a variant was probed. NOTE:
        # flags are read at TRACE time — traced step fns cached in
        # dfvo._STEP_FN_CACHE / scan_runner._CHUNK_FN_CACHE will not
        # reflect mid-process flag changes.
        raise ValueError(
            f"DFVO_WARP_BUILD={build!r} not in base|pre_t|stack|xonly"
        )
    if c <= 4:
        # small-channel (image / flow) warps build 4c<=16-wide tables whose
        # minor dim is far below the 128 lanes; XLA lays the base build's
        # concat out transposed and serializes it into a 12-step
        # dynamic-update-slice while loop (~0.2 ms/frame, r5 trace
        # %while.84/85). Probe-gated variant selection, parity-tested in
        # tests/test_geometry.py::TestEnvGatedVariants.
        build_sc = os.environ.get("DFVO_WARP_BUILD_SMALLC", build)
        if build_sc not in ("base", "pre_t", "stack", "xonly"):
            raise ValueError(
                f"DFVO_WARP_BUILD_SMALLC={build_sc!r} not in "
                "base|pre_t|stack|xonly"
            )
        build = build_sc
        if build == "xonly":
            return _grid_sample_xpair(src, coords, frame_ids)
    # flatten the table in [H, W, N, C] order: XLA:TPU convs produce the
    # {3,0,2,1} layout (physically H, W, N, C), so an NHWC-ordered reshape
    # forces a ~125 MB materializing copy per warp at LiteFlowNet level 2.
    # The HWNC transpose+reshape is a layout no-op against conv producers
    # (measured 2.9 ms/step faster in the conv->warp->conv sandwich,
    # bit-identical output; /tmp/bench_warp_layout.py r2)
    # (an NHWC-row-order gather-coalescing variant was probed in r4 and
    # measured WORSE — 6.54 vs 6.06 ms/frame flow-net — the relayout tax
    # beats any coalescing win; see CLAUDE.md r4 notes)
    if build == "pre_t":
        # transpose FIRST, build the table in physical order: same bytes,
        # different fusion structure (r4 probe: the slice+concat build
        # split into two ~2x-slower-than-bandwidth fusions)
        src_t = jnp.transpose(src, (1, 2, 0, 3))  # [h, w, n, c]
        p_flat = jnp.concatenate(
            [
                src_t[:-1, :-1],
                src_t[:-1, 1:],
                src_t[1:, :-1],
                src_t[1:, 1:],
            ],
            axis=-1,
        ).reshape((h - 1) * (w - 1) * n, 4 * c)
    elif build == "stack":
        # r4 probe: stack on a fresh axis + bitcast-reshape instead of a
        # minor-dim concat — the base build's concat splits into a 4-slice
        # kLoop fusion + a pad/concat kLoop fusion (2 full passes over the
        # 4x-amplified table, ~21 ms/step at L2; r4 profile
        # %fusion.4713/%pad_maximum_fusion.47)
        src_t = jnp.transpose(src, (1, 2, 0, 3))  # [h, w, n, c]
        p_flat = jnp.stack(
            [
                src_t[:-1, :-1],
                src_t[:-1, 1:],
                src_t[1:, :-1],
                src_t[1:, 1:],
            ],
            axis=3,
        ).reshape((h - 1) * (w - 1) * n, 4 * c)
    elif build == "xonly":
        # r4 probe: halve the table (x-pairs only, 2x amplification) and
        # gather TWO rows per sample (y0, y0+1). Build writes half the
        # bytes; gathers pay ~+18% on the row-cost model (two 256 B rows
        # vs one 512 B row at L2 features).
        return _grid_sample_xpair(src, coords, frame_ids)
    else:
        patches = jnp.concatenate(
            [
                src[:, :-1, :-1, :],
                src[:, :-1, 1:, :],
                src[:, 1:, :-1, :],
                src[:, 1:, 1:, :],
            ],
            axis=-1,
        )  # [n, h-1, w-1, 4c]
        p_flat = jnp.transpose(patches, (1, 2, 0, 3)).reshape(
            (h - 1) * (w - 1) * n, 4 * c
        )
    batch_off = _batch_offsets(n, out_shape, frame_ids)
    # idx is in-bounds by construction (y0c/x0c clipped above), so
    # mode='clip' is a no-op on the index fusion; jnp.take's default
    # 'fill' mode instead adds a compare+select pass over the full
    # gathered table (~1 GB/step at LiteFlowNet level 2, r3 trace)
    idx = (y0c * (w - 1) + x0c) * n + batch_off
    if len(out_shape) == 3:
        # Dense image-grid sampling: enumerate gather rows in (H, W, N)
        # order and hand the result back with a (N, H, W) transpose whose
        # *physical* layout is the conv-native [H, W, N, C] ({3,0,2,1}).
        # XLA:TPU convolutions natively produce/consume that layout
        # (r2b finding, CLAUDE.md), so the warped map enters the NetE
        # trunk without a relayout copy — NHWC-ordered gather rows were
        # anchoring {3,2,1,0} into the trunk and forcing copies around
        # every downstream conv (round-3 trace; clean-context trunk
        # measured 15.5 vs ~50 ms/step in-model).
        idx_t = jnp.transpose(idx, (1, 2, 0)).reshape(-1)
        g = jnp.take(p_flat, idx_t, axis=0, mode="clip").reshape(
            out_shape[1:] + (out_shape[0], 4 * c)
        )
        wt = [
            jnp.transpose(wk, (1, 2, 0, 3))
            for wk in (w00, w10, w01, w11)
        ]
        out = (
            g[..., 0 * c : 1 * c] * wt[0]
            + g[..., 1 * c : 2 * c] * wt[1]
            + g[..., 2 * c : 3 * c] * wt[2]
            + g[..., 3 * c : 4 * c] * wt[3]
        )
        return jnp.transpose(out, (2, 0, 1, 3))
    idx = idx.reshape(-1)
    g = jnp.take(
        p_flat, idx, axis=0, mode="clip"
    ).reshape(out_shape + (4 * c,))
    return (
        g[..., 0 * c : 1 * c] * w00
        + g[..., 1 * c : 2 * c] * w10
        + g[..., 2 * c : 3 * c] * w01
        + g[..., 3 * c : 4 * c] * w11
    )


def _grid_sample_xpair(src, coords, frame_ids=None):
    """Zeros-mode bilinear sampling from an x-pair table with two gathers
    (probe variant: see DFVO_WARP_BUILD=xonly in _grid_sample_patch4)."""
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

    src_t = jnp.transpose(src, (1, 2, 0, 3))  # [h, w, n, c]
    p2_flat = jnp.concatenate(
        [src_t[:, :-1], src_t[:, 1:]], axis=-1
    ).reshape(h * (w - 1) * n, 2 * c)
    batch_off = _batch_offsets(n, out_shape, frame_ids)
    idx0 = (y0c * (w - 1) + x0c) * n + batch_off
    row_stride = (w - 1) * n
    if len(out_shape) == 3:
        idx0_t = jnp.transpose(idx0, (1, 2, 0)).reshape(-1)
        g0 = jnp.take(p2_flat, idx0_t, axis=0, mode="clip").reshape(
            out_shape[1:] + (out_shape[0], 2 * c)
        )
        g1 = jnp.take(
            p2_flat, idx0_t + row_stride, axis=0, mode="clip"
        ).reshape(out_shape[1:] + (out_shape[0], 2 * c))
        wt = [
            jnp.transpose(wk, (1, 2, 0, 3))
            for wk in (w00, w10, w01, w11)
        ]
        out = (
            g0[..., :c] * wt[0]
            + g0[..., c:] * wt[1]
            + g1[..., :c] * wt[2]
            + g1[..., c:] * wt[3]
        )
        return jnp.transpose(out, (2, 0, 1, 3))
    idx0 = idx0.reshape(-1)
    g0 = jnp.take(p2_flat, idx0, axis=0, mode="clip").reshape(
        out_shape + (2 * c,)
    )
    g1 = jnp.take(p2_flat, idx0 + row_stride, axis=0, mode="clip").reshape(
        out_shape + (2 * c,)
    )
    return (
        g0[..., :c] * w00
        + g0[..., c:] * w10
        + g1[..., :c] * w01
        + g1[..., c:] * w11
    )


def _grid_sample_gather4(src, coords, padding_mode="zeros", frame_ids=None):
    """Reference 4-gather bilinear sampling (kept for 'border' mode, for
    degenerate 1-pixel sources, and as the parity oracle for the packed
    kernel in tests)."""
    n, h, w, c = src.shape
    out_shape = coords.shape[:-1]
    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    if padding_mode == "zeros":
        # validity per corner, before clamping
        def corner_mask(xi, yi):
            return (
                (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            ).astype(src.dtype)

        masks = [
            corner_mask(x0, y0),
            corner_mask(x1, y0),
            corner_mask(x0, y1),
            corner_mask(x1, y1),
        ]
    elif padding_mode == "border":
        masks = [1.0, 1.0, 1.0, 1.0]
    else:
        raise ValueError(f"unknown padding_mode: {padding_mode}")

    x0c = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1c = jnp.clip(x1, 0, w - 1).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1c = jnp.clip(y1, 0, h - 1).astype(jnp.int32)

    # gather four corners from the globally flattened array: a flat 1-D
    # jnp.take lowers to a ~2.5x faster TPU gather than batched
    # take_along_axis (measured at LiteFlowNet level-2 sizes). [H,W,N,C]
    # table order matches the {3,0,2,1} conv layout (see _grid_sample_patch4)
    src_flat = jnp.transpose(src, (1, 2, 0, 3)).reshape(h * w * n, c)
    batch_off = _batch_offsets(n, out_shape, frame_ids)

    def gather(yi, xi):
        idx = ((yi * w + xi) * n + batch_off).reshape(-1)
        return jnp.take(
            src_flat, idx, axis=0, mode="clip"
        ).reshape(out_shape + (c,))

    v00 = gather(y0c, x0c)
    v10 = gather(y0c, x1c)
    v01 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    w00 = (wy0 * wx0 * masks[0])[..., None]
    w10 = (wy0 * wx1 * masks[1])[..., None]
    w01 = (wy1 * wx0 * masks[2])[..., None]
    w11 = (wy1 * wx1 * masks[3])[..., None]

    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def warp_image_by_flow(img, flow, padding_mode="zeros", frame_ids=None):
    """Backward-warp ``img`` by ``flow`` ([BxHxWx2]): output pixel p takes
    the value of ``img`` at p + flow(p). ``img`` is [BxHxWxC], or unique
    source frames [MxHxWxC] addressed per batch row via ``frame_ids``
    (see grid_sample).

    Equivalent of the reference's `Backward` warp (lite_flow_net.py:10-28).
    """
    return grid_sample(
        img, flow_to_coords(flow), padding_mode=padding_mode,
        frame_ids=frame_ids,
    )
