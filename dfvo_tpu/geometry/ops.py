"""Device-side multi-view geometry as pure JAX functions.

Rebuilds the reference's torch warping stack (libs/geometry/backprojection.py,
projection.py, transformation3d.py, reprojection.py, rigid_flow.py) and numpy
ops (libs/geometry/ops_3d.py) as batched, jit-friendly dense/sparse kernels.
Everything is NHWC / [x, y] pixel convention and static-shape.
"""

import jax.numpy as jnp

from ..ops.warp import coords_grid
from ..utils.precision import highp


# ---------------------------------------------------------------------------
# dense image-space ops
# ---------------------------------------------------------------------------

@highp
def backproject_depth(depth, inv_K):
    """Depth map -> homogeneous 3D points in the camera frame.

    Args:
        depth: [NxHxW] depth map.
        inv_K: [Nx3x3] (or [3x3]) inverse intrinsics.

    Returns:
        [NxHxWx4] homogeneous camera-frame points.

    Ref: libs/geometry/backprojection.py:16-67.
    """
    n, h, w = depth.shape
    grid = coords_grid(h, w, depth.dtype)  # [H,W,2] (x, y)
    ones = jnp.ones((h, w, 1), depth.dtype)
    pix = jnp.concatenate([grid, ones], axis=-1)  # [H,W,3]
    inv_K = jnp.broadcast_to(jnp.asarray(inv_K)[..., :3, :3], (n, 3, 3))
    rays = jnp.einsum("nij,hwj->nhwi", inv_K, pix)
    pts = rays * depth[..., None]
    return jnp.concatenate(
        [pts, jnp.ones((n, h, w, 1), depth.dtype)], axis=-1
    )


@highp
def transform_points(points_h, T):
    """Apply [Nx4x4] transforms to [NxHxWx4] homogeneous points."""
    return jnp.einsum("nij,nhwj->nhwi", T, points_h)


@highp
def project_points(points_h, K, eps=1e-7):
    """Homogeneous 3D points -> pixel coordinates.

    Args:
        points_h: [NxHxWx4] camera-frame points.
        K: [Nx3x3] (or [3x3]) intrinsics.

    Returns:
        [NxHxWx2] pixel [x, y] coordinates (unnormalized; the reference's
        Projection layer additionally maps to [-1, 1] for grid_sample —
        our sampler takes pixels directly).

    Ref: libs/geometry/projection.py:15-58.
    """
    n = points_h.shape[0]
    K = jnp.broadcast_to(jnp.asarray(K)[..., :3, :3], (n, 3, 3))
    cam = jnp.einsum("nij,nhwj->nhwi", K, points_h[..., :3])
    return cam[..., :2] / (cam[..., 2:3] + eps)


def reproject(depth, T, K, inv_K):
    """Depth + relative pose -> pixel coordinates of each pixel's
    correspondence in the other view (backproject → transform → project).

    Ref: libs/geometry/reprojection.py:20-56.
    """
    points = backproject_depth(depth, inv_K)
    points_t = transform_points(points, T)
    return project_points(points_t, K)


def rigid_flow(depth, T, K, inv_K):
    """Pose-induced ("rigid") optical flow [NxHxWx2] from depth and relative
    pose. Ref: libs/geometry/rigid_flow.py:17-57 (reprojection → PixToFlow).
    """
    n, h, w = depth.shape
    coords = reproject(depth, T, K, inv_K)
    return coords - coords_grid(h, w, depth.dtype)


# ---------------------------------------------------------------------------
# sparse keypoint ops
# ---------------------------------------------------------------------------

@highp
def unproject_kp(kp, kp_depth, inv_K):
    """Pixel keypoints + depths -> 3D camera-frame points.

    Args:
        kp: [Nx2] pixel [x, y].
        kp_depth: [N] depths.
        inv_K: [3x3].

    Returns:
        [Nx3] 3D points.

    Ref: libs/geometry/ops_3d.py:70-94.
    """
    ones = jnp.ones_like(kp[..., :1])
    pix_h = jnp.concatenate([kp, ones], axis=-1)  # [N,3]
    rays = pix_h @ jnp.asarray(inv_K).T
    return rays * kp_depth[..., None]


@highp
def triangulate_points(kp1, kp2, P1, P2):
    """DLT triangulation of correspondences seen by two projection matrices.

    Solves, per point, the 4x4 homogeneous system built from
    x × (P X) = 0 for both views; the solution is the eigenvector of AᵀA
    with smallest eigenvalue (equivalent to cv2.triangulatePoints' SVD,
    ref libs/geometry/ops_3d.py:44-67, but batched and TPU-friendly:
    a symmetric 4x4 eigendecomposition per point under vmap).

    Args:
        kp1: [Nx2] points in view 1 (normalized camera coords or pixels,
            consistent with P1/P2).
        kp2: [Nx2] points in view 2.
        P1: [3x4] projection matrix of view 1.
        P2: [3x4] projection matrix of view 2.

    Returns:
        [Nx4] homogeneous world points (w = last component, NOT normalized;
        divide by X[..., 3:] to get Euclidean coordinates).
    """
    # rows: x * P[2] - P[0], y * P[2] - P[1] for each view
    def two_rows(kp, P):
        x = kp[..., 0:1]
        y = kp[..., 1:2]
        r1 = x * P[2][None] - P[0][None]  # [N,4]
        r2 = y * P[2][None] - P[1][None]
        return r1, r2

    a1, a2 = two_rows(kp1, P1)
    a3, a4 = two_rows(kp2, P2)
    A = jnp.stack([a1, a2, a3, a4], axis=-2)  # [N,4,4]
    AtA = jnp.einsum("nij,nik->njk", A, A)
    # smallest eigenvector of symmetric AtA: shift-inverted power iteration
    # (solvers/linalg.py) — batched eigh is a sequential TPU custom call
    # that showed up in the round-2 device profile
    from ..solvers.linalg import spd_smallest_eigvec

    return spd_smallest_eigvec(AtA)


@highp
def triangulate_depths(kp1, kp2, T_1w, T_2w):
    """Triangulate and return per-point depths in both camera frames.

    Mirrors the reference's use (E_tracker.py:597-603): kp in *normalized*
    camera coordinates, T_iw the world→camera transforms.

    Returns:
        (X_w [Nx3], z1 [N], z2 [N]) world points and depths in each view.
    """
    X_h = triangulate_points(kp1, kp2, T_1w[:3], T_2w[:3])
    wc = X_h[..., 3:]
    # guard zero homogeneous coords
    wc = jnp.where(jnp.abs(wc) < 1e-12, 1e-12, wc)
    X = X_h[..., :3] / wc
    ones = jnp.ones_like(X[..., :1])
    X_homo = jnp.concatenate([X, ones], axis=-1)
    z1 = (X_homo @ T_1w[:3].T)[..., 2]
    z2 = (X_homo @ T_2w[:3].T)[..., 2]
    return X, z1, z2


def scatter_kp_depth(kp, depth_vals, height, width):
    """Scatter sparse keypoint depths into a dense [HxW] map (zeros
    elsewhere); out-of-bounds keypoints are dropped.

    Ref: libs/geometry/ops_3d.py:15-41 (convert_sparse3D_to_depth).
    """
    xi = jnp.floor(kp[..., 0]).astype(jnp.int32)
    yi = jnp.floor(kp[..., 1]).astype(jnp.int32)
    valid = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    # route invalid writes to a scratch cell
    flat = jnp.where(valid, yi * width + xi, height * width)
    out = jnp.zeros((height * width + 1,), depth_vals.dtype)
    out = out.at[flat].set(jnp.where(valid, depth_vals, 0.0))
    return out[:-1].reshape(height, width)
