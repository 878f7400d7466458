"""SE(3) pose-graph optimization in JAX.

Rebuild of the reference's g2o-based optimizer
(libs/geometry/pose_graph_optimizer.py:4-64 — C++ g2o SparseOptimizer with
BlockSolverSE3 + Levenberg; note it is dead code in the reference, imported
nowhere). Here: a dense Gauss-Newton/Levenberg solver over se(3) tangent
updates, jit-compiled — adequate for the loop-closure-scale graphs a VO
system produces (hundreds of vertices), with the same add_vertex/add_edge/
optimize API shape.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.precision import highp
from .lie import make_se3, se3_inverse, so3_exp, so3_log


def _se3_log(T):
    """[...x4x4] -> [...x6] (ω, v) using the first-order V⁻¹ ≈ I - ½[ω]×
    approximation adequate for small residuals."""
    w = so3_log(T[..., :3, :3])
    t = T[..., :3, 3]
    from .lie import skew

    v = t - 0.5 * jnp.einsum("...ij,...j->...i", skew(w), t)
    return jnp.concatenate([w, v], axis=-1)


def _apply_delta(poses, delta):
    """Left-multiplicative tangent update: T_i <- exp(δ_i) · T_i."""
    R = so3_exp(delta[..., :3])
    T_delta = make_se3(R, delta[..., 3:])
    return jnp.einsum("nij,njk->nik", T_delta, poses)


@highp
def _residuals(poses, edge_i, edge_j, edge_meas_inv):
    """Per-edge se(3) residual log(T_meas⁻¹ · T_i⁻¹ · T_j)."""
    Ti = poses[edge_i]
    Tj = poses[edge_j]
    rel = jnp.einsum("nij,njk->nik", se3_inverse(Ti), Tj)
    err = jnp.einsum("nij,njk->nik", edge_meas_inv, rel)
    return _se3_log(err).reshape(-1)


class PoseGraphOptimizer:
    """add_vertex / add_edge / optimize, mirroring the reference API
    (pose_graph_optimizer.py:14-64)."""

    def __init__(self):
        self._vertices = {}
        self._fixed = set()
        self._edges = []

    def add_vertex(self, vid, pose, fixed=False):
        """pose: [4x4] initial estimate."""
        self._vertices[vid] = np.asarray(pose, np.float64)
        if fixed:
            self._fixed.add(vid)

    def add_edge(self, vertices, measurement, information=None):
        """vertices: (i, j); measurement: [4x4] relative pose T_ij such that
        T_j ≈ T_i · T_ij."""
        i, j = vertices
        self._edges.append((i, j, np.asarray(measurement, np.float64)))

    def get_pose(self, vid):
        return self._vertices[vid]

    def optimize(self, max_iterations=20, damping=1e-6):
        """Dense Levenberg-damped Gauss-Newton over all non-fixed vertices
        (vertex order defines the parameter layout; gauge fixed by the
        ``fixed`` vertices, or vertex 0 when none are marked)."""
        vids = sorted(self._vertices.keys())
        index = {v: k for k, v in enumerate(vids)}
        poses0 = jnp.asarray(
            np.stack([self._vertices[v] for v in vids]), jnp.float32
        )
        fixed = self._fixed or {vids[0]}
        free_mask = jnp.asarray(
            np.array([v not in fixed for v in vids], bool)
        )
        edge_i = jnp.asarray([index[e[0]] for e in self._edges], jnp.int32)
        edge_j = jnp.asarray([index[e[1]] for e in self._edges], jnp.int32)
        meas_inv = jnp.asarray(
            np.stack([np.linalg.inv(e[2]) for e in self._edges]), jnp.float32
        )

        n = len(vids)

        @jax.jit
        def run(poses):
            def gn_step(_, poses):
                def r_of_delta(delta):
                    return _residuals(
                        _apply_delta(poses, delta.reshape(n, 6)),
                        edge_i,
                        edge_j,
                        meas_inv,
                    )

                delta0 = jnp.zeros(n * 6, poses.dtype)
                J = jax.jacfwd(r_of_delta)(delta0)
                r = r_of_delta(delta0)
                # freeze gauge vertices by zeroing their columns
                col_mask = jnp.repeat(free_mask, 6)
                J = J * col_mask[None, :]
                H = J.T @ J + damping * jnp.eye(n * 6, dtype=poses.dtype)
                delta = -jnp.linalg.solve(H, J.T @ r)
                delta = delta * col_mask
                return _apply_delta(poses, delta.reshape(n, 6))

            return jax.lax.fori_loop(0, max_iterations, gn_step, poses)

        poses_opt = np.asarray(run(poses0), np.float64)
        for v in vids:
            self._vertices[v] = poses_opt[index[v]]
        return poses_opt
