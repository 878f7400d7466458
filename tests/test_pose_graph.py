"""Pose-graph optimization tests."""

import numpy as np

import jax.numpy as jnp

from dfvo_tpu.geometry.lie import so3_exp
from dfvo_tpu.geometry.pose_graph import PoseGraphOptimizer


def make_circle_trajectory(n=12, radius=5.0):
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        T = np.eye(4)
        T[:3, :3] = np.asarray(so3_exp(jnp.array([0, a, 0], jnp.float32)))
        T[:3, 3] = [radius * np.sin(a), 0.0, radius * (1 - np.cos(a))]
        poses.append(T)
    return poses


def test_pose_graph_corrects_drift():
    rng = np.random.RandomState(0)
    gt = make_circle_trajectory()
    n = len(gt)

    # odometry measurements = exact relative poses
    edges = []
    for i in range(n - 1):
        edges.append((i, i + 1, np.linalg.inv(gt[i]) @ gt[i + 1]))
    # loop closure
    edges.append((n - 1, 0, np.linalg.inv(gt[n - 1]) @ gt[0]))

    # drifted initial estimates
    opt = PoseGraphOptimizer()
    for i in range(n):
        noisy = gt[i].copy()
        if i > 0:  # vertex 0 anchors the gauge at ground truth
            noisy[:3, 3] += rng.randn(3) * 0.3
        opt.add_vertex(i, noisy, fixed=(i == 0))
    for i, j, m in edges:
        opt.add_edge((i, j), m)

    opt.optimize(max_iterations=20)

    errs = [
        np.linalg.norm(opt.get_pose(i)[:3, 3] - gt[i][:3, 3]) for i in range(n)
    ]
    assert max(errs) < 0.02, f"max translation error {max(errs)}"


def test_fixed_vertex_stays():
    opt = PoseGraphOptimizer()
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[0, 3] = 2.0  # wrong; measurement says 1.0
    opt.add_vertex(0, T0, fixed=True)
    opt.add_vertex(1, T1)
    m = np.eye(4)
    m[0, 3] = 1.0
    opt.add_edge((0, 1), m)
    opt.optimize(max_iterations=10)
    np.testing.assert_allclose(opt.get_pose(0), T0, atol=1e-6)
    assert abs(opt.get_pose(1)[0, 3] - 1.0) < 1e-3
