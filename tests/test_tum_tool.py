"""TUM toolkit tests: conversion-suite parity with the reference's vendored
pose_evaluation_utils (ref tools/evaluation/tum_tool/pose_evaluation_utils.py
:83-382) plus round-trip self-consistency. Parity tests import the reference
module directly (repo convention — never copy reference code)."""

import importlib.util
import os

import numpy as np
import pytest

from dfvo_tpu.evaluation.tum_tool import (
    dump_pose_seq_TUM,
    euler2mat,
    euler2quat,
    mat2euler,
    pose_vec_to_mat,
    quat2mat,
    rot2quat,
)

REF_PEU = (
    "/root/reference/tools/evaluation/tum_tool/pose_evaluation_utils.py"
)


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_peu", REF_PEU)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(
    not os.path.isfile(REF_PEU), reason="reference toolkit not mounted"
)

ANGLE_SETS = [
    (0.0, 0.0, 0.0),
    (0.3, -0.2, 0.9),
    (-1.2, 0.7, -0.4),
    (3.0, -1.4, 2.2),
    (0.01, 1.55, -0.02),  # near-gimbal (cos y ~ 0)
]


class TestConversionsRoundTrip:
    @pytest.mark.parametrize("z,y,x", ANGLE_SETS)
    def test_euler_mat_roundtrip(self, z, y, x):
        R = euler2mat(z, y, x)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        z2, y2, x2 = mat2euler(R)
        np.testing.assert_allclose(
            euler2mat(z2, y2, x2), R, atol=1e-9
        )

    @pytest.mark.parametrize("z,y,x", ANGLE_SETS)
    def test_euler2quat_consistent_with_rot2quat(self, z, y, x):
        q = euler2quat(z, y, x)
        q2 = rot2quat(euler2mat(z, y, x))
        # quaternions are sign-ambiguous
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-9)
        np.testing.assert_allclose(
            quat2mat(q), euler2mat(z, y, x), atol=1e-12
        )

    def test_degrees_mode(self):
        np.testing.assert_allclose(
            euler2mat(90.0, 0.0, 0.0, isRadian=False),
            euler2mat(np.pi / 2),
            atol=1e-12,
        )
        q = euler2quat(90.0, 0.0, 0.0, isRadian=False)
        np.testing.assert_allclose(q, euler2quat(np.pi / 2), atol=1e-12)

    def test_mat2euler_xyz_sequence(self):
        # seq='xyz' decomposes M = Rz @ Ry @ Rx (returned as (z, y, x))
        ztrue, ytrue, xtrue = 0.4, -0.3, 0.8
        Rz = euler2mat(ztrue, 0, 0)
        Ry = euler2mat(0, ytrue, 0)
        Rx = euler2mat(0, 0, xtrue)
        M = Rz @ Ry @ Rx
        z, y, x = mat2euler(M, seq="xyz")
        np.testing.assert_allclose(
            euler2mat(z, 0, 0) @ euler2mat(0, y, 0) @ euler2mat(0, 0, x),
            M,
            atol=1e-9,
        )
        np.testing.assert_allclose([z, y, x], [ztrue, ytrue, xtrue],
                                   atol=1e-9)

    def test_mat2euler_unknown_seq_raises(self):
        with pytest.raises(ValueError, match="Sequence"):
            mat2euler(np.eye(3), seq="zxz")

    def test_pose_vec_to_mat(self):
        vec = np.array([1.0, -2.0, 3.0, 0.2, -0.5, 0.9])
        T = pose_vec_to_mat(vec)
        np.testing.assert_allclose(T[:3, 3], vec[:3])
        np.testing.assert_allclose(
            T[:3, :3], euler2mat(vec[5], vec[4], vec[3]), atol=1e-12
        )
        assert np.allclose(T[3], [0, 0, 0, 1])


@needs_ref
class TestReferenceParity:
    @pytest.mark.parametrize("z,y,x", ANGLE_SETS)
    def test_euler2mat_matches_reference(self, z, y, x):
        ref = _load_ref()
        np.testing.assert_allclose(
            euler2mat(z, y, x), ref.euler2mat(z, y, x), atol=1e-12
        )

    @pytest.mark.parametrize("z,y,x", ANGLE_SETS)
    def test_mat2euler_matches_reference(self, z, y, x):
        ref = _load_ref()
        R = euler2mat(z, y, x)
        ours = np.array(mat2euler(R))
        theirs = np.array(ref.mat2euler(R))
        # compare reconstructed rotations (angle triples may differ in the
        # gimbal-degenerate case while encoding the same rotation)
        np.testing.assert_allclose(
            euler2mat(*ours), euler2mat(*theirs), atol=1e-7
        )

    @pytest.mark.parametrize("z,y,x", ANGLE_SETS)
    def test_euler2quat_matches_reference(self, z, y, x):
        ref = _load_ref()
        q, qr = euler2quat(z, y, x), np.array(ref.euler2quat(z, y, x))
        if np.dot(q, qr) < 0:
            qr = -qr
        np.testing.assert_allclose(q, qr, atol=1e-12)

    def test_quat_converters_match_reference(self):
        ref = _load_ref()
        rng = np.random.RandomState(3)
        for _ in range(5):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            np.testing.assert_allclose(
                quat2mat(q), ref.quat2mat(q), atol=1e-12
            )
            R = quat2mat(q)
            qa, qb = np.array(rot2quat(R)), np.array(ref.rot2quat(R))
            if np.dot(qa, qb) < 0:
                qb = -qb
            np.testing.assert_allclose(qa, qb, atol=1e-9)

    def test_pose_vec_to_mat_matches_reference(self):
        ref = _load_ref()
        rng = np.random.RandomState(4)
        for _ in range(5):
            vec = np.concatenate(
                [rng.randn(3) * 5, rng.uniform(-1.5, 1.5, 3)]
            )
            np.testing.assert_allclose(
                pose_vec_to_mat(vec), ref.pose_vec_to_mat(vec), atol=1e-12
            )

    def test_dump_pose_seq_matches_reference(self, tmp_path):
        ref = _load_ref()
        rng = np.random.RandomState(5)
        poses = [
            np.concatenate([rng.randn(3), rng.uniform(-1.2, 1.2, 3)])
            for _ in range(6)
        ]
        times = [1311868164.0 + 0.1 * i for i in range(6)]
        ours_f, ref_f = tmp_path / "ours.txt", tmp_path / "ref.txt"
        dump_pose_seq_TUM(ours_f, poses, times)
        ref.dump_pose_seq_TUM(str(ref_f), poses, times)
        ours = np.loadtxt(ours_f)
        theirs = np.loadtxt(ref_f)
        # quaternion sign may legitimately flip per line; compare as
        # rotations + translations + timestamps
        np.testing.assert_allclose(ours[:, :4], theirs[:, :4], atol=1e-5)
        for a, b in zip(ours, theirs):
            Ra = quat2mat([a[7], a[4], a[5], a[6]])
            Rb = quat2mat([b[7], b[4], b[5], b[6]])
            np.testing.assert_allclose(Ra, Rb, atol=1e-5)
