"""Dataset-loader tests over synthetic on-disk fixtures."""

import os

import cv2
import numpy as np
import pytest

from dfvo_tpu.evaluation.tum_tool import (
    associate,
    compute_ate,
    read_file_list,
)
from dfvo_tpu.utils import AttrDict


def base_cfg(**overrides):
    cfg = AttrDict(
        {
            "dataset": "kitti_odom",
            "seq": "00",
            "image": {"height": 96, "width": 320, "ext": "jpg"},
            "depth": {"depth_src": None},
            "directory": {
                "img_seq_dir": "",
                "gt_pose_dir": None,
                "depth_dir": None,
            },
        }
    )
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


class TestTumTool:
    def test_associate(self):
        first = {0.0: ["a"], 1.0: ["b"], 2.0: ["c"]}
        second = {0.01: ["x"], 1.5: ["y"], 2.005: ["z"]}
        matches = associate(first, second, 0, 0.02)
        assert (0.0, 0.01) in matches
        assert (2.0, 2.005) in matches
        assert all(m[0] != 1.0 for m in matches)  # 1.5 too far

    def test_read_file_list(self, tmp_path):
        p = tmp_path / "rgb.txt"
        p.write_text("# comment\n1.0 rgb/1.png\n2.0 rgb/2.png\n")
        lst = read_file_list(str(p))
        assert lst[1.0] == ["rgb/1.png"]
        assert len(lst) == 2

    def test_compute_ate_identity(self):
        rng = np.random.RandomState(0)
        traj = {}
        P = np.eye(4)
        for i in range(50):
            P = P.copy()
            P[:3, 3] += rng.randn(3) * 0.1
            traj[float(i)] = P
        # rigidly transformed copy: ATE must be ~0 after Horn alignment
        T = np.eye(4)
        T[:3, 3] = [5.0, -2.0, 1.0]
        moved = {k: T @ v for k, v in traj.items()}
        rmse, aligned = compute_ate(traj, moved)
        assert rmse < 1e-9


@pytest.fixture
def tum_fixture(tmp_path):
    """Minimal TUM RGB-D sequence directory."""
    seq = tmp_path / "fr1_seq"
    rgb = seq / "rgb"
    depth = seq / "depth"
    rgb.mkdir(parents=True)
    depth.mkdir()
    rng = np.random.RandomState(0)
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(5):
        t = 100.0 + i * 0.1
        img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(rgb / f"{t:.6f}.jpg"), img)
        d = (rng.rand(48, 64) * 5000).astype(np.uint16)
        cv2.imwrite(str(depth / f"{t + 0.005:.6f}.png"), d)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.jpg")
        depth_lines.append(f"{t + 0.005:.6f} depth/{t + 0.005:.6f}.png")
        gt_lines.append(
            f"{t + 0.002:.6f} {0.1 * i:.3f} 0 0 0 0 0 1"
        )
    (seq / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (seq / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (seq / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return tmp_path


class TestTumLoader:
    def test_loads_and_syncs(self, tum_fixture):
        from dfvo_tpu.datasets.tum import TUM

        cfg = base_cfg()
        cfg.dataset = "tum-1"
        cfg.seq = "fr1_seq"
        cfg.directory.img_seq_dir = str(tum_fixture)
        cfg.directory.gt_pose_dir = str(tum_fixture)
        ds = TUM(cfg)
        assert len(ds) == 5
        t0 = ds.get_timestamp(0)
        img = ds.get_image(t0)
        assert img.shape == (96, 320, 3)
        # gt poses re-based to the first synchronized frame
        np.testing.assert_allclose(ds.gt_poses[0], np.eye(4), atol=1e-9)
        assert abs(ds.gt_poses[1][0, 3] - 0.1) < 1e-6
        # intrinsics rescaled from 640x480
        assert abs(ds.cam_intrinsics.fx - 517.3 * 320 / 640) < 1e-6

    def test_tum_traj_format(self, tum_fixture, tmp_path):
        from dfvo_tpu.datasets.tum import TUM
        from dfvo_tpu.geometry.camera import SE3

        cfg = base_cfg()
        cfg.dataset = "tum-1"
        cfg.seq = "fr1_seq"
        cfg.directory.img_seq_dir = str(tum_fixture)
        cfg.directory.gt_pose_dir = str(tum_fixture)
        ds = TUM(cfg)
        poses = {i: SE3() for i in range(len(ds))}
        out = tmp_path / "traj.txt"
        ds.save_result_traj(str(out), poses)
        lines = out.read_text().strip().split("\n")
        assert len(lines) == 5
        assert len(lines[0].split(" ")) == 8  # tum format: t + xyz + quat


class TestAdelaideLoader:
    def test_template_loader(self, tmp_path):
        from dfvo_tpu.datasets.adelaide import Adelaide

        seq = tmp_path / "seq1"
        seq.mkdir()
        rng = np.random.RandomState(1)
        for i in range(3):
            cv2.imwrite(
                str(seq / f"{i:06d}.jpg"),
                (rng.rand(256, 832, 3) * 255).astype(np.uint8),
            )
        np.savetxt(
            str(seq / "cam.txt"),
            np.array([[500.0, 0, 416], [0, 500, 128], [0, 0, 1]]),
        )
        cfg = base_cfg()
        cfg.dataset = "adelaide1"
        cfg.seq = "seq1"
        cfg.directory.img_seq_dir = str(tmp_path)
        ds = Adelaide(cfg)
        assert len(ds) == 3
        assert ds.get_image(0).shape == (96, 320, 3)
        # fx rescaled by 320/832
        assert abs(ds.cam_intrinsics.fx - 500 * 320 / 832) < 1e-6


class TestRobotcarSdk:
    def test_interpolate_vo_poses(self, tmp_path):
        from dfvo_tpu.datasets.robotcar_sdk import interpolate_vo_poses

        # constant forward motion, 3 relative steps
        rows = ["source_timestamp,destination_timestamp,x,y,z,roll,pitch,yaw"]
        ts = [1000, 2000, 3000, 4000]
        for i in range(1, 4):
            rows.append(f"{ts[i]},{ts[i-1]},1.0,0.0,0.0,0.0,0.0,0.0")
        vo = tmp_path / "vo.csv"
        vo.write_text("\n".join(rows) + "\n")
        poses = interpolate_vo_poses(str(vo), [1000, 1500, 3000], 1000)
        np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)
        assert abs(poses[1][0, 3] - 0.5) < 1e-6  # halfway interpolated
        assert abs(poses[2][0, 3] - 2.0) < 1e-6

    def test_slerp_rotation(self):
        from dfvo_tpu.datasets.robotcar_sdk import _slerp

        q0 = np.array([1.0, 0, 0, 0])
        ang = 0.4
        q1 = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)])
        qm = _slerp(q0, q1, 0.5)
        expected = np.array([np.cos(ang / 4), 0, 0, np.sin(ang / 4)])
        np.testing.assert_allclose(qm, expected, atol=1e-9)
