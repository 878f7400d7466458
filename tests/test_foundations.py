"""Tests for config system, SE3/Intrinsics, and pose/intrinsics IO."""

import os

import numpy as np
import pytest

from dfvo_tpu.geometry import SE3, Intrinsics
from dfvo_tpu.utils import AttrDict, ConfigLoader
from dfvo_tpu.utils.io import (
    image_grid,
    load_poses_from_txt,
    preprocess_depth,
    quat2mat,
    rot2quat,
    save_traj,
    skew,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_YML = os.path.join(REPO, "options/examples/default_configuration.yml")
REF_GT_DIR = "/root/reference/dataset/kitti_odom/gt_poses"


def test_attrdict_nested_access():
    d = AttrDict({"a": {"b": {"c": 1}}, "lst": [{"x": 2}]})
    assert d.a.b.c == 1
    assert d.lst[0].x == 2
    d.a.b.c = 5
    assert d["a"]["b"]["c"] == 5
    plain = d.to_dict()
    assert type(plain["a"]) is dict


def test_config_merge_default_and_custom(tmp_path):
    custom = tmp_path / "custom.yml"
    custom.write_text("seq: '09'\ne_tracker:\n    ransac:\n        repeat: 3\n")
    loader = ConfigLoader()
    cfg = loader.merge_cfg([DEFAULT_YML, str(custom)])
    # overridden values
    assert cfg.seq == "09"
    assert cfg.e_tracker.ransac.repeat == 3
    # untouched siblings survive the recursive merge
    assert cfg.e_tracker.ransac.reproj_thre == 0.2
    assert cfg.kp_selection.local_bestN.num_bestN == 2000
    # annotated dump marks changes
    out = tmp_path / "merged.yml"
    loader.save_cfg([DEFAULT_YML, str(custom)], str(out))
    text = out.read_text()
    assert "|CHANGED|" in text


def test_se3_properties():
    pose = SE3()
    R = quat2mat([np.cos(0.2), 0, np.sin(0.2), 0])
    t = np.array([1.0, 2.0, 3.0])
    pose.R = R
    pose.t = t
    np.testing.assert_allclose(pose.pose[:3, :3], R)
    np.testing.assert_allclose(pose.pose[:3, 3], t)
    np.testing.assert_allclose(pose.inv_pose @ pose.pose, np.eye(4), atol=1e-12)
    # composition
    p2 = pose @ pose
    np.testing.assert_allclose(p2.pose, pose.pose @ pose.pose)


def test_intrinsics_mat_inv():
    K = Intrinsics([320.0, 96.0, 370.0, 371.0])  # [cx, cy, fx, fy]
    np.testing.assert_allclose(K.mat @ K.inv_mat, np.eye(3), atol=1e-12)
    assert K.mat[0, 2] == 320.0 and K.mat[1, 1] == 371.0


def test_quat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        v = rng.randn(3)
        angle = np.linalg.norm(v)
        axis = v / angle
        q = np.array(
            [np.cos(angle / 2), *(np.sin(angle / 2) * axis)]
        )
        R = quat2mat(q)
        q2 = rot2quat(R)
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-9)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_skew_is_cross_product():
    a, b = np.array([1.0, -2.0, 0.5]), np.array([0.3, 4.0, -1.0])
    np.testing.assert_allclose(skew(a) @ b, np.cross(a, b))


@pytest.mark.skipif(not os.path.isdir(REF_GT_DIR), reason="no reference GT")
def test_pose_txt_roundtrip(tmp_path):
    poses = load_poses_from_txt(os.path.join(REF_GT_DIR, "10.txt"))
    assert len(poses) > 1000
    # all valid rotations
    P = poses[0]
    np.testing.assert_allclose(P, np.eye(4), atol=1e-6)
    txt = tmp_path / "out.txt"
    save_traj(str(txt), poses, format="kitti")
    reloaded = load_poses_from_txt(str(txt))
    for k in list(poses)[:50]:
        np.testing.assert_allclose(reloaded[k], poses[k], atol=1e-9)


def test_preprocess_depth_crop_and_range():
    depth = np.ones((10, 20)) * 5.0
    depth[0, 0] = 100.0
    out = preprocess_depth(depth, [[0.3, 1], [0, 1]], [0, 50])
    assert out[0, 0] == 0.0  # cropped rows zeroed
    assert out[2, 5] == 0.0
    assert out[3, 5] == 5.0
    depth2 = np.ones((10, 20)) * 60.0
    out2 = preprocess_depth(depth2, [[0, 1], [0, 1]], [0, 50])
    assert np.all(out2 == 0.0)


def test_image_grid():
    g = image_grid(3, 4)
    assert g.shape == (3, 4, 2)
    assert g[2, 3, 0] == 3 and g[2, 3, 1] == 2  # [x, y] ordering


def test_compilation_cache_atomic_put_and_healing_get(tmp_path):
    """Concurrent-process hardening of the persistent compile cache
    (utils/cache.py): entries appear atomically (no partially-written
    file is ever visible to a concurrent reader — partial reads
    segfaulted xdist workers inside XLA's executable deserializer), and
    unreadable entries are evicted and reported as misses instead of
    failing every later run."""
    import os

    from dfvo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache(str(tmp_path / "cache"))

    from jax._src.lru_cache import LRUCache

    c = LRUCache(str(tmp_path / "plain"), max_size=-1)
    c.put("k", b"hello")
    assert c.get("k") == b"hello"
    leftovers = [p for p in (tmp_path / "plain").iterdir()
                 if p.name.endswith(".tmp")]
    assert not leftovers, "atomic put must not leave temp files"

    import jax
    from jax._src import compilation_cache as cc
    from jax._src import xla_bridge

    backend = xla_bridge.get_backend()
    cache = cc._get_cache(backend)
    key = f"dfvo-test-corrupt-{os.getpid()}"
    cache.put(key, b"definitely not a zstd-compressed executable")
    out = cc.get_executable_and_time(key, None, backend, jax.devices()[:1])
    assert out == (None, None)
    assert cache.get(key) is None, "corrupt entry should be evicted"

    # put_executable_and_time must not re-serialize a program another
    # worker already persisted: executable.serialize() costs seconds per
    # big program and has been observed to segfault rarely on this
    # XLA:CPU build, so the skip-if-present check runs FIRST.
    class _Boom:
        def serialize(self):
            raise AssertionError("serialize called despite existing entry")

    key2 = f"dfvo-test-present-{os.getpid()}"
    cache.put(key2, b"already persisted")
    cc.put_executable_and_time(key2, "m", _Boom(), backend, 5)  # no raise
    with pytest.raises(Exception):
        # missing entry delegates to the real writer, which serializes
        cc.put_executable_and_time(
            f"dfvo-test-absent-{os.getpid()}", "m", _Boom(), backend, 5
        )
