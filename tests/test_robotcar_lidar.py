"""RobotCar LiDAR/radar utility tests on synthetic fixtures."""

import numpy as np

from dfvo_tpu.datasets.robotcar_lidar import (
    load_radar,
    load_velodyne_binary,
    load_velodyne_raw,
    radar_polar_to_cartesian,
    velodyne_raw_to_pointcloud,
)


def test_velodyne_binary_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    ptcld = rng.rand(4, 100).astype(np.float32)
    p = tmp_path / "123.bin"
    ptcld.T.reshape(-1)  # layout check only
    ptcld.astype(np.float32).tofile(str(p))
    back = load_velodyne_binary(str(p))
    np.testing.assert_allclose(back, ptcld)


def test_velodyne_raw_to_pointcloud_geometry():
    # single column of returns at fixed range, azimuth 0 -> points lie on
    # the y<0 half-plane with elevation-determined z
    ranges = np.full((32, 1), 10.0)
    intensities = np.full((32, 1), 7.0)
    angles = np.zeros((1, 1))
    ptcld = velodyne_raw_to_pointcloud(ranges, intensities, angles)
    assert ptcld.shape[0] == 4 and ptcld.shape[1] == 32
    np.testing.assert_allclose(ptcld[0], 0.0, atol=1e-9)  # x = sin(0)*..
    assert np.all(ptcld[1] < 0)  # y = -cos(0) * xy
    assert np.all(ptcld[3] == 7.0)
    r = np.sqrt(ptcld[0] ** 2 + ptcld[1] ** 2 + (ptcld[2] + 0.090805) ** 2)
    np.testing.assert_allclose(r, 10.0, atol=1e-6)


def test_velodyne_raw_png_parsing(tmp_path):
    import cv2

    rng = np.random.RandomState(1)
    n = 12
    intens = rng.randint(0, 255, (32, n), dtype=np.uint8)
    ranges_u16 = rng.randint(0, 60000, (32, n), dtype=np.uint16)
    angles_u16 = rng.randint(0, 36000, (1, n), dtype=np.uint16)
    ts = np.arange(n, dtype=np.int64)[None]
    img = np.vstack(
        [
            intens,
            ranges_u16.T.copy().view(np.uint8).T.reshape(64, n),
            angles_u16.T.copy().view(np.uint8).T.reshape(2, n),
            ts.T.copy().view(np.uint8).T.reshape(8, n),
        ]
    )
    p = tmp_path / "456.png"
    cv2.imwrite(str(p), img)
    r, i, a, t = load_velodyne_raw(str(p))
    np.testing.assert_allclose(r, ranges_u16 * 0.002)
    np.testing.assert_array_equal(i, intens)
    np.testing.assert_allclose(a, angles_u16 * 2 * np.pi / 36000)
    np.testing.assert_array_equal(t, ts)


def test_radar_load_and_cartesian(tmp_path):
    import cv2

    rng = np.random.RandomState(2)
    A, R = 40, 64
    raw = np.zeros((A, 11 + R), np.uint8)
    raw[:, :8] = (
        np.arange(A, dtype=np.int64)[:, None]
        .copy()
        .view(np.uint8)
        .reshape(A, 8)
    )
    az = (np.arange(A) / A * 5600).astype(np.uint16)
    raw[:, 8:10] = az[:, None].copy().view(np.uint8).reshape(A, 2)
    raw[:, 10] = 255
    raw[:, 11:] = rng.randint(0, 255, (A, R), dtype=np.uint8)
    p = tmp_path / "radar.png"
    cv2.imwrite(str(p), raw)

    ts, azimuths, valid, fft, res = load_radar(str(p))
    assert ts.shape == (A, 1) and fft.shape == (A, R, 1)
    assert valid.all()
    np.testing.assert_allclose(
        azimuths[:, 0],
        np.arange(A) / A * 2 * np.pi,
        atol=2 * np.pi / 5600 + 1e-9,  # one encoder tick of quantization
    )

    cart = radar_polar_to_cartesian(
        azimuths, fft, float(res[0]), 0.25, 64
    )
    assert cart.shape == (64, 64, 1)
    assert np.isfinite(cart).all()
