"""KITTI raw OXTS (GPS/IMU) ground-truth pose synthesis.

Rebuild of libs/general/kitti_raw_utils.py:28-143: Mercator projection of
lat/lon to meters, roll/pitch/yaw to rotation, relative pose to frame 0
re-expressed in the camera convention (x right, y down, z forward).
"""

import os
from glob import glob

import numpy as np

EARTH_RADIUS = 6378137.0

# GPS/IMU (x fwd, y left, z up) -> camera (x right, y down, z fwd)
_IMU_TO_CAM = np.array(
    [
        [0.0, -1.0, 0.0],
        [0.0, 0.0, -1.0],
        [1.0, 0.0, 0.0],
    ]
)


def _rotx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _read_oxts_line(path):
    with open(path, "r") as f:
        vals = f.readline().split()
    return [float(v) for v in vals]


def _gps_pose(vals, scale):
    lat, lon, alt, roll, pitch, yaw = vals[:6]
    tx = scale * lon * np.pi * EARTH_RADIUS / 180.0
    ty = scale * EARTH_RADIUS * np.log(np.tan((90.0 + lat) * np.pi / 360.0))
    T = np.eye(4)
    T[:3, :3] = _rotz(yaw) @ _roty(pitch) @ _rotx(roll)
    T[:3, 3] = [tx, ty, alt]
    return T


def generate_pose(oxts_dir, frame_idx, do_flip=False):
    """Absolute camera-convention pose of ``frame_idx`` w.r.t. frame 0
    (ref kitti_raw_utils.py:28-76). ``do_flip`` mirrors the pose for
    horizontally flipped sequences."""
    v0 = _read_oxts_line(os.path.join(oxts_dir, f"{0:010d}.txt"))
    vi = _read_oxts_line(os.path.join(oxts_dir, f"{frame_idx:010d}.txt"))
    scale = np.cos(v0[0] * np.pi / 180.0)
    T0 = _gps_pose(v0, scale)
    Ti = _gps_pose(vi, scale)
    T_01 = np.linalg.inv(T0) @ Ti
    C = np.eye(4)
    C[:3, :3] = _IMU_TO_CAM
    pose = C @ T_01 @ np.linalg.inv(C)
    if do_flip:
        pose[:3, :3] = _flip_rotation(pose[:3, :3])
        pose[0, 3] = -pose[0, 3]
    return pose


def _flip_rotation(R):
    """Mirror a rotation about the image x-axis (ref kitti_raw_utils.py:79-102)."""
    theta_x = np.arctan2(R[2, 1], R[2, 2])
    theta_y = np.arctan2(-R[2, 0], np.linalg.norm([R[2, 1], R[2, 2]]))
    theta_z = np.arctan2(R[1, 0], R[0, 0])
    return (
        np.linalg.inv(_rotz(theta_z)) @ np.linalg.inv(_roty(theta_y)) @ _rotx(theta_x)
    )


def load_poses_from_oxts(oxts_dir):
    """{frame: [4x4]} poses for a whole raw drive (ref utils.py:181-198)."""
    n = len(glob(os.path.join(oxts_dir, "*.txt")))
    if n == 0:
        raise FileNotFoundError(f"Wrong path is given: [{oxts_dir}]")
    return {i: generate_pose(oxts_dir, i) for i in range(n)}
