"""Oxford RobotCar ingestion utilities.

Rebuild of the vendored RobotCar SDK pieces the reference uses
(tools/evaluation/robotcar/sdk_python/camera_model.py:22-149,
image.py:24, interpolate_poses.py:22-210): LUT-based fisheye
undistortion, Bayer demosaicing (via OpenCV instead of the
colour_demosaicing dependency), and SLERP interpolation of VO/INS poses
to image timestamps.
"""

import os
import re

import cv2
import numpy as np

from ..utils.io import quat2mat


class CameraModel:
    """RobotCar camera model: intrinsics + undistortion lookup table.

    Model files live in ``models_dir``: ``<model>.txt`` holds
    [fx fy cx cy] on the first line, ``<model>_distortion_lut.bin`` holds a
    float64 array [2 x H*W] of per-pixel source coordinates.
    """

    def __init__(self, models_dir, images_dir):
        self.camera = self._camera_name(images_dir)
        model = self._model_name(images_dir)
        intrinsics_path = os.path.join(models_dir, model + ".txt")
        lut_path = os.path.join(models_dir, model + "_distortion_lut.bin")

        vals = np.loadtxt(intrinsics_path)
        self.focal_length = (vals[0][0], vals[0][1])
        self.principal_point = (vals[0][2], vals[0][3])
        # rows 2-4: G_camera_image transform (unused for undistortion)
        self.G_camera_image = vals[1:5] if vals.shape[0] >= 5 else np.eye(4)

        lut = np.fromfile(lut_path, np.double)
        self.lut = lut.reshape((2, lut.size // 2))

    @staticmethod
    def _camera_name(images_dir):
        if "stereo" in images_dir:
            return "stereo"
        for cam in ("mono_left", "mono_right", "mono_rear"):
            if cam in images_dir:
                return cam
        raise ValueError(f"cannot infer camera from path: {images_dir}")

    @staticmethod
    def _model_name(images_dir):
        if "stereo" not in images_dir:
            return CameraModel._camera_name(images_dir)
        if "left" in images_dir:
            return "stereo_wide_left"
        if "right" in images_dir:
            return "stereo_wide_right"
        return "stereo_narrow_left"  # centre camera

    def undistort(self, image):
        """Bilinear LUT undistortion (ref camera_model.py:86-111)."""
        h, w = image.shape[:2]
        map_x = self.lut[0].reshape(h, w).astype(np.float32)
        map_y = self.lut[1].reshape(h, w).astype(np.float32)
        return cv2.remap(image, map_x, map_y, interpolation=cv2.INTER_LINEAR)


_BAYER_PATTERN = {
    "stereo": cv2.COLOR_BayerGB2RGB,  # GBRG sensors on the Bumblebee
    "mono_left": cv2.COLOR_BayerGB2RGB,
    "mono_right": cv2.COLOR_BayerGB2RGB,
    "mono_rear": cv2.COLOR_BayerGB2RGB,
}


def load_image(image_path, model=None):
    """Load a raw RobotCar image: demosaic (+ optional undistortion)
    (ref image.py:24-48, using cv2 demosaicing instead of
    colour_demosaicing)."""
    raw = cv2.imread(image_path, cv2.IMREAD_GRAYSCALE)
    if raw is None:
        raise FileNotFoundError(image_path)
    camera = model.camera if model is not None else "stereo"
    img = cv2.cvtColor(raw, _BAYER_PATTERN[camera])
    if model is not None:
        img = model.undistort(img)
    return img


# ---------------------------------------------------------------------------
# pose interpolation
# ---------------------------------------------------------------------------

def _euler_to_rot(r, p, y):
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _rot_to_quat(R):
    from ..utils.io import rot2quat

    return rot2quat(R)


def _slerp(q0, q1, f):
    dot = np.dot(q0, q1)
    if dot < 0:
        q1 = -q1
        dot = -dot
    dot = min(dot, 1.0)
    theta = np.arccos(dot)
    if theta < 1e-8:
        return q0
    s = np.sin(theta)
    return (np.sin((1 - f) * theta) * q0 + np.sin(f * theta) * q1) / s


def interpolate_poses(abs_poses, pose_timestamps, requested_timestamps, origin_timestamp):
    """SLERP/linear interpolation of absolute poses at requested timestamps,
    re-based to ``origin_timestamp`` (ref interpolate_poses.py:118-210).

    Args:
        abs_poses: list of [4x4] absolute poses.
        pose_timestamps: sorted list of their timestamps.
        requested_timestamps: timestamps to interpolate at.
        origin_timestamp: timestamp whose pose becomes identity.

    Returns:
        list of [4x4] poses (w.r.t. the origin pose).
    """
    pose_timestamps = np.asarray(pose_timestamps, np.int64)
    quats = np.array([_rot_to_quat(P[:3, :3]) for P in abs_poses])
    trans = np.array([P[:3, 3] for P in abs_poses])

    def interp_one(t):
        i = np.searchsorted(pose_timestamps, t)
        if i <= 0:
            return abs_poses[0]
        if i >= len(pose_timestamps):
            return abs_poses[-1]
        t0, t1 = pose_timestamps[i - 1], pose_timestamps[i]
        f = (t - t0) / max(t1 - t0, 1)
        q = _slerp(quats[i - 1], quats[i], f)
        P = np.eye(4)
        P[:3, :3] = quat2mat(q / np.linalg.norm(q))
        P[:3, 3] = (1 - f) * trans[i - 1] + f * trans[i]
        return P

    origin = interp_one(origin_timestamp)
    inv_origin = np.linalg.inv(origin)
    return [inv_origin @ interp_one(t) for t in requested_timestamps]


def interpolate_vo_poses(vo_path, pose_timestamps, origin_timestamp):
    """Chain relative VO poses from ``vo.csv`` into absolute poses, then
    interpolate at image timestamps (ref interpolate_poses.py:22-59).

    vo.csv columns: source_ts, dest_ts, x, y, z, roll, pitch, yaw.
    """
    import csv

    abs_poses = [np.eye(4)]
    stamps = []
    with open(vo_path) as f:
        reader = csv.reader(f)
        header = next(reader)
        for row in reader:
            ts = int(row[0])
            xyzrpy = [float(v) for v in row[2:8]]
            T_rel = np.eye(4)
            T_rel[:3, :3] = _euler_to_rot(*xyzrpy[3:])
            T_rel[:3, 3] = xyzrpy[:3]
            if not stamps:
                stamps.append(int(row[1]))
            abs_poses.append(abs_poses[-1] @ T_rel)
            stamps.append(ts)
    return interpolate_poses(
        abs_poses, stamps, pose_timestamps, origin_timestamp
    )


def interpolate_ins_poses(ins_path, pose_timestamps, origin_timestamp):
    """Interpolate INS/GPS absolute poses at image timestamps
    (ref interpolate_poses.py:62-115). ins.csv columns include
    timestamp, ..., northing, easting, down, roll, pitch, yaw."""
    import csv

    abs_poses = []
    stamps = []
    with open(ins_path) as f:
        reader = csv.reader(f)
        header = next(reader)
        idx = {name: i for i, name in enumerate(header)}
        for row in reader:
            ts = int(row[idx["timestamp"]])
            T = np.eye(4)
            T[:3, :3] = _euler_to_rot(
                float(row[idx["roll"]]),
                float(row[idx["pitch"]]),
                float(row[idx["yaw"]]),
            )
            T[:3, 3] = [
                float(row[idx["northing"]]),
                float(row[idx["easting"]]),
                float(row[idx["down"]]),
            ]
            abs_poses.append(T)
            stamps.append(ts)
    return interpolate_poses(
        abs_poses, stamps, pose_timestamps, origin_timestamp
    )
