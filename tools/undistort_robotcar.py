"""Pre-undistort Oxford RobotCar images.

Working rebuild of the reference tool (tools/undistort_robotcar.py, which
is broken as checked in — syntax error + wrong body, SURVEY.md §2): reads
raw Bayer images from ``<seq>/stereo/centre``, demosaics + undistorts via
the SDK camera model, writes ``<seq>/undistorted_stereo/centre``.

    python tools/undistort_robotcar.py --data_dir dataset/robotcar --seq 2014-...
"""

import argparse
import os
import sys
from glob import glob

import cv2
from tqdm import tqdm

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dfvo_tpu.datasets.robotcar_sdk import CameraModel, load_image  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="undistort RobotCar images"
    )
    parser.add_argument("--data_dir", required=True, help="dataset root")
    parser.add_argument("--seq", required=True, help="sequence name")
    args = parser.parse_args()

    models_dir = os.path.join(args.data_dir, "robotcar-dataset-sdk", "models")
    img_dir = os.path.join(args.data_dir, args.seq, "stereo", "centre")
    out_dir = os.path.join(
        args.data_dir, args.seq, "undistorted_stereo", "centre"
    )
    os.makedirs(out_dir, exist_ok=True)

    model = CameraModel(models_dir, img_dir)
    for path in tqdm(sorted(glob(os.path.join(img_dir, "*.png")))):
        img = load_image(path, model)
        out_path = os.path.join(out_dir, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


if __name__ == "__main__":
    main()
