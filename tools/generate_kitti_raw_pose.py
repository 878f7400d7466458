"""Generate KITTI-format GT pose files from KITTI raw OXTS data.

Rebuild of the reference tool (tools/generate_kitti_raw_pose.py):

    python tools/generate_kitti_raw_pose.py \
        --data_dir dataset/kitti_raw --result_dir dataset/kitti_raw_pose \
        --seqs 2011_09_26_drive_0001_sync ...
"""

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dfvo_tpu.datasets.oxts import generate_pose  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="KITTI raw GT pose export")
    parser.add_argument("--data_dir", required=True, help="kitti raw root")
    parser.add_argument("--result_dir", required=True)
    parser.add_argument("--seqs", nargs="+", required=True)
    args = parser.parse_args()

    os.makedirs(args.result_dir, exist_ok=True)
    for seq in args.seqs:
        oxts_dir = os.path.join(
            args.data_dir, seq[:10], seq, "oxts", "data"
        )
        n = len(glob(os.path.join(oxts_dir, "*.txt")))
        lines = []
        for i in range(n):
            P = generate_pose(oxts_dir, i)
            lines.append(" ".join(str(v) for v in P.flatten()[:12]))
        out = os.path.join(args.result_dir, f"{seq}.txt")
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"saved {out} ({n} poses)")


if __name__ == "__main__":
    main()
