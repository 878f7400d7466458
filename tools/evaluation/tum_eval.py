"""TUM RGB-D trajectory evaluation CLI (ATE after Horn alignment).

Equivalent of the reference's TUM toolkit evaluation path
(tools/evaluation/tum_tool/pose_evaluation_utils.py):

    python tools/evaluation/tum_eval.py --result result/tum/0/<seq>.txt \
        --gt dataset/tum/<seq>/groundtruth.txt [--max_difference 0.02]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../..")
)

from dfvo_tpu.evaluation.tum_tool import associate, compute_ate  # noqa: E402
from dfvo_tpu.utils.io import load_poses_from_txt_tum  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="TUM ATE evaluation")
    parser.add_argument("--result", required=True, help="TUM-format result txt")
    parser.add_argument("--gt", required=True, help="TUM-format GT txt")
    parser.add_argument("--max_difference", type=float, default=0.02)
    args = parser.parse_args()

    pred = load_poses_from_txt_tum(args.result)
    gt = load_poses_from_txt_tum(args.gt)

    matches = associate(
        {t: [] for t in gt},
        {t: [] for t in pred},
        0,
        args.max_difference,
    )
    if len(matches) < 2:
        sys.exit("not enough matched timestamps between GT and result")
    gt_m = {t1: gt[t1] for t1, _ in matches}
    pred_m = {t1: pred[t2] for t1, t2 in matches}

    rmse, _ = compute_ate(gt_m, pred_m)
    print(f"compared_pose_pairs {len(matches)} pairs")
    print(f"absolute_translational_error.rmse {rmse:.6f} m")


if __name__ == "__main__":
    main()
