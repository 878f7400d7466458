"""KITTI odometry evaluation CLI.

Drop-in equivalent of the reference tool
(/root/reference/tools/evaluation/odometry/eval_odom.py:16-57):

    python tools/evaluation/odometry/eval_odom.py \
        --result result/tmp/0 --gt dataset/kitti_odom/gt_poses \
        --align 6dof [--seqs 09 10]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "../../..")
)

from dfvo_tpu.evaluation import KittiEvalOdom  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="KITTI odometry evaluation")
    parser.add_argument(
        "--result", type=str, required=True, help="result directory"
    )
    parser.add_argument(
        "--gt",
        type=str,
        default="dataset/kitti_odom/gt_poses/",
        help="GT poses directory",
    )
    parser.add_argument(
        "--align",
        type=str,
        choices=["scale", "scale_7dof", "7dof", "6dof"],
        default=None,
        help="alignment type",
    )
    parser.add_argument(
        "--seqs", nargs="+", default=None, help="sequences to be evaluated"
    )
    args = parser.parse_args()

    eval_tool = KittiEvalOdom()
    eval_tool.eval(args.gt, args.result, alignment=args.align, seqs=args.seqs)


if __name__ == "__main__":
    main()
