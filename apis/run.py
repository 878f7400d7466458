"""DF-VO TPU command-line entry point.

Drop-in equivalent of /root/reference/apis/run.py:27-92:

    python apis/run.py -d options/examples/default_configuration.yml \
        [-c custom.yml] [--no_confirm] [-s 0]
"""

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dfvo_tpu.pipeline import DFVO  # noqa: E402
from dfvo_tpu.utils import ConfigLoader  # noqa: E402
from dfvo_tpu.utils.io import mkdir_if_not_exists  # noqa: E402


def read_cfgs():
    """Parse arguments and merge default + custom configurations
    (ref run.py:27-73)."""
    parser = argparse.ArgumentParser(description="DF-VO (TPU-native)")
    parser.add_argument(
        "-s", "--seq", default=None, help="sequence (overrides YAML)"
    )
    parser.add_argument(
        "-d",
        "--default_configuration",
        type=str,
        default="options/examples/default_configuration.yml",
        help="default configuration file",
    )
    parser.add_argument(
        "-c",
        "--configuration",
        type=str,
        default=None,
        help="custom configuration file",
    )
    parser.add_argument(
        "--no_confirm",
        action="store_true",
        help="no confirmation questions",
    )
    args = parser.parse_args()

    loader = ConfigLoader()
    cfg_files = [args.default_configuration, args.configuration]
    cfg = loader.merge_cfg(cfg_files)
    if args.seq is not None:
        cfg.seq = args.seq
    cfg.seq = str(cfg.seq)

    # precheck result directory (ref run.py:57-71)
    cfg.no_confirm = args.no_confirm
    traj_txt = os.path.join(cfg.directory.result_dir, f"{cfg.seq}.txt")
    if not args.no_confirm and os.path.exists(traj_txt):
        sure = input(
            f"[{traj_txt}] exists. Overwrite it? [y/n]: "
        ).lower()
        if sure != "y":
            sys.exit("Quit the program..")

    return args, cfg, loader, cfg_files


if __name__ == "__main__":
    args, cfg, loader, cfg_files = read_cfgs()

    # seed RNGs (ref run.py:80-84); device-side PRNG keys derive from
    # cfg.seed inside the pipeline
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    vo = DFVO(cfg)
    vo.main()

    # save merged configuration with provenance annotations (ref run.py:91-92)
    mkdir_if_not_exists(cfg.directory.result_dir)
    loader.save_cfg(
        cfg_files,
        os.path.join(cfg.directory.result_dir, "configuration.yml"),
    )
