"""Landmark TRE evaluation CLI (mirror of the reference
``tools/evaluate_dir_lab.py`` entry point)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from liftreg_tpu.utils.tre import eval_copd_highres  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Show registration result")
    parser.add_argument("--data_path", "-d", required=True, type=str)
    parser.add_argument("--setting", "-s", metavar="SETTING", default="",
                        help="path to the experiment's cur_task_setting.json")
    parser.add_argument("--exp_path", default="",
                        help="experiment folder (alternative to --setting)")
    parser.add_argument("--dim", type=int, default=160,
                        help="volume size the maps were computed at")
    args = parser.parse_args()
    exp_path = args.exp_path or "/".join(args.setting.split("/")[:-1])
    eval_copd_highres(args.data_path, exp_path, dim=(args.dim,) * 3)
