"""Training CLI.

Mirrors the reference's ``main.py``: creates a timestamped experiment folder
under ``output/{dataset}/{exp}/``, loads + overrides + freezes the JSON
config, and runs the trainer (``main.py:14-74,89-118``).
"""
import argparse

import numpy as np

from liftreg_tpu.train import get_network
from liftreg_tpu.utils.experiment import prepare_experiment


def set_seed_for_demo(seed=2021):
    """Fixed seed (``utils/utils.py:11-18``); JAX PRNG keys derive from the
    same seed inside the trainer."""
    np.random.seed(seed)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="An easy interface for training registration models")
    parser.add_argument("-o", "--output_path", required=True, type=str,
                        help="the path of output folder")
    parser.add_argument("-d", "--data_path", required=True, type=str,
                        help="the path to the data folder")
    parser.add_argument("-e", "--exp_name", required=True, type=str,
                        help="the name of the experiment")
    parser.add_argument("-s", "--setting_path", required=True, type=str,
                        help="folder containing cur_task_setting.json")
    parser.add_argument("--continue_from", required=False, type=str,
                        help="checkpoint to continue training from")
    parser.add_argument("-g", "--gpu_id", required=False, type=int, default=0,
                        help="accepted for reference-CLI compatibility; "
                             "device selection is automatic under JAX")
    parser.add_argument("--n_devices", required=False, type=int, default=None,
                        help="number of local devices for the data mesh "
                             "(default: all)")
    args = parser.parse_args()
    print(args)

    set_seed_for_demo()
    setting, exp_folder = prepare_experiment(
        args.output_path, args.data_path, args.exp_name, args.setting_path,
        continue_from=args.continue_from)

    # string DI as in the reference (main.py:116): train.network_class
    # names the trainer; reference class-path strings are aliases
    network_cls = get_network(setting["train"][("network_class", "")])
    trainer = network_cls(setting, n_devices=args.n_devices)
    trainer.run()
