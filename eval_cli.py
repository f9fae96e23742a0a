"""Evaluation CLI.

Mirrors the reference's ``eval.py``: loads a saved experiment config, forces
test mode with the best checkpoint, saves figures/3D artifacts + deformation
maps, then runs the DirLab landmark TRE evaluation (``eval.py:35-49``).

To additionally score per-case latent refinement (amortized vs refined
TRE side by side), use ``tools/refine_eval.py`` with the same setting file.
"""
import argparse
import os

from liftreg_tpu.train import get_network
from liftreg_tpu.utils.config import ParameterDict
from liftreg_tpu.utils.tre import eval_copd_highres

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="An easy interface for evaluating registration models")
    parser.add_argument("-s", "--setting_path", required=True, type=str,
                        help="path to the experiment's cur_task_setting.json")
    parser.add_argument("-g", "--gpu_id", required=False, type=int, default=0,
                        help="accepted for reference-CLI compatibility")
    args = parser.parse_args()
    print(args)

    setting = ParameterDict()
    setting.load_JSON(args.setting_path)

    setting["train"]["mode"] = "test"
    setting["train"]["test_from"] = os.path.join(
        setting["train"]["output_path"], "checkpoints", "model_best.ckpt")
    setting["train"]["save_fig"] = True
    setting["train"]["save_3d_img"] = True

    # string DI as in the reference (eval.py:44)
    trainer = get_network(setting["train"][("network_class", "")])(setting)
    trainer.run()

    eval_copd_highres(setting["dataset"]["data_path"],
                      setting["train"]["output_path"],
                      dim=tuple(setting["dataset"]["img_after_resize"]))
