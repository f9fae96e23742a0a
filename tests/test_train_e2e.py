"""End-to-end slice: synthetic dataset -> train -> checkpoint -> test ->
landmark TRE. Small shapes (32^3) so it runs on the CPU test mesh."""
import json
import os

import numpy as np
import pytest

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    from tools.make_synthetic_dataset import generate
    out = str(tmp_path_factory.mktemp("synthdata"))
    generate(out, n_train=4, n_val=2, n_test=2, sz=32, n_proj=2, latent=4,
             seed=0)
    return out


def make_setting(data_path, out_path, epochs=1):
    return {
        "dataset": {
            "apply_hu_clip": True,
            "data_path": data_path,
            "dataset_class": "registration2d3d",
            "drr_folder_name": "drr",
            "img_after_resize": [32, 32, 32],
            "load_projection_interval": 1,
            "max_num_for_loading": [4, 2, 2, 2],
            "spacing_to_refer": [2.2, 2.2, 2.2],
            "use_segmentation_map": True,
        },
        "train": {
            "dataloader": {"batch_size": 2,
                           "shuffle": [True, True, False, False]},
            "debug_on": False,
            "epoch": epochs,
            "loss": {"initial_reg_factor": 0.01, "min_reg_factor": 0.01,
                     "reg_factor_decay_from": 2, "sim_class": "ncc"},
            "loss_class": "subspace",
            "mode": "train",
            "model": {"drr_feature_num": 2, "latent_dim": 4,
                      "pca_path": os.path.join(data_path, "pca")},
            "model_class": "subspace_backproj",
            "optim": {"adam": {"beta": [0.9, 0.999]}, "lr": 1e-3,
                      "lr_scheduler": {"custom": {"gamma": 0.8,
                                                  "step_size": 30},
                                       "type": "custom"},
                      "optim_type": "adam"},
            "output_path": out_path,
            "save_3d_img": False,
            "save_fig": False,
            "save_fig_frequency": 100,
            "save_model_frequency": 1,
            "val_frequency": 1,
        },
    }


def test_train_then_test_then_tre(synth_dataset, tmp_path):
    from liftreg_tpu.train import RegistrationTrainer
    from liftreg_tpu.utils.tre import eval_copd_highres

    exp = str(tmp_path / "exp")
    for sub in ("checkpoints", "records", "logs", "tests"):
        os.makedirs(os.path.join(exp, sub), exist_ok=True)
    setting = make_setting(synth_dataset, exp, epochs=1)

    trainer = RegistrationTrainer(setting)
    trainer.run()
    # best checkpoint written (val runs at epoch 0)
    assert os.path.exists(os.path.join(exp, "checkpoints", "model_best.ckpt"))
    # metrics logged
    lines = open(os.path.join(exp, "logs", "metrics.jsonl")).read().splitlines()
    tags = {json.loads(l)["tag"] for l in lines}
    assert any(t.startswith("Train/") for t in tags)
    assert "Val_metrics/score" in tags
    assert "Val_metrics/dice" in tags

    # test mode: loads best ckpt, saves deformations
    setting_t = make_setting(synth_dataset, exp, epochs=1)
    setting_t["train"]["mode"] = "test"
    setting_t["train"]["test_from"] = os.path.join(exp, "checkpoints",
                                                   "model_best.ckpt")
    setting_t["train"]["save_fig"] = True
    setting_t["train"]["save_3d_img"] = True
    tester = RegistrationTrainer(setting_t)
    tester.run()
    test_ids = [str(i) for i in
                np.load(os.path.join(synth_dataset, "test", "data_id.npy"))]
    for tid in test_ids:
        assert os.path.exists(os.path.join(exp, "tests", tid + "_phi.npy"))

    # landmark TRE over the saved phis
    table = {tid: [2.2, 2.2, 2.2] for tid in test_ids}
    results = eval_copd_highres(synth_dataset, exp, spacing_table=table,
                                dim=(32, 32, 32))
    assert len(results) == len(test_ids)
    for r in results:
        assert np.isfinite(r["dist"])
        assert 0.0 <= r["dice"] <= 1.0
    assert os.path.exists(os.path.join(exp, "evaluate_result.csv"))


def test_resume_training(synth_dataset, tmp_path):
    from liftreg_tpu.train import RegistrationTrainer

    exp = str(tmp_path / "exp2")
    os.makedirs(exp, exist_ok=True)
    setting = make_setting(synth_dataset, exp, epochs=0)
    trainer = RegistrationTrainer(setting)
    trainer.run()
    ckpt = os.path.join(exp, "checkpoints", "latest_checkpoint.ckpt")
    assert os.path.exists(ckpt)

    setting2 = make_setting(synth_dataset, exp, epochs=1)
    setting2["train"]["continue_train"] = True
    setting2["train"]["continue_from"] = ckpt
    trainer2 = RegistrationTrainer(setting2)
    assert trainer2.start_epoch == 1
    trainer2.run()


def test_warm_start_params_only(synth_dataset, tmp_path):
    """``train.init_params_from``: params come from the checkpoint but
    epoch/optimizer/schedule state start fresh (fine-tune semantics, e.g.
    LNCC from an NCC-converged checkpoint)."""
    import jax
    from liftreg_tpu.train import RegistrationTrainer

    exp = str(tmp_path / "exp_ws_src")
    os.makedirs(exp, exist_ok=True)
    trainer = RegistrationTrainer(make_setting(synth_dataset, exp, epochs=0))
    trainer.run()
    ckpt = os.path.join(exp, "checkpoints", "latest_checkpoint.ckpt")

    exp2 = str(tmp_path / "exp_ws_dst")
    os.makedirs(exp2, exist_ok=True)
    setting2 = make_setting(synth_dataset, exp2, epochs=0)
    setting2["train"]["init_params_from"] = ckpt
    setting2["train"]["loss"]["sim_class"] = "lncc"  # new objective is fine
    trainer2 = RegistrationTrainer(setting2)
    assert trainer2.start_epoch == 0  # fresh schedule, not a resume
    src_leaves = jax.tree_util.tree_leaves(trainer.params)
    dst_leaves = jax.tree_util.tree_leaves(trainer2.params)
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(src_leaves, dst_leaves))
