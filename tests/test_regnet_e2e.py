"""RegNet2D3D (dense U-Net) variant: projection-loss dataset + trainer."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    from tools.make_synthetic_dataset import generate
    out = str(tmp_path_factory.mktemp("synthdata_rn"))
    generate(out, n_train=2, n_val=1, n_test=1, sz=32, n_proj=2, latent=2,
             seed=1)
    return out


def test_projloss_dataset_has_atten_source(synth_dataset):
    from liftreg_tpu.data.dataset import Registration2D3DForProjLossDataset
    opt = {"drr_folder_name": "drr", "use_segmentation_map": True,
           "spacing_to_refer": [2.2] * 3, "load_projection_interval": 1,
           "max_num_for_loading": (-1,) * 4}
    ds = Registration2D3DForProjLossDataset(synth_dataset, phase="train",
                                            option=opt)
    sample, _ = ds[0]
    assert "original_source" in sample
    att = sample["original_source"]
    assert att.min() >= 0.0  # attenuation coefficients are nonnegative
    assert att.max() <= 0.25


def test_regnet_training_step(synth_dataset, tmp_path):
    from liftreg_tpu.train import RegistrationTrainer
    exp = str(tmp_path / "exp")
    os.makedirs(exp, exist_ok=True)
    setting = {
        "dataset": {
            "apply_hu_clip": False,
            "data_path": synth_dataset,
            "dataset_class": "registration2d3d_projloss",
            "drr_folder_name": "drr",
            "img_after_resize": [32, 32, 32],
            "load_projection_interval": 1,
            "max_num_for_loading": [2, 1, 1, 1],
            "spacing_to_refer": [2.2, 2.2, 2.2],
            "use_segmentation_map": True,
        },
        "train": {
            "dataloader": {"batch_size": 1,
                           "shuffle": [True, True, False, False]},
            "debug_on": False,
            "epoch": 0,
            "loss": {"initial_reg_factor": 0.01, "min_reg_factor": 0.01,
                     "reg_factor_decay_from": 2, "sim_class": "ncc"},
            "loss_class": "regnet2d3d",
            "mode": "train",
            "model": {"drr_feature_num": 2},
            "model_class": "regnet2d3d",
            "optim": {"adam": {"beta": [0.9, 0.999]}, "lr": 1e-4,
                      "lr_scheduler": {"custom": {"gamma": 0.8,
                                                  "step_size": 30},
                                       "type": "custom"},
                      "optim_type": "adam"},
            "output_path": exp,
            "save_3d_img": False,
            "save_fig": False,
            "save_fig_frequency": 100,
            "save_model_frequency": 10,
            "val_frequency": 1,
        },
    }
    trainer = RegistrationTrainer(setting)
    # one train step by hand (epoch=0 run covers val only at epoch 0)
    data = next(iter(trainer.loaders["train"]))
    batch, names = trainer.set_input(data, 0)
    losses = trainer.step(batch, names)
    assert np.isfinite(losses["total_loss"])
    assert "sim_loss" in losses and "reg_loss" in losses


def test_projection_interval_and_roi(tmp_path):
    """load_projection_interval subsamples views; per-view ROI files load
    (``Registration2D3DDataset.py:95-96,116-118``)."""
    import numpy as np
    from tools.make_synthetic_dataset import generate
    from liftreg_tpu.data.dataset import Registration2D3DDataset

    out = str(tmp_path / "ds")
    generate(out, n_train=2, n_val=1, n_test=1, sz=24, n_proj=4, latent=2,
             seed=2)
    # write ROI files for the train cases (one box per view)
    import os
    roi_dir = os.path.join(out, "drr", "drr", "roi")
    os.makedirs(roi_dir)
    ids = [str(i) for i in np.load(os.path.join(out, "train", "data_id.npy"))]
    for cid in ids:
        np.save(os.path.join(roi_dir, f"{cid}_target_proj_roi.npy"),
                np.tile([2, 20, 3, 21], (4, 1)).astype(np.int64))

    opt = {"drr_folder_name": "drr", "use_segmentation_map": True,
           "spacing_to_refer": [2.2] * 3, "load_projection_interval": 2,
           "max_num_for_loading": (-1,) * 4}
    ds = Registration2D3DDataset(out, phase="train", option=opt)
    sample, name = ds[0]
    assert sample["target_proj"].shape[0] == 2  # 4 views / interval 2
    assert sample["source_proj"].shape[0] == 2
    assert sample["target_poses"].shape[0] == 2
    assert sample["target_proj_roi"].shape == (2, 4)  # subsampled too
