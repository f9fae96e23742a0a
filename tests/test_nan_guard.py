"""Non-finite-loss guard (VERDICT r3 #6; reference parity for the NCC NaN
assert, ``/root/reference/src/liftreg/layers/losses.py:27``): a NaN batch
must (a) never poison params/Adam state — the jitted step rolls the update
back device-side — and (b) halt the run with the watchdog's restart code 42
after checkpointing, at the next buffered loss flush."""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e trainer runs (~52s on the 1-core CPU mesh)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def synth16(tmp_path_factory):
    from tools.make_synthetic_dataset import generate
    out = str(tmp_path_factory.mktemp("nandata"))
    generate(out, n_train=2, n_val=1, n_test=1, sz=16, n_proj=2, latent=2,
             seed=3)
    return out


def _setting(data, out, epochs=2):
    return {
        "dataset": {"data_path": data, "dataset_class": "registration2d3d",
                    "drr_folder_name": "drr",
                    "img_after_resize": [16, 16, 16],
                    "load_projection_interval": 1,
                    "max_num_for_loading": [-1, -1, -1, -1],
                    "spacing_to_refer": [2.2, 2.2, 2.2],
                    "use_segmentation_map": True, "apply_hu_clip": True},
        "train": {"dataloader": {"batch_size": 2,
                                 "shuffle": [False, False, False, False]},
                  "debug_on": False, "epoch": epochs,
                  "loss": {"initial_reg_factor": 0.01,
                           "min_reg_factor": 0.01,
                           "reg_factor_decay_from": 2, "sim_class": "ncc"},
                  "loss_class": "subspace", "mode": "train",
                  "model": {"drr_feature_num": 2, "latent_dim": 2,
                            "pca_path": os.path.join(data, "pca")},
                  "model_class": "subspace_backproj",
                  "optim": {"adam": {"beta": [0.9, 0.999]}, "lr": 1e-3,
                            "lr_scheduler": {"custom": {"gamma": 0.8,
                                                        "step_size": 30},
                                             "type": "custom"},
                            "optim_type": "adam"},
                  "output_path": out, "save_3d_img": False,
                  "save_fig": False, "save_fig_frequency": 100,
                  "save_model_frequency": 100, "val_frequency": 100,
                  "log_flush_steps": 1},
    }


def test_nan_batch_rolls_back_and_halts(synth16, tmp_path):
    import jax

    from liftreg_tpu.train import RegistrationTrainer

    # poison one training case's source volume AFTER generation: NCC of a
    # NaN input is NaN, so the first train step's loss is non-finite
    src = os.path.join(synth16, "preprocessed", "syn000_source.npy")
    vol = np.load(src)
    poisoned = vol.copy()
    poisoned[4:8] = np.nan
    np.save(src, poisoned)
    try:
        trainer = RegistrationTrainer(_setting(synth16, str(tmp_path)))
        params_before = jax.device_get(trainer.params)
        with pytest.raises(SystemExit) as e:
            trainer.run()
        assert e.value.code == 42
        # the checkpoint of the last finite state exists and holds the
        # UN-poisoned params (the NaN update was rolled back device-side)
        ckpt = os.path.join(str(tmp_path), "checkpoints",
                            "nan_halt_checkpoint.ckpt")
        assert os.path.exists(ckpt)
        params_after = jax.device_get(trainer.params)
        flat_b = jax.tree_util.tree_leaves(params_before)
        flat_a = jax.tree_util.tree_leaves(params_after)
        for b, a in zip(flat_b, flat_a):
            assert np.isfinite(np.asarray(a)).all()
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer moments stayed finite too
        for leaf in jax.tree_util.tree_leaves(
                jax.device_get(trainer.opt_state)):
            assert np.isfinite(np.asarray(leaf, dtype=np.float64)).all()
    finally:
        np.save(src, vol)  # restore for other tests sharing the fixture


def test_finite_training_unaffected(synth16, tmp_path):
    """The guard is free when losses are finite: a normal run completes and
    logs finite=1 for every step."""
    import json

    from liftreg_tpu.train import RegistrationTrainer

    trainer = RegistrationTrainer(_setting(synth16, str(tmp_path), epochs=1))
    trainer.run()
    metrics = os.path.join(str(tmp_path), "logs", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics)]
    finite_rows = [r for r in rows if r["tag"] == "Train/finite"]
    assert finite_rows and all(r["value"] == 1.0 for r in finite_rows)
