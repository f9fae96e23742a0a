"""The full LiftReg paper workflow (reference README.md:34-36 leaves the
subspace-construction step to a Drive download; we implement it):

  1. train the dense-displacement RegNet2D3D on training pairs,
  2. build the PCA deformation subspace from its predicted train-split
     displacement fields (tools/build_pca.py --from_experiment),
  3. train the subspace model (LiftRegSubspaceBackproj) on that basis.

Small shapes (32^3) on the CPU mesh: asserts the mechanics — fields
collected from the right split, basis spans them, subspace model trains on
it end to end. The statistically meaningful beats-identity TRE run is the
160^3 TPU demo (DEMO.md).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow

from tests.test_train_e2e import make_setting  # noqa: E402


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from tools.make_synthetic_dataset import generate
    out = str(tmp_path_factory.mktemp("synth_wf"))
    generate(out, n_train=6, n_val=2, n_test=2, sz=32, n_proj=2, latent=4,
             seed=7)
    return out


def test_regnet_to_pca_to_subspace(synth, tmp_path):
    from liftreg_tpu import pca as pca_lib
    from liftreg_tpu.train import RegistrationTrainer
    from tools.build_pca import disp_from_experiment

    # -- 1. train RegNet2D3D (dense U-Net) briefly -----------------------
    exp_rn = str(tmp_path / "exp_regnet")
    os.makedirs(exp_rn, exist_ok=True)
    setting = make_setting(synth, exp_rn, epochs=1)
    setting["dataset"]["dataset_class"] = "registration2d3d_projloss"
    setting["dataset"]["apply_hu_clip"] = False
    setting["dataset"]["max_num_for_loading"] = [6, 2, 2, 2]
    setting["train"]["model_class"] = "regnet2d3d"
    setting["train"]["loss_class"] = "regnet2d3d"
    setting["train"]["model"] = {"drr_feature_num": 2}
    setting["train"]["val_frequency"] = 1
    RegistrationTrainer(setting).run()
    ckpt = os.path.join(exp_rn, "checkpoints", "model_best.ckpt")
    assert os.path.exists(ckpt)

    # persist the frozen config the way main.py would
    import json
    cfg_path = os.path.join(exp_rn, "cur_task_setting.json")
    with open(cfg_path, "w") as f:
        json.dump(setting, f)

    # -- 2. PCA basis from the trained model's train-split fields --------
    X = disp_from_experiment(synth, cfg_path, phase="train")
    assert X.shape == (6, 3 * 32 ** 3)  # one field per *train* case
    latent = 4
    vectors, mean = pca_lib.fit_pca(X, latent)
    pca_dir = str(tmp_path / "pca_rn")
    pca_lib.save_pca(pca_dir, vectors, mean)
    ratio = pca_lib.explained_variance_ratio(X, vectors, mean)
    assert 0.5 < ratio <= 1.0 + 1e-6  # 4 comps over 6 fields span most var

    # -- 3. train the subspace model on the RegNet-derived basis ---------
    exp_ss = str(tmp_path / "exp_subspace")
    os.makedirs(exp_ss, exist_ok=True)
    setting2 = make_setting(synth, exp_ss, epochs=3)
    setting2["dataset"]["max_num_for_loading"] = [6, 2, 2, 2]
    setting2["train"]["model"]["pca_path"] = pca_dir
    setting2["train"]["model"]["latent_dim"] = latent
    setting2["train"]["val_frequency"] = 3
    trainer = RegistrationTrainer(setting2)
    # basis actually loaded from the RegNet-derived files
    np.testing.assert_allclose(np.asarray(trainer.pca["vectors"]), vectors,
                               rtol=1e-6)
    trainer.run()

    lines = [json.loads(l) for l in
             open(os.path.join(exp_ss, "logs", "metrics.jsonl"))]
    sims = [l["value"] for l in lines if l["tag"] == "Train/sim_loss"]
    assert len(sims) >= 9
    assert all(np.isfinite(s) for s in sims)
    # training moves the objective downward on the whole
    assert np.mean(sims[-3:]) < np.mean(sims[:3])
