"""Drop-in compatibility: the reference's own ``cur_task_setting.json``
loads through our config system and resolves every component."""
import os

import pytest

REF = "/root/reference/cur_task_setting.json"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_reference_setting_resolves():
    from liftreg_tpu.data.dataset import get_dataset
    from liftreg_tpu.losses import get_loss, get_similarity
    from liftreg_tpu.models import get_model
    from liftreg_tpu.utils.config import ParameterDict

    setting = ParameterDict(printSettings=False)
    setting.load_JSON(REF)

    train = setting["train"]
    assert get_model(train["model_class"]).__name__ == \
        "LiftRegSubspaceBackproj"
    assert get_loss(train["loss_class"]).__name__ == "SubspaceLoss"
    assert get_similarity(train["loss"]["sim_class"]) is not None
    assert get_dataset(setting["dataset"]["dataset_class"]).__name__ == \
        "Registration2D3DDataset"

    # schema fields the trainer consumes
    assert train["dataloader"]["batch_size"] == 30
    assert setting["dataset"]["img_after_resize"] == [160, 160, 160]
    assert train["model"]["latent_dim"] == 56
    assert train["optim"]["lr_scheduler"]["type"] == "custom"


def _keyset(d, prefix=""):
    out = set()
    for k, v in d.items():
        p = f"{prefix}.{k}" if prefix else k
        out.add(p)
        if isinstance(v, dict):
            out |= _keyset(v, p)
    return out


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_reference_config_zero_silent_keys(tmp_path):
    """Config-key audit with teeth (VERDICT r3 #5): load the reference's
    ``cur_task_setting.json`` verbatim (values of path/size keys overridden,
    key set unchanged — asserted), construct the real trainer, and require
    every key to be either consumed during construction or explicitly
    warned about with a reason. Zero silent keys."""
    import json

    from tools.make_synthetic_dataset import generate

    data = str(tmp_path / "data")
    generate(data, n_train=4, n_val=2, n_test=2, sz=16, n_proj=2, latent=4,
             seed=0)
    with open(REF) as f:
        setting = json.load(f)
    ks0 = _keyset(setting)
    setting["dataset"]["data_path"] = data
    setting["dataset"]["img_after_resize"] = [16, 16, 16]
    setting["dataset"]["drr_folder_name"] = "drr"
    setting["train"]["output_path"] = str(tmp_path / "exp")
    setting["train"]["model"]["pca_path"] = os.path.join(data, "pca")
    setting["train"]["model"]["latent_dim"] = 4
    setting["train"]["model"]["drr_feature_num"] = 2
    setting["train"]["dataloader"]["batch_size"] = 2
    setting["train"]["epoch"] = 1
    setting["train"]["mode"] = "train"
    assert _keyset(setting) == ks0, "override must not add/remove keys"

    from liftreg_tpu.train import RegistrationTrainer

    trainer = RegistrationTrainer(setting)
    # every warning must carry an explicit reason — no unexplained keys
    silent = [w for w in trainer.config_warnings if "not recognized" in w]
    assert silent == [], f"silent config keys: {silent}"
    # the named trio from the audit mandate is present-and-warned, not silent
    warned = "\n".join(trainer.config_warnings)
    for key in ("check_best_model_frequency", "workers",
                "load_training_data_into_memory"):
        assert key in warned, f"{key} must be explicitly warned about"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_unknown_key_is_flagged(tmp_path):
    """A typo'd config key must surface in config_warnings (the reference
    silently ignores unknown keys — module_parameters.py never checks)."""
    from liftreg_tpu.utils.config import TrackedConfig

    cfg = TrackedConfig({"train": {"epoch": 3, "epcoh": 5}})
    assert cfg["train"]["epoch"] == 3
    assert cfg.unconsumed() == ["train.epcoh"]


def test_network_class_string_di():
    """train.network_class resolves through the registry, accepting the
    reference's dotted class path (reference main.py:116)."""
    from liftreg_tpu.train import RegistrationTrainer, get_network

    assert get_network(
        "liftreg.networks.RegistrationNet.RegistrationNet") \
        is RegistrationTrainer
    assert get_network("") is RegistrationTrainer
    with pytest.raises(KeyError):
        get_network("liftreg.networks.DoesNotExist")
