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
