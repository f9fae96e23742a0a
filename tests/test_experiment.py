"""Experiment-layer tests: dir layout, frozen config, overrides."""
import json
import os
import stat

import pytest

from liftreg_tpu.utils.experiment import prepare_experiment


def test_prepare_experiment(tmp_path):
    setting_dir = tmp_path / "settings"
    setting_dir.mkdir()
    (setting_dir / "cur_task_setting.json").write_text(json.dumps({
        "dataset": {"data_path": "[X]"},
        "train": {"output_path": "[Y]", "mode": "train"},
    }))
    data = tmp_path / "mydata"
    data.mkdir()

    setting, exp_folder = prepare_experiment(
        str(tmp_path / "out"), str(data), "expA", str(setting_dir),
        timestamp="2026_01_01_00_00_00")

    # layout: output/{dataset}/{exp}/{timestamp}/{checkpoints,records,...}
    assert exp_folder.endswith("mydata/expA/2026_01_01_00_00_00")
    for sub in ("checkpoints", "records", "logs", "tests"):
        assert os.path.isdir(os.path.join(exp_folder, sub))

    # overrides applied
    assert setting["dataset"]["data_path"] == str(data)
    assert setting["train"]["output_path"] == exp_folder
    assert "git_commit" in setting["exp"].as_dict()
    assert "command_line" in setting["exp"].as_dict()

    # frozen read-only config snapshot
    frozen = os.path.join(exp_folder, "cur_task_setting.json")
    assert os.path.exists(frozen)
    mode = stat.S_IMODE(os.stat(frozen).st_mode)
    assert not (mode & stat.S_IWUSR)
    saved = json.loads(open(frozen).read())
    assert saved["dataset"]["data_path"] == str(data)


def test_prepare_experiment_continue_from(tmp_path):
    setting_dir = tmp_path / "s"
    setting_dir.mkdir()
    (setting_dir / "cur_task_setting.json").write_text(json.dumps({
        "dataset": {}, "train": {}}))
    data = tmp_path / "d"
    data.mkdir()
    setting, _ = prepare_experiment(str(tmp_path / "o"), str(data), "e",
                                    str(setting_dir),
                                    continue_from="/some/ckpt")
    assert setting["train"]["continue_train"] is True
    assert setting["train"]["continue_from"] == "/some/ckpt"


def test_resume_train_mismatched_tree_raises(tmp_path):
    """A majority-mismatched parameter tree (e.g. a checkpoint from a
    renamed module layout) must fail loud, not restore-as-raw-dict and
    train from an effective fresh init (ADVICE r3)."""
    import jax.numpy as jnp
    import pytest
    from flax import serialization
    from liftreg_tpu.utils.checkpoint import resume_train

    path = str(tmp_path / "old.ckpt")
    old_params = {"params": {"ConvBlock_0": {"Conv_0": {
        "kernel": jnp.zeros((3, 3, 3, 5, 16)), "bias": jnp.zeros((16,))}}}}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict({"epoch": 3, "params": old_params})))
    template = {"params": {"CheckpointConvBlock_0": {"Conv_0": {
        "kernel": jnp.ones((3, 3, 3, 5, 16)), "bias": jnp.ones((16,))}}}}
    with pytest.raises(ValueError, match="does not match the model"):
        resume_train(path, params_template=template)


def test_resume_train_partial_tree_warns_and_merges(tmp_path, capsys):
    """A checkpoint missing a MINORITY of modules (model extended since)
    keeps the tolerant-subset behavior and names the missing keys."""
    import jax.numpy as jnp
    from flax import serialization
    from liftreg_tpu.utils.checkpoint import resume_train

    path = str(tmp_path / "old.ckpt")
    mods = {f"CheckpointConvBlock_{i}": {"Conv_0": {
        "kernel": jnp.zeros((2, 2)), "bias": jnp.zeros((2,))}}
        for i in range(3)}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(serialization.to_state_dict(
            {"epoch": 1, "params": {"params": dict(mods)}})))
    mods_new = dict(mods)
    mods_new["NewHead_0"] = {"kernel": jnp.ones((2, 2))}
    out = resume_train(path, params_template={"params": mods_new})
    assert out is not None
    assert "NewHead_0" in capsys.readouterr().out


def test_default_task_setting_merge():
    from liftreg_tpu.utils.settings import default_task_setting

    s = default_task_setting("/d", "/o", 32, overrides={
        "dataset": {"max_num_for_loading": [4, 2, 2, 2]},
        "train": {"model": {"latent_dim": 7}, "epoch": 9},
    })
    assert s["dataset"]["img_after_resize"] == [32, 32, 32]
    assert s["dataset"]["max_num_for_loading"] == [4, 2, 2, 2]
    assert s["dataset"]["dataset_class"] == "registration2d3d"
    assert s["train"]["model"]["latent_dim"] == 7
    assert s["train"]["model"]["drr_feature_num"] == 4   # default kept
    assert s["train"]["epoch"] == 9
    assert s["train"]["output_path"] == "/o"
