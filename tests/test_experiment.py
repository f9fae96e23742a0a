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
