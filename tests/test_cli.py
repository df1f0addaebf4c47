"""CLI surface tests (no training; heavyweight subcommands get smoke-level
coverage via the trainer suite)."""

import json
import os

import pytest

from simpletuner_tpu.cli import main


def test_models_lists_families(capsys):
    assert main(["models"]) == 0
    out = capsys.readouterr().out
    assert "flux" in out and "sdxl" in out and "sd1x" in out


def test_optimizers_lists(capsys):
    assert main(["optimizers"]) == 0
    out = capsys.readouterr().out
    assert "adamw" in out and "prodigy" in out


def test_version(capsys):
    assert main(["version"]) == 0
    assert capsys.readouterr().out.strip()


def test_examples_list_and_write(tmp_path, capsys):
    assert main(["examples"]) == 0
    out = capsys.readouterr().out
    assert "flux.peft-lora" in out

    assert main(["examples", "flux.peft-lora", "--output-dir", str(tmp_path)]) == 0
    config = json.load(open(tmp_path / "config.json"))
    assert config["model_family"] == "flux"


def test_validate_config_good(tmp_path, capsys):
    path = tmp_path / "config.json"
    mdb = tmp_path / "mdb.json"
    mdb.write_text(json.dumps([
        {"id": "d", "type": "local", "instance_data_dir": str(tmp_path)},
        {"id": "t", "dataset_type": "text_embeds", "type": "local", "default": True},
    ]))
    path.write_text(json.dumps({
        "model_family": "flux",
        "model_type": "lora",
        "optimizer": "adamw",
        "learning_rate": 1e-4,
        "max_train_steps": 10,
        "data_backend_config": str(mdb),
    }))
    assert main(["validate-config", "--config", str(path)]) == 0
    out = capsys.readouterr().out
    assert "config OK" in out and "dataloader OK" in out


def test_validate_config_bad(tmp_path, capsys):
    path = tmp_path / "config.json"
    path.write_text(json.dumps({"model_family": "flux", "optimizer": "definitely-not-real",
                                "learning_rate": 1e-4, "max_train_steps": 10}))
    assert main(["validate-config", "--config", str(path)]) == 1


def test_configure_wizard_scripted(tmp_path):
    from simpletuner_tpu.cli.configure import run_wizard
    from simpletuner_tpu.configuration import TrainingConfig

    answers = [
        "flux", "lora", "8", "lokr", "", "512", "2", "100", "1e-4",
        "adamw", "constant", "10", "y", "int8", "50", "a test prompt", "25",
        "none", str(tmp_path / "out"), "/data/imgs", "textfile",
    ]
    paths = run_wizard(str(tmp_path / "config"), answers=answers)
    import json as _json

    config = _json.load(open(paths["config"]))
    assert config["model_family"] == "flux"
    assert config["lora_rank"] == 8
    assert config["lycoris_config"] == {"algo": "lokr"}
    assert config["base_model_precision"] == "int8"
    dataloader = _json.load(open(paths["dataloader"]))
    assert dataloader[0]["instance_data_dir"] == "/data/imgs"
    # produced config passes validation
    TrainingConfig(config)
