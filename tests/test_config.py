import json

import pytest

from simpletuner_tpu.configuration import (
    REGISTRY,
    DataloaderConfigError,
    TrainingConfig,
    load_config,
    load_dataloader_config,
)


def test_registry_defaults_present():
    defaults = REGISTRY.defaults()
    assert defaults["train_batch_size"] == 1
    assert defaults["optimizer"] == "adamw_bf16"
    assert defaults["mixed_precision"] == "bf16"


def test_training_config_from_reference_style_json(tmp_path):
    # keys written with the reference's "--key" style must be accepted
    config = {
        "--model_family": "flux",
        "--model_type": "lora",
        "--lora_rank": "32",
        "--train_batch_size": 4,
        "--learning_rate": "1e-4",
        "--mixed_precision": "bf16",
        "--gradient_checkpointing": "true",
        "--max_train_steps": 1000,
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(config))
    cfg = TrainingConfig.from_file(str(path))
    assert cfg.model_family == "flux"
    assert cfg.lora_rank == 32
    assert cfg.train_batch_size == 4
    assert cfg.learning_rate == 1e-4
    assert cfg.gradient_checkpointing is True
    assert cfg.lora_alpha == 32  # defaults to rank


def test_bool_coercion_strings(tmp_path):
    path = tmp_path / "config.json"
    path.write_text(json.dumps({"use_ema": "false", "push_to_hub": "true"}))
    cfg = TrainingConfig.from_file(str(path))
    assert cfg.use_ema is False
    assert cfg.push_to_hub is True


def test_invalid_choice_rejected(tmp_path):
    path = tmp_path / "config.json"
    path.write_text(json.dumps({"lr_scheduler": "bogus"}))
    with pytest.raises(ValueError):
        load_config(str(path))


def test_env_config_format(tmp_path):
    path = tmp_path / "config.env"
    path.write_text(
        'TRAIN_BATCH_SIZE=8\nRESOLUTION=512\n'
        'TRAINER_EXTRA_ARGS="--model_family=sdxl --use_ema"\n'
    )
    values = load_config(str(path))
    assert values["train_batch_size"] == 8
    assert values["resolution"] == 512
    assert values["model_family"] == "sdxl"
    assert values["use_ema"] is True


def test_cli_parse():
    cfg = TrainingConfig.from_cli(
        ["--model_family", "sdxl", "--train_batch_size", "2", "--optimizer", "adamw"]
    )
    assert cfg.model_family == "sdxl"
    assert cfg.train_batch_size == 2
    assert cfg.optimizer == "adamw"


def test_checkpointing_steps_alias(tmp_path):
    path = tmp_path / "config.json"
    path.write_text(json.dumps({"--checkpointing_steps": 100}))
    cfg = TrainingConfig.from_file(str(path))
    assert cfg.checkpoint_step_interval == 100


# --- dataloader config ------------------------------------------------------------------

GOOD = [
    {
        "id": "images",
        "type": "local",
        "instance_data_dir": "/tmp/data",
        "crop": True,
        "crop_style": "center",
        "crop_aspect": "square",
        "resolution": 1024,
        "resolution_type": "pixel_area",
        "caption_strategy": "textfile",
        "cache_dir_vae": "/tmp/vae",
        "repeats": 2,
        "text_embeds": "embeds",
    },
    {
        "id": "embeds",
        "dataset_type": "text_embeds",
        "type": "local",
        "default": True,
        "cache_dir": "/tmp/text",
    },
]


def test_dataloader_config_parses_and_sorts():
    configs = load_dataloader_config([dict(e) for e in GOOD])
    assert [c.id for c in configs] == ["embeds", "images"]
    images = configs[1]
    assert images.crop_style == "center"
    assert images.repeats == 2
    assert images.text_embeds == "embeds"


def test_dataloader_duplicate_id_rejected():
    bad = [dict(GOOD[0]), dict(GOOD[0]), dict(GOOD[1])]
    with pytest.raises(DataloaderConfigError):
        load_dataloader_config(bad)


def test_dataloader_unknown_link_rejected():
    bad = [dict(GOOD[0], text_embeds="missing"), dict(GOOD[1])]
    with pytest.raises(DataloaderConfigError):
        load_dataloader_config(bad)


def test_dataloader_requires_text_embeds():
    with pytest.raises(DataloaderConfigError):
        load_dataloader_config([dict(GOOD[0], text_embeds=None)])


def test_dataloader_global_defaults():
    entries = [
        {"id": "a", "type": "local", "instance_data_dir": "/x"},
        dict(GOOD[1]),
    ]
    configs = load_dataloader_config(entries, global_defaults={"resolution": 512, "caption_strategy": "textfile"})
    a = [c for c in configs if c.id == "a"][0]
    assert a.resolution == 512
    assert a.caption_strategy == "textfile"


def test_disabled_dataset_skipped():
    entries = [dict(GOOD[0]), dict(GOOD[1]), {"id": "off", "type": "local", "disable": True}]
    configs = load_dataloader_config(entries)
    assert all(c.id != "off" for c in configs)


def test_reference_example_multidatabackend_parses():
    # the reference ships an example config; make sure we accept it verbatim
    path = "/root/reference/config/multidatabackend.json.example"
    import os

    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    configs = load_dataloader_config(path)
    assert len(configs) >= 1
