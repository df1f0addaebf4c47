"""Configure TUI: registry-driven session, presets, LyCORIS builder, and the
headless navigation core (reference: simpletuner/configure.py TUI wizard)."""

import json

from simpletuner_tpu.cli.configure_tui import (
    DEFAULT_MODELS,
    MEMORY_PRESETS,
    ConfigSession,
    CursesWizard,
    LycorisBuilder,
)
from simpletuner_tpu.configuration.fields import REGISTRY


def test_sections_cover_registry():
    session = ConfigSession()
    names = {f.name for s in session.sections() for f in s.fields}
    assert names == set(REGISTRY.names())
    assert len(session.sections()) >= 8  # model/lora/data/loss/... groups


def test_set_coerces_and_validates():
    session = ConfigSession()
    assert session.set("train_batch_size", "4") is None
    assert session.get("train_batch_size") == 4
    assert "not in" in session.set("lora_type", "bogus")
    error = session.set("learning_rate", "not-a-float")
    assert error and "float" in error.lower()
    # clearing returns to the default
    session.set("train_batch_size", "")
    assert session.get("train_batch_size") == REGISTRY.get("train_batch_size").default


def test_family_quickstart_sets_model_defaults():
    session = ConfigSession()
    session.apply_family("flux")
    assert session.get("model_family") == "flux"
    assert session.get("pretrained_model_name_or_path") == DEFAULT_MODELS["flux"]
    assert session.get("validation_guidance") == 3.0
    # user-set values are never clobbered
    session2 = ConfigSession()
    session2.set("pretrained_model_name_or_path", "/models/mine")
    session2.apply_family("flux")
    assert session2.get("pretrained_model_name_or_path") == "/models/mine"


def test_memory_presets_apply():
    session = ConfigSession()
    session.apply_memory_preset("16g-chip")
    assert session.get("base_model_precision") == "int8-quanto"
    assert session.get("gradient_checkpointing") is True
    assert session.get("train_batch_size") == 1
    for preset in MEMORY_PRESETS:
        ConfigSession().apply_memory_preset(preset)


def test_lycoris_builder_roundtrip():
    builder = LycorisBuilder()
    builder.set_algorithm("lokr")
    builder.set_option("factor", 8)
    builder.set_module_override("transformer_blocks.0.attn", {"algo": "lora", "dim": 8})
    session = ConfigSession()
    session.apply_lycoris(builder)
    cfg = session.get("lycoris_config")
    assert cfg["algo"] == "lokr" and cfg["factor"] == 8
    assert cfg["apply_preset"]["name_algo_map"]["transformer_blocks.0.attn"]["dim"] == 8
    assert session.get("lora_type") == "lycoris"


def test_save_load_roundtrip_with_passthrough(tmp_path):
    session = ConfigSession()
    session.apply_family("sdxl")
    session.set("max_train_steps", 100)
    session.unknown["custom_userspace_key"] = {"x": 1}
    path = session.save(str(tmp_path / "config.json"))

    loaded = ConfigSession()
    loaded.load(path)
    assert loaded.get("model_family") == "sdxl"
    assert loaded.get("max_train_steps") == 100
    assert loaded.unknown["custom_userspace_key"] == {"x": 1}
    # lycoris dict survives load unstringified
    builder = LycorisBuilder()
    session.apply_lycoris(builder)
    session.save(path)
    loaded2 = ConfigSession()
    loaded2.load(path)
    assert isinstance(loaded2.get("lycoris_config"), dict)


def test_validate_all_accepts_wizard_output(tmp_path):
    session = ConfigSession()
    session.apply_family("flux")
    session.set("model_type", "lora")
    session.set("lora_rank", 16)
    session.set("max_train_steps", 10)
    session.set("optimizer", "adamw")
    session.set("learning_rate", 1e-4)
    assert session.validate_all() == []


def test_headless_navigation():
    wiz = CursesWizard()
    first_section = wiz.current_fields()
    assert first_section, "first tab renders fields"
    wiz.switch_tab(1)
    assert wiz.current_fields() != first_section
    wiz.move(1)
    assert wiz.row == 1
    # search filters across every section
    wiz.set_search("lora_rank")
    assert wiz.current_fields()[0].name == "lora_rank"  # help-text matches ride along
    assert wiz.edit_current("8") is None
    assert wiz.session.get("lora_rank") == 8
    # bool toggle
    wiz.set_search("gradient_checkpointing")
    wiz.row = [f.name for f in wiz.current_fields()].index("gradient_checkpointing")
    wiz.toggle_current()
    assert wiz.session.get("gradient_checkpointing") is True
