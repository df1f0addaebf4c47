"""LoRA export key maps per family: exported safetensors must use the

diffusers/PEFT module paths (and ComfyUI's diffusion_model.* layout) that the
reference ecosystem loads (reference helpers/training/lora_format.py,
save_hooks.py model-type-aware export) — not raw flax paths."""

import re

import numpy as np
import pytest
import jax

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.training.lora import load_lora_safetensors, lora_state_dict, save_lora_safetensors

pytestmark = pytest.mark.slow

FAMILIES = ["flux", "sd3", "sdxl", "wan", "pixart_sigma", "sana", "auraflow",
            "ltxvideo", "chroma", "qwen_image", "hunyuanvideo", "kolors", "cosmos"]

def _model(family):
    cfg = TrainingConfig(
        {"model_family": family, "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 2, "optimizer": "adamw", "learning_rate": 1e-4, "max_train_steps": 5}
    )
    model = ModelRegistry.create(family, cfg)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    return model, variables

@pytest.mark.parametrize("family", FAMILIES)
def test_exported_keys_are_ecosystem_paths(family):
    model, variables = _model(family)
    assert "lora" in variables, f"{family} has no lora collection"
    tensors = lora_state_dict(model, variables["lora"], format="diffusers")
    assert tensors, f"{family} exported empty lora"
    prefix = "transformer." if model.MODEL_TYPE == "transformer" else "unet."
    mapped = 0
    for key in tensors:
        assert key.startswith(prefix), key
        assert key.endswith(".lora_A.weight") or key.endswith(".lora_B.weight"), key
        # an ecosystem path never contains a flax '/' or our internal names
        assert "/" not in key, key
        body = key[len(prefix):]
        if re.match(
            r"(transformer_blocks|single_transformer_blocks|joint_transformer_blocks|"
            r"blocks|down_blocks|mid_block|up_blocks)\.", body
        ):
            mapped += 1
    # the vast majority of adapter weights live in mapped block paths
    assert mapped >= len(tensors) * 0.8, (family, mapped, len(tensors))

@pytest.mark.parametrize("family", ["sd3", "sdxl", "wan", "pixart_sigma", "auraflow"])
def test_lora_roundtrip_through_export(family, tmp_path):
    model, variables = _model(family)
    lora = variables["lora"]
    # randomize B so the roundtrip is non-trivial
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(1), x.shape) * 0.02, lora
    )
    path = tmp_path / f"{family}.safetensors"
    save_lora_safetensors(model, lora, str(path), format="diffusers")
    loaded = load_lora_safetensors(model, str(path), variables["lora"])

    flat_a = jax.tree_util.tree_leaves(lora)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

def test_comfyui_layout(tmp_path):
    model, variables = _model("sd3")
    tensors = lora_state_dict(model, variables["lora"], format="comfyui")
    for key in tensors:
        assert key.startswith("diffusion_model."), key
        assert key.endswith((".lora_down.weight", ".lora_up.weight", ".alpha")), key