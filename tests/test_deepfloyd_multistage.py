"""DeepFloyd IF multi-stage validation (reference deepfloyd/model.py:244
run_multistage_validation: stage I 64px t2i -> stage II 4x SR with noised
low-res conditioning + aug-level class embedding; stage III optional)."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.deepfloyd.model import DeepFloyd
from simpletuner_tpu.models.unet import UNetConfig


def _cfg(**extra):
    return TrainingConfig(
        {
            "model_family": "deepfloyd",
            "model_type": "full",
            "model_arch_preset": "tiny",
            "optimizer": "adamw",
            "learning_rate": 1e-4,
            "max_train_steps": 10,
            **extra,
        }
    )


def test_class_embed_timestep_changes_output():
    """The aug-level class embedding must actually condition the UNet."""
    from simpletuner_tpu.models.unet import UNet2DCondition

    arch = dataclasses.replace(
        UNetConfig.tiny(), in_channels=6, out_channels=3, class_embed_timestep=True
    )
    unet = UNet2DCondition(arch)
    sample = jnp.zeros((1, 16, 16, 6))
    t = jnp.array([10.0])
    ctx = jnp.zeros((1, 8, arch.cross_attention_dim))
    variables = unet.init(jax.random.PRNGKey(0), sample, t, ctx, class_labels=jnp.array([0.0]))
    out_a = unet.apply(variables, sample, t, ctx, class_labels=jnp.array([0.0]))
    out_b = unet.apply(variables, sample, t, ctx, class_labels=jnp.array([700.0]))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    # params carry the diffusers class_embedding MLP pair
    assert "class_embed_0" in variables["params"] and "class_embed_2" in variables["params"]


def test_stage2_training_inputs_duplicate_latents():
    """Reference deepfloyd/model.py:384-395: SR training doubles the noisy
    latents onto the conditioning channels and feeds timesteps as aug level."""
    cfg = _cfg(model_flavour="ii-m-450m")
    model = DeepFloyd(cfg)
    assert model.arch.in_channels == 6 and model.arch.class_embed_timestep
    prepared = {
        "noisy_latents": jnp.ones((2, 16, 16, 3)),
        "timesteps": jnp.array([5.0, 9.0]),
        "text_embeds": jnp.zeros((2, 8, model.arch.cross_attention_dim)),
    }
    inputs = model.get_model_inputs(prepared)
    assert inputs["sample"].shape == (2, 16, 16, 6)
    np.testing.assert_array_equal(
        np.asarray(inputs["class_labels"]), np.asarray(prepared["timesteps"])
    )


def test_stage2_inference_inputs_use_sr_condition():
    cfg = _cfg(model_flavour="ii-m-450m")
    model = DeepFloyd(cfg)
    prepared = {
        "noisy_latents": jnp.ones((1, 16, 16, 3)),
        "timesteps": jnp.array([5.0]),
        "text_embeds": jnp.zeros((1, 8, model.arch.cross_attention_dim)),
        "sr_condition": 2.0 * jnp.ones((1, 16, 16, 3)),
        "aug_level": jnp.array([250.0]),
    }
    inputs = model.get_model_inputs(prepared)
    np.testing.assert_allclose(np.asarray(inputs["sample"][..., 3:]), 2.0, atol=1e-3)
    assert float(inputs["class_labels"][0]) == 250.0


def test_pipeline_mode_validation():
    with pytest.raises(ValueError):
        DeepFloyd(_cfg(deepfloyd_validation_pipeline_mode="bogus"))._validation_mode()
    assert DeepFloyd(_cfg())._validation_mode() == "full-pipeline"
    assert (
        DeepFloyd(_cfg(validation_using_datasets=True))._validation_mode()
        == "trained-stage"
    )
    with pytest.raises(ValueError):
        DeepFloyd(_cfg(deepfloyd_validation_stage3_mode="bogus"))._stage3_mode()


def _export_stage2_checkpoint(tmp_path):
    """Write a tiny IF-II diffusers dir our stage loader can consume."""
    from safetensors.numpy import save_file

    from simpletuner_tpu.models.weight_export import export_unet_to_diffusers

    cfg2 = _cfg(model_flavour="ii-m-450m")
    stage2 = DeepFloyd(cfg2)
    batch = stage2.example_batch(batch_size=1, resolution=16)
    variables = stage2.init_params(jax.random.PRNGKey(7), batch)
    weights = export_unet_to_diffusers(jax.device_get(variables["params"]), stage2.arch)
    unet_dir = os.path.join(tmp_path, "stage2", "unet")
    os.makedirs(unet_dir)
    save_file(weights, os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(unet_dir, "config.json"), "w") as fh:
        json.dump(dataclasses.asdict(stage2.arch), fh)
    return os.path.join(tmp_path, "stage2")


def test_full_pipeline_render_chains_stages(tmp_path, monkeypatch):
    """Trained stage I + fixed stage II checkpoint: the custom renderer must
    produce a 4x-edge uint8 image through both stages.  The reference 64px
    floor is shrunk so the CPU render stays tiny (the real ladder is
    validated by the floor math assertions below)."""
    monkeypatch.setattr(DeepFloyd, "STAGE_MIN_EDGE", 8)
    stage2_dir = _export_stage2_checkpoint(str(tmp_path))
    cfg = _cfg(
        deepfloyd_validation_stage2_model=stage2_dir,
        validation_num_inference_steps=2,
        validation_resolution=32,
        validation_prompt="a photo",
    )
    model = DeepFloyd(cfg)
    batch = model.example_batch(batch_size=1, resolution=16)
    variables = model.init_params(jax.random.PRNGKey(0), batch)

    from simpletuner_tpu.training.validation import Validation

    validation = Validation(model, cfg, output_dir=str(tmp_path / "out"))
    embeds = {
        "text_embeds": np.zeros((8, model.arch.cross_attention_dim), np.float32)
    }
    image = model.validation_multistage_render(validation, variables, embeds, 0)
    assert image is not None
    assert image.dtype == np.uint8
    # ladder: stage1 = max(8, 32//4) = 8, stage2 = 4x = 32
    assert image.shape == (32, 32, 3)


def test_reference_resolution_ladder_floors_at_64():
    """The production ladder keeps the reference's 64px stage-1 floor."""
    assert DeepFloyd.STAGE_MIN_EDGE == 64
    floor = DeepFloyd.STAGE_MIN_EDGE
    for requested, stage3 in ((64, 1), (256, 1), (1024, 4)):
        stage2 = max(floor, requested // stage3)
        stage1 = max(8, (max(floor, stage2 // 4) // 8) * 8)
        assert stage1 >= 64 and stage1 * 4 >= 256


def test_full_pipeline_requires_stage_checkpoint(tmp_path):
    cfg = _cfg(validation_num_inference_steps=2, validation_resolution=64,
               validation_prompt="a photo")
    model = DeepFloyd(cfg)
    batch = model.example_batch(batch_size=1, resolution=16)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    from simpletuner_tpu.training.validation import Validation

    validation = Validation(model, cfg, output_dir=str(tmp_path / "out"))
    embeds = {"text_embeds": np.zeros((8, model.arch.cross_attention_dim), np.float32)}
    with pytest.raises(ValueError, match="deepfloyd_validation_stage2_model"):
        model.validation_multistage_render(validation, variables, embeds, 0)
