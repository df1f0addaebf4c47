"""Two-stage (full-pipeline) validation: SDXL base/refiner and PixArt eDiff
stage1/stage2 chains (reference sdxl/model.py:352-530 run_multistage_validation,
pixart/model.py:454-620): stage 1 denoises [0, 1-refiner_training_strength) of
one shared ladder, stage 2 finishes it with its own weights."""

import os

import jax
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import get_model_family
from simpletuner_tpu.models.text_encoders import load_text_encoders
from simpletuner_tpu.models.weight_export import save_full_pipeline
from simpletuner_tpu.training.validation import Validation

pytestmark = pytest.mark.slow


def _base_cfg(family, **over):
    base = {
        "model_family": family,
        "model_type": "lora",
        "model_arch_preset": "tiny",
        "lora_rank": 4,
        "optimizer": "adamw",
        "learning_rate": 1e-3,
        "max_train_steps": 10,
        "validation_prompt": "a cat",
        "validation_num_inference_steps": 4,
        "validation_resolution": 64,
        "refiner_training_strength": 0.5,
        "mixed_precision": "fp32",
    }
    base.update(over)
    return TrainingConfig(base)


def _export_fixed_stage(family, tmp_path):
    """A second tiny model with different random weights, exported as a
    diffusers dir through the family's own exporter."""
    cfg = _base_cfg(family, model_type="full", lora_rank=0)
    model = get_model_family(cfg)
    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(99), batch)
    out = str(tmp_path / f"{family}_stage2")
    save_full_pipeline(model, {"params": jax.device_get(variables["params"])}, out)
    return out


def _build(cfg):
    model = get_model_family(cfg)
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    return model


@pytest.mark.parametrize("family,prefix", [("sdxl", "sdxl"), ("pixart_sigma", "pixart")])
def test_full_pipeline_validation_renders_through_both_stages(family, prefix, tmp_path):
    stage2_dir = _export_fixed_stage(family, tmp_path)
    cfg = _base_cfg(
        family,
        **{
            f"{prefix}_validation_pipeline_mode": "full-pipeline",
            f"{prefix}_validation_stage2_model": stage2_dir,
        },
    )
    model = _build(cfg)
    assert model.supports_multistage_validation()

    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)

    plan = model.validation_stage_plan(variables)
    assert len(plan) == 2
    assert plan[0]["model"] is model  # trained base = stage 1
    assert plan[1]["model"] is not model
    assert plan[0]["until"] == pytest.approx(0.5)  # 1 - refiner_training_strength

    validation = Validation(model, cfg, output_dir=str(tmp_path / "out"))
    validation.precompute_embeds()
    paths = validation.run_validations(variables, step=1, force=True)
    assert paths and os.path.exists(paths[0])

    # the chained render must differ from the trained-stage-only render
    # (stage 2 carries different random weights)
    staged = validation._render(variables, validation._embeds[0], 0)
    single = validation._render_single(variables, validation._embeds[0], 0)
    assert staged.shape == single.shape
    assert not np.allclose(staged, single)


def test_trained_stage_mode_is_single_stage():
    cfg = _base_cfg("sdxl", sdxl_validation_pipeline_mode="trained-stage")
    model = _build(cfg)
    assert not model.supports_multistage_validation()
    assert model.validation_stage_plan({}) is None


def test_full_pipeline_requires_local_stage_model():
    cfg = _base_cfg("sdxl", sdxl_validation_pipeline_mode="full-pipeline")
    model = _build(cfg)
    with pytest.raises(ValueError, match="sdxl_validation_stage2_model"):
        model.validation_stage_plan({})


def test_invalid_mode_and_strength_fail_loudly(tmp_path):
    cfg = _base_cfg("sdxl", sdxl_validation_pipeline_mode="both-stages")
    model = _build(cfg)
    with pytest.raises(ValueError, match="sdxl_validation_pipeline_mode"):
        model.supports_multistage_validation()

    cfg2 = _base_cfg(
        "sdxl",
        sdxl_validation_pipeline_mode="full-pipeline",
        refiner_training_strength=0.0,
        sdxl_validation_stage2_model=str(tmp_path),
    )
    model2 = _build(cfg2)
    with pytest.raises(ValueError, match="refiner_training_strength"):
        model2.validation_stage_plan({})


def test_refiner_flavour_marks_stage2_trained(tmp_path):
    """Training the refiner: the FIXED stage is stage 1 (the base)."""
    stage1_dir = _export_fixed_stage("sdxl", tmp_path)
    cfg = _base_cfg(
        "sdxl",
        model_flavour="refiner-1.0",
        sdxl_validation_pipeline_mode="full-pipeline",
        sdxl_validation_stage1_model=stage1_dir,
    )
    model = _build(cfg)
    assert model._staged_current_stage() == 2
    batch = model.example_batch(batch_size=1, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(1), batch)
    plan = model.validation_stage_plan(variables)
    assert plan[0]["model"] is not model  # fixed base
    assert plan[1]["model"] is model      # trained refiner
