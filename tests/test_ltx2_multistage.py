"""LTX-2 multistage (spatial-upscale) validation: stage 1 renders at half
resolution, the latent upsampler doubles it, stage 2 re-noises at
LTX2_STAGE2_SIGMAS[0] and denoises the short ladder (reference ltxvideo2
model.py:140, :945-994, :1026-1089)."""

import numpy as np
import jax
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.ltxvideo2 import LTXVideo2
from simpletuner_tpu.training.validation import Validation

pytestmark = pytest.mark.slow


def _model(mode):
    cfg = TrainingConfig(
        {
            "model_family": "ltxvideo2", "model_type": "lora", "lora_rank": 4,
            "model_arch_preset": "tiny", "optimizer": "adamw",
            "learning_rate": 1e-3, "max_train_steps": 10,
            "validation_prompt": "a dog", "validation_num_inference_steps": 3,
            "validation_resolution": 32,
            "ltx2_validation_pipeline_mode": mode,
            "ltx2_validation_spatial_upsampler_model": None,
        }
    )
    model = LTXVideo2(cfg)
    from simpletuner_tpu.models.text_encoders import load_text_encoders

    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    return model, cfg


def test_mode_gate():
    model, _ = _model("trained-stage")
    assert not model.supports_multistage_validation()
    model, _ = _model("spatial-upscale")
    assert model.supports_multistage_validation()
    model, _ = _model("bogus")
    with pytest.raises(ValueError, match="trained-stage or spatial-upscale"):
        model.supports_multistage_validation()


def test_upscaler_fails_loud_without_checkpoint():
    model, cfg = _model("spatial-upscale")
    # non-tiny arch preset → must refuse random-weight fallback
    model.config.model_arch_preset = None
    with pytest.raises(ValueError, match="no silent random-weight fallback"):
        model.latent_upsampler()


def test_spatial_upscale_latents_shape():
    model, _ = _model("spatial-upscale")
    latents = jax.numpy.asarray(np.random.default_rng(0).normal(0, 1, (1, 2, 4, 4, model.arch.in_channels)), jax.numpy.float32)
    up = model.spatial_upscale_latents(latents)
    assert up.shape == (1, 2, 8, 8, model.arch.in_channels)
    assert np.isfinite(np.asarray(up)).all()


def test_multistage_validation_end_to_end(tmp_path):
    model, cfg = _model("spatial-upscale")
    validation = Validation(model, cfg, output_dir=str(tmp_path))
    validation.precompute_embeds()
    batch = model.example_batch(batch_size=1)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    paths = validation.run_validations(variables, step=1, force=True)
    assert paths
    import os

    assert os.path.exists(paths[0])
