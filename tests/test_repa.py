"""LayerSync / CREPA representation alignment losses over sow taps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.models.wan import Wan
from simpletuner_tpu.training.repa import RepaConfig, repa_auxiliary_loss

pytestmark = pytest.mark.slow

def make_flux(**extra):
    cfg = TrainingConfig(
        {"model_family": "flux", "model_type": "lora", "lora_rank": 4,
         "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10, **extra}
    )
    return Flux(cfg, arch=FluxConfig.tiny())

def test_intermediates_captured():
    model = make_flux()
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred, interms = model.model_predict_with_intermediates(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert len(interms) == model.arch.depth_double + model.arch.depth_single

def test_layersync_loss_in_train():
    model = make_flux(layersync_gamma=0.5, layersync_source_layer=0)
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)

    def loss(lora):
        value, aux = model.loss_fn({**variables, "lora": lora}, jax.random.PRNGKey(1), batch)
        return value, aux

    (value, aux), grads = jax.jit(jax.value_and_grad(loss, has_aux=True))(variables["lora"])
    assert np.isfinite(float(value))
    assert "layersync_loss" in aux
    assert np.isfinite(float(aux["layersync_loss"]))

def test_crepa_with_teacher_embeds():
    model = make_flux(crepa_weight=1.0, crepa_layer=1)
    batch = model.example_batch(batch_size=1, resolution=32)
    # teacher features: (B, tokens, D_t)
    batch["teacher_embeds"] = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 32))
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    value, aux = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(value))
    assert "crepa_loss" in aux

def test_wan_intermediates():
    cfg = TrainingConfig(
        {"model_family": "wan", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3,
         "max_train_steps": 10, "layersync_gamma": 0.1}
    )
    model = Wan(cfg)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    value, aux = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(value))
    assert "layersync_loss" in aux

def test_disabled_by_default():
    config = RepaConfig.from_config(make_flux().config)
    assert not config.enabled

def test_urepa_unet_mid_block():
    from simpletuner_tpu.models.sd1x.model import SD1x

    cfg = TrainingConfig(
        {"model_family": "sd1x", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3,
         "max_train_steps": 10, "urepa_enabled": True, "urepa_lambda": 0.5}
    )
    model = SD1x(cfg)
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["latents"] = jax.random.normal(jax.random.PRNGKey(4), batch["latents"].shape)
    batch["teacher_embeds"] = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 16))
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    value, aux = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(value))
    assert "urepa_alignment_loss" in aux and "urepa_manifold_loss" in aux