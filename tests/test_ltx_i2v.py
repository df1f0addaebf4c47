"""LTX-Video family + Wan I2V flavour tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.ltxvideo import LTXVideo
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.models.wan import Wan

pytestmark = pytest.mark.slow

def test_ltx_registry_and_forward():
    cfg = TrainingConfig(
        {"model_family": "ltxvideo", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    assert ModelRegistry.get("ltxvideo") is LTXVideo
    model = LTXVideo(cfg)
    assert model.arch.patch == (1, 1, 1)
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
    assert pred.shape == batch["latents"].shape

def test_ltx_full_vae_factors():
    cfg = TrainingConfig(
        {"model_family": "ltxvideo", "model_type": "lora", "lora_rank": 4,
         "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    vae_cfg = LTXVideo(cfg).video_vae_config()
    assert vae_cfg.spatial_factor == 32
    assert vae_cfg.temporal_factor == 8
    assert vae_cfg.latent_channels == 128

def test_wan_i2v_conditioning():
    cfg = TrainingConfig(
        {"model_family": "wan", "model_flavour": "i2v-14b-480p", "model_type": "lora",
         "model_arch_preset": "tiny", "lora_rank": 4, "optimizer": "adamw",
         "learning_rate": 1e-3, "max_train_steps": 10}
    )
    model = Wan(cfg)
    assert model.is_i2v
    # tiny arch path keeps tiny dims; check channel math on a custom arch
    from simpletuner_tpu.models.wan.transformer import WanConfig

    cfg2 = TrainingConfig(
        {"model_family": "wan", "model_flavour": "i2v-14b-480p", "model_type": "lora",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    model2 = Wan(cfg2)
    assert model2.arch.in_channels == 16 * 2 + 4
    assert model2.latent_channels == 16

    # run the tiny-arch i2v forward with explicit i2v-shaped arch
    arch = WanConfig(in_channels=4 * 2 + 4, out_channels=4, hidden_size=64, depth=2,
                     num_heads=2, head_dim=32, text_dim=32, axes_dim=(12, 10, 10))
    model3 = Wan(cfg, arch=arch)
    batch = {
        "latents": jnp.zeros((1, 3, 8, 8, 4), jnp.float32),
        "text_embeds": jnp.zeros((1, 16, 32), jnp.float32),
    }
    variables = model3.init_params(jax.random.PRNGKey(0), batch)
    prepared = model3.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model3.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape

def test_hunyuanvideo_forward_and_step():
    from simpletuner_tpu.models.hunyuanvideo import HunyuanVideo
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    cfg = TrainingConfig(
        {"model_family": "hunyuanvideo", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    assert ModelRegistry.get("hunyuanvideo") is HunyuanVideo
    model = HunyuanVideo(cfg)
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
    assert pred.shape == batch["latents"].shape

    schedule = get_lr_schedule(cfg, 10)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))

def _ltx_tiny(**extra):
    cfg = TrainingConfig(
        {"model_family": "ltxvideo", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3,
         "max_train_steps": 10, **extra}
    )
    return LTXVideo(cfg)


def test_ltx_protect_first_frame():
    """ltx_protect_first_frame: frame 0 trains at sigma 0 — the model input's
    first frame IS the clean latent (reference ltxvideo/__init__.py:65)."""
    model = _ltx_tiny(ltx_protect_first_frame=True)
    batch = model.example_batch(batch_size=2, resolution=32)
    batch = dict(batch, latents=jax.random.normal(jax.random.PRNGKey(7), batch["latents"].shape))
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    assert prepared["timesteps"].shape == batch["latents"].shape[:2]  # (B, T)
    np.testing.assert_array_equal(np.asarray(prepared["timesteps"][:, 0]), 0.0)
    np.testing.assert_allclose(
        np.asarray(prepared["noisy_latents"][:, 0]),
        np.asarray(batch["latents"][:, 0]), rtol=1e-6)
    # later frames still noised at the sampled sigma
    assert float(jnp.abs(prepared["noisy_latents"][:, 1] - batch["latents"][:, 1]).max()) > 0

    # per-frame timesteps ride through the transformer
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
    assert pred.shape == batch["latents"].shape


def test_ltx_partial_first_frame_noise():
    """ltx_i2v_prob=1 + partial_noise_fraction: frame 0's sigma and noise
    scale down by a random fraction < partial_noise_fraction."""
    model = _ltx_tiny(ltx_i2v_prob=1.0, ltx_partial_noise_fraction=0.05)
    batch = model.example_batch(batch_size=4, resolution=32)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    t = np.asarray(prepared["timesteps"])
    assert t.shape == batch["latents"].shape[:2]
    # frame 0 reduced but by less than the 5% cap; other frames untouched
    assert (t[:, 0] < t[:, 1]).all()
    assert (t[:, 0] >= t[:, 1] * 0.95 - 1e-6).all()
    np.testing.assert_allclose(t[:, 1], t[:, 2])

    # probability 0 -> scalar path, byte-identical to the plain prep
    off = _ltx_tiny(ltx_i2v_prob=0.0)
    plain = off.prepare_batch(jax.random.PRNGKey(1), batch)
    assert plain["timesteps"].ndim == 1
