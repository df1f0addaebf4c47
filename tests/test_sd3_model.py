"""SD3 MMDiT family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.models.sd3 import SD3, SD3Config
from simpletuner_tpu.models.sd3.transformer import posemb_2d_sincos
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make_cfg(**extra):
    return TrainingConfig(
        {
            "model_family": "sd3",
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            **extra,
        }
    )

@pytest.fixture(scope="module")
def setup():
    model = SD3(make_cfg())
    batch = model.example_batch(batch_size=2, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, variables

def test_registry():
    assert ModelRegistry.get("sd3") is SD3

def test_posemb_shape_and_distinct():
    pos = posemb_2d_sincos(4, 6, 64)
    assert pos.shape == (24, 64)
    assert not np.allclose(np.asarray(pos[0]), np.asarray(pos[1]))

def test_forward_shape(setup):
    model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
    assert pred.shape == batch["latents"].shape

def test_flow_target(setup):
    model, batch, _ = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    np.testing.assert_allclose(
        np.asarray(prepared["target"]),
        np.asarray(prepared["noise"] - batch["latents"]),
        atol=1e-6,
    )

def test_train_step(setup):
    model, batch, variables = setup
    cfg = model.config
    schedule = get_lr_schedule(cfg, 10)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

def test_text_encoding_tiny():
    from simpletuner_tpu.models.text_encoders import load_text_encoders

    model = SD3(make_cfg())
    model.attach_text_encoders(load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True))
    embeds = model.encode_text(["a cat"])
    e = embeds[0]
    assert e["text_embeds"].shape[-1] == model.arch.context_dim
    assert e["pooled_embeds"].shape == (model.arch.pooled_dim,)
    collated = model.collate_text_embeds(embeds)
    assert collated["text_embeds"].shape[0] == 1

def test_full_arch_configs():
    assert SD3Config.medium().depth == 24
    assert SD3Config.large().hidden_size == 2432