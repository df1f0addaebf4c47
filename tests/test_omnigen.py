"""OmniGen unified multimodal DiT: forward shapes, mask semantics, and a LoRA

train step (reference: helpers/models/omnigen/{model,transformer}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.omnigen.model import OmniGen
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make_model(**extra):
    cfg = TrainingConfig(
        {
            "model_family": "omnigen",
            "model_type": "lora",
            "lora_rank": 4,
            "model_arch_preset": "tiny",
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            **extra,
        }
    )
    return OmniGen(cfg)

@pytest.fixture(scope="module")
def model_and_vars():
    model = make_model()
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["input_ids"] = jax.random.randint(jax.random.PRNGKey(0), batch["input_ids"].shape, 0, 128)
    variables = model.init_params(jax.random.PRNGKey(1), batch)
    return model, variables, batch

def test_registered():
    assert "omnigen" in ModelRegistry.families()
    assert ModelRegistry.metadata("omnigen")["prediction"] == "flow_matching"

def test_predict_shape(model_and_vars):
    model, variables, batch = model_and_vars
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape
    assert np.isfinite(np.asarray(pred)).all()

def test_text_padding_masks_tokens(model_and_vars):
    """Changing a padded-out token id must not change the prediction; changing
    a real token must."""
    model, variables, batch = model_and_vars
    mask = np.ones(batch["input_ids"].shape, np.float32)
    mask[:, 8:] = 0.0
    batch = dict(batch)
    batch["text_attention_mask"] = jnp.asarray(mask)
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    base = np.asarray(model.model_predict(variables, prepared))

    padded = dict(prepared)
    padded["input_ids"] = prepared["input_ids"].at[:, 12].set(77)
    assert np.allclose(np.asarray(model.model_predict(variables, padded)), base, atol=1e-5)

    real = dict(prepared)
    real["input_ids"] = prepared["input_ids"].at[:, 2].set(
        (prepared["input_ids"][:, 2] + 1) % 128
    )
    assert not np.allclose(np.asarray(model.model_predict(variables, real)), base, atol=1e-5)

def test_lora_train_step(model_and_vars):
    model, _, batch = model_and_vars
    batch = dict(batch)
    batch["latents"] = jax.random.normal(jax.random.PRNGKey(5), batch["latents"].shape)
    variables = model.init_params(jax.random.PRNGKey(1), batch)
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0