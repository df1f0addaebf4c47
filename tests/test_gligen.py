"""GLIGEN bbox grounding on UNet families (reference:
helpers/training/grounding/gligen_layers.py PositionNet + gated fusers)."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sd1x.model import SD1x
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

import pytest

pytestmark = pytest.mark.slow

def make_model(**extra):
    cfg = TrainingConfig(
        {"model_family": "sd1x", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3,
         "max_train_steps": 10, "max_grounding_entities": 3, **extra}
    )
    return SD1x(cfg)

def test_grounding_params_created():
    model = make_model()
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    assert "position_net" in variables["params"]
    flat = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(variables["lora"])[0]}
    assert any("gligen_alpha_attn" in k for k in flat)  # gates train with LoRA

def test_zero_gates_are_identity():
    """Fresh fusers (tanh(0)=0) must not change the prediction vs no grounding."""
    model = make_model()
    batch = model.example_batch(batch_size=1, resolution=32)
    batch["latents"] = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    with_grounding = np.asarray(model.model_predict(variables, prepared))
    bare = {k: v for k, v in prepared.items() if not k.startswith("grounding_")}
    without = np.asarray(model.model_predict(variables, bare))
    np.testing.assert_allclose(with_grounding, without, atol=1e-5)

def test_boxes_change_prediction_once_gates_open():
    model = make_model()
    batch = model.example_batch(batch_size=1, resolution=32)
    batch["grounding_boxes"] = jnp.asarray([[[0.1, 0.1, 0.5, 0.5],
                                             [0.4, 0.4, 0.9, 0.9],
                                             [0.0, 0.0, 0.0, 0.0]]], jnp.float32)
    batch["grounding_masks"] = jnp.asarray([[1.0, 1.0, 0.0]], jnp.float32)
    batch["grounding_phrases"] = jax.random.normal(jax.random.PRNGKey(2), batch["grounding_phrases"].shape)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # open the gates
    variables = dict(variables)
    variables["lora"] = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.full_like(v, 0.7) if "gligen_alpha" in jax.tree_util.keystr(p) else v,
        variables["lora"],
    )
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred_a = np.asarray(model.model_predict(variables, prepared))
    moved = dict(prepared)
    moved["grounding_boxes"] = prepared["grounding_boxes"].at[:, 0].set(
        jnp.asarray([0.6, 0.6, 0.95, 0.95])
    )
    pred_b = np.asarray(model.model_predict(variables, moved))
    assert not np.allclose(pred_a, pred_b, atol=1e-5)

def test_grounded_train_step():
    model = make_model()
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["latents"] = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
    batch["grounding_masks"] = jnp.ones_like(batch["grounding_masks"])
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))