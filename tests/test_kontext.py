"""Flux Kontext edit conditioning: reference tokens concat + prediction slice."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig

import pytest

pytestmark = pytest.mark.slow

def make_model():
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_flavour": "kontext",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    return Flux(cfg, arch=FluxConfig.tiny())

def test_kontext_forward_shape_and_conditioning_effect():
    model = make_model()
    assert model.is_kontext
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["control_latents"] = jax.random.normal(
        jax.random.PRNGKey(5), batch["latents"].shape, jnp.float32
    )
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # AdaLN-zero gates make fresh blocks identity maps; nudge every param off
    # zero so joint attention actually flows
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_unflatten(treedef, leaves)

    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
    assert pred.shape == batch["latents"].shape

    # a different reference image must change the prediction (tokens attend jointly)
    prepared2 = dict(prepared)
    prepared2["control_latents"] = prepared["control_latents"] + 1.0
    pred2 = model.model_predict(variables, prepared2)
    assert not np.allclose(np.asarray(pred), np.asarray(pred2), atol=1e-5)

def test_kontext_train_step():
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    model = make_model()
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["control_latents"] = jax.random.normal(
        jax.random.PRNGKey(5), batch["latents"].shape, jnp.float32
    )
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))