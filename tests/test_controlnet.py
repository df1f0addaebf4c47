"""Flux ControlNet: zero-init identity, residual injection, controlnet-only

training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def setup():
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "controlnet",
            "controlnet_depth": 1,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["control_latents"] = jax.random.normal(
        jax.random.PRNGKey(9), batch["latents"].shape, jnp.float32
    )
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    variables = dict(variables)
    variables["controlnet"] = model.init_controlnet_params(jax.random.PRNGKey(1), batch)
    return model, batch, variables

def test_zero_init_identity(setup):
    """Freshly-initialized controlnet must not change the prediction."""
    model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    base_vars = {k: v for k, v in variables.items() if k != "controlnet"}
    with_cn = model.model_predict(variables, prepared)
    without = model.model_predict(base_vars, prepared)
    np.testing.assert_allclose(np.asarray(with_cn), np.asarray(without), atol=1e-5)

def test_nonzero_residuals_change_output(setup):
    model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    without = model.model_predict(
        {k: v for k, v in variables.items() if k != "controlnet"}, prepared
    )
    poked = jax.tree_util.tree_map(lambda p: p, variables["controlnet"])
    # set the residual projection away from zero
    proj = poked["residual_proj_0"]["kernel"]
    poked["residual_proj_0"]["kernel"] = jnp.ones_like(proj) * 0.05
    out = model.model_predict({**variables, "controlnet": poked}, prepared)
    assert not np.allclose(np.asarray(out), np.asarray(without), atol=1e-4)

def test_controlnet_train_step(setup):
    model, batch, variables = setup
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    assert "controlnet" in state.trainable and "params" in state.frozen
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    before = jax.tree_util.tree_leaves(state.trainable)[0].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree_util.tree_leaves(state.trainable)[0]
    assert bool(jnp.any(before != after)) or float(jnp.linalg.norm(before)) == 0.0