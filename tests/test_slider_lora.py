"""Slider LoRA: ± polarity scaling of the adapter inside the train step."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

import pytest

pytestmark = pytest.mark.slow

def test_slider_scale_flips_adapter():
    cfg = TrainingConfig(
        {"model_family": "flux", "model_type": "lora", "lora_rank": 4,
         "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=2, resolution=32)
    from test_train_step import _open_adaln_gates

    variables = _open_adaln_gates(model.init_params(jax.random.PRNGKey(0), batch))
    schedule = get_lr_schedule(cfg, 10)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule))

    batch_pos = dict(batch)
    batch_pos["slider_scale"] = jnp.asarray(1.0)
    batch_neg = dict(batch)
    batch_neg["slider_scale"] = jnp.asarray(-1.0)

    _, m_pos = step(state, batch_pos, jax.random.PRNGKey(1))
    _, m_neg = step(state, batch_neg, jax.random.PRNGKey(1))
    # fresh adapters (B=0): identical loss either polarity; both run fine
    assert np.isfinite(float(m_pos["loss"])) and np.isfinite(float(m_neg["loss"]))
    np.testing.assert_allclose(float(m_pos["loss"]), float(m_neg["loss"]), rtol=1e-5)

    # with non-zero B, the polarities diverge
    leaves, treedef = jax.tree_util.tree_flatten(state.trainable["lora"])
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    state2 = state.replace(trainable={"lora": jax.tree_util.tree_unflatten(treedef, leaves)})
    _, m_pos2 = step(state2, batch_pos, jax.random.PRNGKey(1))
    _, m_neg2 = step(state2, batch_neg, jax.random.PRNGKey(1))
    assert abs(float(m_pos2["loss"]) - float(m_neg2["loss"])) > 1e-7