"""UNet ControlNet (SD/SDXL): zero-init identity + controlnet train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.sd1x.model import SD1x
from simpletuner_tpu.models.sdxl.model import SDXL
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make(family_cls, family):
    cfg = TrainingConfig(
        {"model_family": family, "model_type": "controlnet", "model_arch_preset": "tiny",
         "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    )
    model = family_cls(cfg)
    batch = model.example_batch(batch_size=2, resolution=64)
    batch["control_latents"] = jax.random.normal(
        jax.random.PRNGKey(9), batch["latents"].shape, jnp.float32
    )
    variables = dict(model.init_params(jax.random.PRNGKey(0), batch))
    variables["controlnet"] = model.init_controlnet_params(jax.random.PRNGKey(1), batch)
    return model, batch, variables

@pytest.mark.parametrize("family_cls,family", [(SD1x, "sd1x"), (SDXL, "sdxl")])
def test_zero_init_identity_and_step(family_cls, family):
    model, batch, variables = make(family_cls, family)
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    with_cn = model.model_predict(variables, prepared)
    without = model.model_predict(
        {k: v for k, v in variables.items() if k != "controlnet"}, prepared
    )
    np.testing.assert_allclose(np.asarray(with_cn), np.asarray(without), atol=1e-5)

    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    assert "controlnet" in state.trainable
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))