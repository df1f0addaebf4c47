"""HiDream MoE: routing math, gate aux loss, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.hidream import HiDream
from simpletuner_tpu.models.hidream.model import HiDreamConfig, HiDreamMoE

pytestmark = pytest.mark.slow

def make_model(**extra):
    cfg = TrainingConfig(
        {"model_family": "hidream", "model_type": "lora", "model_arch_preset": "tiny",
         "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3,
         "max_train_steps": 10, **extra}
    )
    return HiDream(cfg)

class TestMoELayer:
    def test_routing_and_aux(self):
        cfg = HiDreamConfig(num_heads=2, head_dim=8, num_experts=4, top_k=2, multiple_of=8)
        layer = HiDreamMoE(cfg, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, cfg.hidden_size))
        variables = layer.init(jax.random.PRNGKey(1), x)
        out, mutated = layer.apply(variables, x, mutable=["intermediates"])
        assert out.shape == x.shape
        aux = mutated["intermediates"]["moe_aux"][0]
        # balanced-routing lower bound: aux >= top_k when perfectly uniform... at
        # least it must be positive and finite
        assert np.isfinite(float(aux)) and float(aux) > 0

class TestHiDream:
    @pytest.fixture(scope="class")
    def setup(self):
        model = make_model()
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        return model, batch, variables

    def test_forward_shape(self, setup):
        model, batch, variables = setup
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
        assert pred.shape == batch["latents"].shape

    def test_gate_loss_in_training(self, setup):
        model, batch, variables = setup
        loss, aux = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
        assert np.isfinite(float(loss))
        assert "moe_gate_loss" in aux and np.isfinite(float(aux["moe_gate_loss"]))

    def test_train_step(self, setup):
        from simpletuner_tpu.training.optimizers import get_optimizer
        from simpletuner_tpu.training.schedules import get_lr_schedule
        from simpletuner_tpu.training.train_state import build_train_step, create_train_state

        model, batch, variables = setup
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule))
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        assert "moe_gate_loss" in metrics