"""int8/fp8 base-weight quantization: round-trip accuracy, memory layout, and a

quantized LoRA train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.quantization import (
    QuantizedParam,
    dequantize_params,
    has_quantized,
    quantize_params,
    resolve_precision,
)
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

class TestQuantizeRoundtrip:
    def test_int8_error_bounded(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.02
        q = quantize_params({"params": {"lin": {"kernel": w}}}, "int8")
        assert q["params"]["lin"]["kernel"].dtype == jnp.int8
        assert q["qscales"]["lin"]["kernel_scale"].shape == (128,)
        back = dequantize_params(q, jnp.float32)["params"]["lin"]["kernel"]
        err = jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w))
        assert float(err) < 1e-2  # ~7 bits of mantissa per channel

    def test_fp8_error_bounded(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (64, 128)) * 0.02
        q = quantize_params({"params": {"lin": {"kernel": w}}}, "fp8")
        back = dequantize_params(q, jnp.float32)["params"]["lin"]["kernel"]
        err = jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w))
        assert float(err) < 8e-2

    def test_small_leaves_not_quantized(self):
        tree = {"params": {"lin": {"bias": jnp.ones((64,)), "kernel": jnp.ones((64, 64))}}}
        q = quantize_params(tree, "int8")
        assert q["params"]["lin"]["bias"].dtype == jnp.float32
        assert q["params"]["lin"]["kernel"].dtype == jnp.int8
        assert has_quantized(q)

    def test_precision_aliases(self):
        cfg = TrainingConfig(
            {"model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
             "max_train_steps": 1, "base_model_precision": "int8-quanto"}
        )
        assert resolve_precision(cfg) == "int8"
        cfg.base_model_precision = "no_change"
        assert resolve_precision(cfg) is None
        cfg.base_model_precision = "bogus"
        with pytest.raises(ValueError):
            resolve_precision(cfg)

class TestQuantizedTraining:
    def test_lora_step_with_int8_base(self):
        cfg = TrainingConfig(
            {
                "model_family": "flux",
                "model_type": "lora",
                "lora_rank": 4,
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 10,
            }
        )
        model = Flux(cfg, arch=FluxConfig.tiny())
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(cfg, 10)
        tx = get_optimizer(cfg, schedule)

        state_fp = create_train_state(model, variables, tx)
        state_q = create_train_state(model, variables, tx, quantize_mode="int8")
        assert has_quantized(state_q.frozen)

        step = jax.jit(build_train_step(model, tx, schedule))
        _, metrics_fp = step(state_fp, batch, jax.random.PRNGKey(1))
        state_q2, metrics_q = step(state_q, batch, jax.random.PRNGKey(1))
        # quantized base changes the loss only slightly
        assert abs(float(metrics_q["loss"]) - float(metrics_fp["loss"])) < 0.15 * max(
            float(metrics_fp["loss"]), 1e-6
        )
        # frozen stays quantized through the step
        assert has_quantized(state_q2.frozen)

    def test_full_model_quantization_rejected(self):
        cfg = TrainingConfig(
            {"model_family": "flux", "model_type": "full", "optimizer": "adamw",
             "learning_rate": 1e-4, "max_train_steps": 1}
        )
        model = Flux(cfg, arch=FluxConfig.tiny())
        batch = model.example_batch(batch_size=1, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        tx = get_optimizer(cfg, get_lr_schedule(cfg, 1))
        with pytest.raises(ValueError, match="model_type=lora"):
            create_train_state(model, variables, tx, quantize_mode="int8")

def test_quantized_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore with QuantizedParam nodes in frozen state."""
    import jax

    from simpletuner_tpu.training.checkpoints import CheckpointManager

    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule

    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    tx = get_optimizer(cfg, get_lr_schedule(cfg, 10))
    state = create_train_state(model, variables, tx, quantize_mode="int8")

    manager = CheckpointManager(str(tmp_path))
    manager.save(1, state)
    restored, _ = manager.restore(manager.path_for_step(1), state)
    assert has_quantized(restored.frozen)
    ref = dequantize_params(state.frozen, jnp.float32)
    got = dequantize_params(restored.frozen, jnp.float32)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))