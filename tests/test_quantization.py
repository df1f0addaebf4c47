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

class TestInt4:
    """Real packed int4 (VERDICT r2 Missing #7): two nibbles/byte along the
    input axis, per-output-channel scales, use-site unpack in LoRADense.
    Reference capability: quanto int4 / bnb NF4 VRAM floors
    (quantisation/__init__.py:412-558, FLUX.md 13G/9G rows)."""

    def test_int4_error_bounded(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.02
        q = quantize_params({"params": {"lin": {"kernel": w}}}, "int4")
        # kernel leaves params; packed nibbles + scales ride qscales
        assert "kernel" not in q["params"]["lin"]
        packed = q["qscales"]["lin"]["kernel_packed"]
        assert packed.dtype == jnp.uint8
        assert packed.shape == (32, 128)  # half the input dim: 0.5 byte/param
        back = dequantize_params(q, jnp.float32)["params"]["lin"]["kernel"]
        err = jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w))
        assert float(err) < 0.08  # 3 bits of signal per channel

    def test_int4_exact_on_grid(self):
        # values already on the int4 grid round-trip exactly (each channel
        # must contain a ±7 so absmax/7 recovers the true grid step)
        scale = 0.01
        ints = np.random.default_rng(0).integers(-7, 8, (16, 8))
        ints[0, :] = 7
        grid = jnp.asarray(ints, jnp.float32) * scale
        q = quantize_params({"params": {"lin": {"kernel": grid}}}, "int4")
        back = dequantize_params(q, jnp.float32)["params"]["lin"]["kernel"]
        np.testing.assert_allclose(np.asarray(back), np.asarray(grid), rtol=1e-5)

    def test_int4_odd_input_dim_rejected(self):
        w = jnp.ones((63, 8))
        with pytest.raises(ValueError, match="even input dim"):
            quantize_params({"params": {"lin": {"kernel": w}}}, "int4")

    def test_precision_alias_substitutions_warn(self, caplog):
        import logging

        cfg = TrainingConfig(
            {"model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
             "max_train_steps": 1, "base_model_precision": "nf4-bnb"}
        )
        with caplog.at_level(logging.WARNING):
            assert resolve_precision(cfg) == "int4"
        assert any("substituted" in r.message for r in caplog.records)
        cfg.base_model_precision = "int4-quanto"
        caplog.clear()
        with caplog.at_level(logging.WARNING):
            assert resolve_precision(cfg) == "int4"
        assert not caplog.records  # int4->int4 is not a substitution

    def test_lora_step_with_int4_base(self):
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
        state_q = create_train_state(model, variables, tx, quantize_mode="int4")
        assert has_quantized(state_q.frozen)

        step = jax.jit(build_train_step(model, tx, schedule))
        _, metrics_fp = step(state_fp, batch, jax.random.PRNGKey(1))
        state_q2, metrics_q = step(state_q, batch, jax.random.PRNGKey(1))
        # 4-bit base perturbs the loss more than int8 but must stay sane
        assert np.isfinite(float(metrics_q["loss"]))
        assert abs(float(metrics_q["loss"]) - float(metrics_fp["loss"])) < 0.5 * max(
            float(metrics_fp["loss"]), 1e-6
        )
        assert has_quantized(state_q2.frozen)


class TestInt8MXUMatmul:
    """int8 MXU matmul path (quantized_matmul=forward|full): dynamic
    per-token activation quantization + s8 x s8 -> s32 contraction
    (training/quantization.py int8_dynamic_dot; SwitchBack-style)."""

    def test_dot_numerics_and_grads(self):
        from simpletuner_tpu.training.quantization import (
            int8_dynamic_dot,
            quantize_params,
        )

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 1, (2, 16, 64)), jnp.float32)
        w = rng.normal(0, 0.05, (64, 96)).astype(np.float32)
        q = quantize_params({"params": {"m": {"kernel": jnp.asarray(w)}}}, "int8")
        w_q = q["params"]["m"]["kernel"]
        w_s = q["qscales"]["m"]["kernel_scale"]

        ref = x @ w
        y = int8_dynamic_dot(x, w_q, w_s)
        assert float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref))) < 0.03

        gref = jax.grad(lambda a: float32_sum_sq(a @ w))(x)
        g_bf16 = jax.grad(lambda a: float32_sum_sq(int8_dynamic_dot(a, w_q, w_s)))(x)
        g_int8 = jax.grad(lambda a: float32_sum_sq(int8_dynamic_dot(a, w_q, w_s, True)))(x)
        scale = float(jnp.max(jnp.abs(gref)))
        assert float(jnp.max(jnp.abs(g_bf16 - gref))) / scale < 0.03
        assert float(jnp.max(jnp.abs(g_int8 - gref))) / scale < 0.03

    def test_training_step_matches_dequant_path(self):
        """10 steps with quantized_matmul on vs off: trajectories track."""
        from simpletuner_tpu.models.layers import set_quantized_matmul

        losses = {}
        for mode in ("off", "forward", "full"):
            cfg = TrainingConfig(
                {
                    "model_family": "flux", "model_type": "lora", "lora_rank": 4,
                    "optimizer": "adamw", "learning_rate": 1e-3,
                    "max_train_steps": 10, "quantized_matmul": mode,
                }
            )
            model = Flux(cfg, arch=FluxConfig.tiny())  # sets the matmul mode
            batch = model.example_batch(batch_size=2, resolution=32)
            variables = model.init_params(jax.random.PRNGKey(0), batch)
            schedule = get_lr_schedule(cfg, 10)
            tx = get_optimizer(cfg, schedule)
            state = create_train_state(model, variables, tx, quantize_mode="int8")
            step = jax.jit(build_train_step(model, tx, schedule))
            curve = []
            for i in range(10):
                state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
                curve.append(float(metrics["loss"]))
            losses[mode] = np.asarray(curve)
        set_quantized_matmul("off")
        assert np.all(np.isfinite(losses["forward"]))
        # int8-activation noise shifts the loss only slightly off the
        # dequant-to-bf16 reference trajectory
        np.testing.assert_allclose(losses["forward"], losses["off"], rtol=0.1, atol=0.02)
        np.testing.assert_allclose(losses["full"], losses["off"], rtol=0.1, atol=0.02)
        # it still learns
        assert losses["full"][-1] < losses["full"][0]

    def test_unknown_mode_rejected(self):
        from simpletuner_tpu.training.quantization import resolve_quantized_matmul

        class Cfg:
            quantized_matmul = "int8-magic"

        with pytest.raises(ValueError, match="quantized_matmul"):
            resolve_quantized_matmul(Cfg())


def float32_sum_sq(a):
    return jnp.sum(a.astype(jnp.float32) ** 2)


def test_int4_base_int8_mxu_path():
    """int4 nibbles ride the same s8 MXU contraction when quantized_matmul is
    on; one step matches the bf16-unpack path closely."""
    from simpletuner_tpu.models.layers import set_quantized_matmul

    metrics_by_mode = {}
    for mode in ("off", "forward"):
        cfg = TrainingConfig(
            {
                "model_family": "flux", "model_type": "lora", "lora_rank": 4,
                "optimizer": "adamw", "learning_rate": 1e-3,
                "max_train_steps": 4, "quantized_matmul": mode,
            }
        )
        model = Flux(cfg, arch=FluxConfig.tiny())
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(cfg, 4)
        tx = get_optimizer(cfg, schedule)
        state = create_train_state(model, variables, tx, quantize_mode="int4")
        step = jax.jit(build_train_step(model, tx, schedule))
        _, metrics = step(state, batch, jax.random.PRNGKey(7))
        metrics_by_mode[mode] = float(metrics["loss"])
    set_quantized_matmul("off")
    assert np.isfinite(metrics_by_mode["forward"])
    assert abs(metrics_by_mode["forward"] - metrics_by_mode["off"]) < 0.1 * max(
        metrics_by_mode["off"], 1e-6)
