"""Scheduled sampling rollout: jit-safety, zero-step passthrough, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.scheduled_sampling import (
    ScheduledSamplingConfig,
    apply_scheduled_sampling,
)

pytestmark = pytest.mark.slow

def make_model(**extra):
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            **extra,
        }
    )
    return Flux(cfg, arch=FluxConfig.tiny())

@pytest.fixture(scope="module")
def setup():
    model = make_model()
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, variables

def test_zero_probability_passthrough(setup):
    model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    ss = ScheduledSamplingConfig(max_steps=3, probability=0.0)
    out = apply_scheduled_sampling(model, variables, prepared, jax.random.PRNGKey(2), ss)
    np.testing.assert_array_equal(
        np.asarray(out["noisy_latents"]), np.asarray(prepared["noisy_latents"])
    )

def test_rollout_changes_inputs(setup):
    model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    ss = ScheduledSamplingConfig(max_steps=3, probability=1.0, step_size=0.1)
    out = jax.jit(
        lambda v, p, r: apply_scheduled_sampling(model, v, p, r, ss)
    )(variables, prepared, jax.random.PRNGKey(2))
    assert not np.allclose(
        np.asarray(out["noisy_latents"]), np.asarray(prepared["noisy_latents"])
    )
    assert np.all(np.isfinite(np.asarray(out["noisy_latents"])))

def test_loss_fn_with_scheduled_sampling_grads():
    from tests.test_flux_model import _randomize_modulation_gates

    model = make_model(
        scheduled_sampling_max_steps=2, scheduled_sampling_probability=1.0
    )
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # scratch-init adaLN gates are zero -> attention LoRA grads vanish;
    # randomize to the imported-weights regime the adapter trains in
    variables = {**variables, "params": _randomize_modulation_gates(variables["params"])}

    def loss(lora):
        merged = {**variables, "lora": lora}
        value, _ = model.loss_fn(merged, jax.random.PRNGKey(1), batch)
        return value

    value, grads = jax.jit(jax.value_and_grad(loss))(variables["lora"])
    assert np.isfinite(float(value))
    assert any(float(jnp.linalg.norm(g)) > 0 for g in jax.tree_util.tree_leaves(grads))

def test_reflexflow_taps_and_weighted_loss(setup):
    """ReflexFlow records clean/biased probes and the weighted loss stays
    finite; disabling it removes the probes."""
    model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    ss = ScheduledSamplingConfig(max_steps=2, probability=1.0, step_size=0.1, reflexflow=True)
    out = apply_scheduled_sampling(model, variables, prepared, jax.random.PRNGKey(2), ss)
    assert "_reflexflow_clean_pred" in out and "_reflexflow_biased_pred" in out
    assert out["_reflexflow_clean_pred"].shape == prepared["noisy_latents"].shape

    ss_off = ScheduledSamplingConfig(max_steps=2, probability=1.0, step_size=0.1, reflexflow=False)
    out_off = apply_scheduled_sampling(model, variables, prepared, jax.random.PRNGKey(2), ss_off)
    assert "_reflexflow_clean_pred" not in out_off

def test_reflexflow_loss_fn_end_to_end():
    model = make_model(
        scheduled_sampling_max_steps=2,
        scheduled_sampling_probability=1.0,
        scheduled_sampling_reflexflow=True,
    )
    batch = model.example_batch(batch_size=2, resolution=32)
    batch["latents"] = jax.random.normal(jax.random.PRNGKey(5), batch["latents"].shape)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    loss, _ = jax.jit(lambda v, r: model.loss_fn(v, r, batch))(variables, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # ADR term (beta1=10) makes the reflexflow loss differ from the plain one
    model_off = make_model(
        scheduled_sampling_max_steps=2,
        scheduled_sampling_probability=1.0,
        scheduled_sampling_reflexflow=False,
    )
    loss_off, _ = jax.jit(lambda v, r: model_off.loss_fn(v, r, batch))(variables, jax.random.PRNGKey(1))
    assert abs(float(loss) - float(loss_off)) > 1e-6

class TestTwinFlow:
    def test_twinflow_aux_losses(self):
        model = make_model(twinflow_enabled=True, flowmap_gate=0.25)
        batch = model.example_batch(batch_size=2, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(5), batch["latents"].shape)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        loss, logs = jax.jit(lambda v, r: model.loss_fn(v, r, batch))(
            variables, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(loss))
        assert "twinflow_base" in logs and "twinflow_realvel" in logs
        assert float(logs["twinflow_base"]) >= 0

    def test_adversarial_stage_fails_loudly(self):
        import pytest

        from simpletuner_tpu.training.twinflow import TwinFlowSettings

        model = make_model(twinflow_enabled=True, twinflow_adversarial_enabled=True)
        with pytest.raises(NotImplementedError):
            TwinFlowSettings.from_config(model.config)

def test_probability_ramp():
    """prob_start->prob_end over ramp_steps after start_step (linear+cosine)."""
    import numpy as np

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.training.scheduled_sampling import ScheduledSamplingConfig

    cfg = ScheduledSamplingConfig.from_config(TrainingConfig({
        "model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
        "max_train_steps": 10, "scheduled_sampling_max_steps": 2,
        "scheduled_sampling_prob_start": 0.0, "scheduled_sampling_prob_end": 0.8,
        "scheduled_sampling_ramp_steps": 100, "scheduled_sampling_start_step": 50,
    }))
    assert float(cfg.probability_at(0)) == 0.0    # before start_step
    assert float(cfg.probability_at(50)) == 0.0   # ramp begins
    np.testing.assert_allclose(float(cfg.probability_at(100)), 0.4, atol=1e-6)
    np.testing.assert_allclose(float(cfg.probability_at(150)), 0.8, atol=1e-6)
    np.testing.assert_allclose(float(cfg.probability_at(1000)), 0.8, atol=1e-6)

    cos = ScheduledSamplingConfig.from_config(TrainingConfig({
        "model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
        "max_train_steps": 10, "scheduled_sampling_max_steps": 2,
        "scheduled_sampling_prob_start": 0.0, "scheduled_sampling_prob_end": 1.0,
        "scheduled_sampling_ramp_steps": 100, "scheduled_sampling_ramp_shape": "cosine",
    }))
    np.testing.assert_allclose(float(cos.probability_at(50)), 0.5, atol=1e-6)
    assert float(cos.probability_at(25)) < 0.25  # cosine starts slow

    # fixed probability stays untouched when no ramp fields are set
    plain = ScheduledSamplingConfig.from_config(TrainingConfig({
        "model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
        "max_train_steps": 10, "scheduled_sampling_max_steps": 2,
        "scheduled_sampling_probability": 0.3,
    }))
    np.testing.assert_allclose(float(plain.probability_at(0)), 0.3)
    np.testing.assert_allclose(float(plain.probability_at(999)), 0.3)
