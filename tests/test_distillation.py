"""Distillation framework: registry, LCM consistency loss, teacher matching,

and a distilled LoRA train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.distillation import available_methods, get_distillation_method, init_distillation
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

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

class TestRegistry:
    def test_methods_listed(self):
        methods = available_methods()
        assert "lcm" in methods and "teacher_matching" in methods

    def test_unimplemented_submode_raises(self):
        model = make_model(distillation_method="dcm", distillation_config={"mode": "fine"})
        with pytest.raises(NotImplementedError):
            init_distillation(model.config)

    def test_unknown_raises_key_error(self):
        with pytest.raises(KeyError):
            get_distillation_method("nope")

    def test_factory_from_config(self):
        model = make_model(distillation_method="lcm")
        distiller = init_distillation(model.config)
        assert distiller.name == "lcm"
        assert init_distillation(make_model().config) is None

@pytest.mark.parametrize("method", ["lcm", "teacher_matching", "perflow", "dcm"])
def test_distilled_lora_train_step(method):
    model = make_model(distillation_method=method)
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    distiller = init_distillation(model.config)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule, distiller=distiller), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    key = {
        "lcm": "distill_consistency_loss",
        "teacher_matching": "distill_match_loss",
        "perflow": "perflow_loss",
        "dcm": "dcm_loss",
    }[method]
    assert key in metrics and np.isfinite(float(metrics[key]))

def test_lora_zero_adapter_teacher_matches_base():
    """With B=0 fresh adapters, student == teacher, so matching loss is ~0."""
    model = make_model(distillation_method="teacher_matching")
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    distiller = init_distillation(model.config)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    loss, logs = distiller.distill_loss(model, variables, prepared, pred, jax.random.PRNGKey(2))
    assert float(logs["distill_match_loss"]) < 1e-8

class TestDMD:
    def test_dmd_registered(self):
        assert "dmd" in available_methods()

    def test_dmd_train_step_moves_both_adapters(self):
        model = make_model(distillation_method="dmd")
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        distiller = init_distillation(model.config)
        assert distiller.requires_critic
        critic = jax.tree_util.tree_map(jnp.array, variables["lora"])
        state = create_train_state(model, variables, tx, critic_params=critic)
        assert "critic_lora" in state.trainable

        step = jax.jit(build_train_step(model, tx, schedule, distiller=distiller))
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "dmd_generator_loss" in metrics and "dmd_critic_loss" in metrics

        def moved(tree_a, tree_b):
            return any(
                bool(jnp.any(a != b))
                for a, b in zip(jax.tree_util.tree_leaves(tree_a), jax.tree_util.tree_leaves(tree_b))
            )

        assert moved(state.trainable["critic_lora"], state2.trainable["critic_lora"])
        # second step: generator receives nonzero DM gradient once critic departs
        state3, metrics3 = step(state2, batch, jax.random.PRNGKey(2))
        assert moved(state2.trainable["lora"], state3.trainable["lora"])

class TestFlowDPO:
    def test_requires_rejected_latents(self):
        model = make_model(distillation_method="flow_dpo")
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        distiller = init_distillation(model.config)
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = model.model_predict(variables, prepared)
        with pytest.raises(KeyError):
            distiller.distill_loss(model, variables, prepared, pred, jax.random.PRNGKey(2))

    def test_train_step_with_paired_rejected(self):
        model = make_model(distillation_method="flow_dpo")
        batch = model.example_batch(batch_size=2, resolution=32)
        batch["control_latents"] = np.asarray(
            jax.random.normal(jax.random.PRNGKey(9), batch["latents"].shape), np.float32
        )
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        distiller = init_distillation(model.config)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule, distiller=distiller), donate_argnums=(0,))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "flow_dpo_margin" in metrics and "flow_dpo_beta" in metrics
        # fresh zero adapters: policy == reference, margin exactly 0, loss = log 2
        assert abs(float(metrics["flow_dpo_margin"])) < 1e-5
        assert abs(float(metrics["flow_dpo_loss"]) - float(np.log(2.0))) < 1e-4

class TestSelfForcing:
    def test_self_forcing_train_step(self):
        model = make_model(distillation_method="self_forcing")
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        distiller = init_distillation(model.config)
        assert distiller.requires_critic
        critic = jax.tree_util.tree_map(jnp.array, variables["lora"])
        state = create_train_state(model, variables, tx, critic_params=critic)
        step = jax.jit(build_train_step(model, tx, schedule, distiller=distiller))
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "self_forcing_generator_loss" in metrics
        # critic moves on step 1; generator moves once critic departs
        state3, _ = step(state2, batch, jax.random.PRNGKey(2))

        def moved(a, b):
            return any(
                bool(jnp.any(x != y))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )

        assert moved(state.trainable["critic_lora"], state2.trainable["critic_lora"])
        assert moved(state2.trainable["lora"], state3.trainable["lora"])

class TestAnyFlow:
    def test_forward_stage_train_step(self):
        model = make_model(distillation_method="anyflow")
        batch = model.example_batch(batch_size=4, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        # flowmap delta embedder exists and is a clone of the time embedder
        assert "flowmap_delta_in" in variables["params"]
        a = jax.tree_util.tree_leaves(variables["params"]["flowmap_delta_in"])
        b = jax.tree_util.tree_leaves(variables["params"]["time_in"])
        assert all(bool(jnp.all(x == y)) for x, y in zip(a, b))
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        distiller = init_distillation(model.config)
        assert not distiller.requires_critic
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule, distiller=distiller), donate_argnums=(0,))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "anyflow_forward_loss" in metrics
        assert 0.0 <= float(metrics["anyflow_interval"]) <= 1.0

    def test_onpolicy_stage_train_step(self):
        model = make_model(
            distillation_method="anyflow", distillation_config={"stage": "onpolicy", "rollout_step_counts": (1, 2)}
        )
        batch = model.example_batch(batch_size=2, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        distiller = init_distillation(model.config)
        assert distiller.requires_critic
        critic = jax.tree_util.tree_map(jnp.array, variables["lora"])
        state = create_train_state(model, variables, tx, critic_params=critic)
        step = jax.jit(build_train_step(model, tx, schedule, distiller=distiller))
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert "anyflow_onpolicy_loss" in metrics

    def test_diffusion_samples_get_plain_flow_target(self):
        """r == t for the diffusion slice, so the MeanFlow target reduces to
        noise - latents there (interval term vanishes)."""
        model = make_model(distillation_method="anyflow")
        distiller = init_distillation(model.config)
        batch = model.example_batch(batch_size=4, resolution=32)
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        prepared = distiller.prepare_batch(jax.random.PRNGKey(2), prepared, model)
        mask = np.asarray(prepared["anyflow_diffusion_mask"])
        assert mask[:2].all() and not mask[2:].any()  # ratio 0.5 of 4
        t = np.asarray(prepared["sigmas"]); r = np.asarray(prepared["flowmap_r_timesteps"])
        assert np.allclose(t[:2], r[:2])
        assert (t[2:] >= r[2:]).all()

    def test_batch_without_diffusion_samples_has_nonzero_loss(self):
        """batch=1 -> round(0.5*1)=0 diffusion rows; adaptive weighting must
        not zero the loss (regression: scale collapsed to 0/x)."""
        model = make_model(distillation_method="anyflow")
        batch = model.example_batch(batch_size=1, resolution=32)
        batch["latents"] = jnp.asarray(
            jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape), jnp.float32
        )
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        distiller = init_distillation(model.config)
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        prepared = distiller.prepare_batch(jax.random.PRNGKey(2), prepared, model)
        pred = model.model_predict(variables, prepared)
        loss, logs = distiller.distill_loss(model, variables, prepared, pred, jax.random.PRNGKey(4))
        assert float(loss) > 0.0