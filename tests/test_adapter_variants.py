"""Adapter variants beyond plain LoRA/LoKr: SingLoRA, T-LoRA, plus the

diff2flow bridge and DreamBooth prior regularization (reference:
peft-singlora, lycoris tlora, simpletuner/diff2flow/bridge.py,
trainer.py:6565 parent-loss path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.models.sd1x.model import SD1x
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make_flux(**extra):
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

class TestSingLoRA:
    def test_single_matrix_collection(self):
        model = make_flux(peft_lora_mode="singlora")
        assert model.lora_algo == "singlora"
        batch = model.example_batch(batch_size=1, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        flat = jax.tree_util.tree_leaves_with_path(variables["lora"])
        names = {str(p[-1]) for p, _ in flat}
        assert any("singlora_A" in n for n in names)
        assert not any("lora_B" in n for n in names)

    def test_train_step_moves_adapter(self):
        model = make_flux(peft_lora_mode="singlora")
        batch = model.example_batch(batch_size=1, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(7), batch["latents"].shape)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule))
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        moved = any(
            bool(jnp.any(a != b))
            for a, b in zip(
                jax.tree_util.tree_leaves(state.trainable["lora"]),
                jax.tree_util.tree_leaves(state2.trainable["lora"]),
            )
        )
        assert moved

class TestTLoRA:
    def test_rank_mask_shape_and_monotonicity(self):
        from simpletuner_tpu.models.layers import tlora_rank_mask

        t = jnp.asarray([0.0, 0.5, 1.0])
        mask = tlora_rank_mask(t, max_rank=8, min_rank=2)
        assert mask.shape == (3, 8)
        # clean sample: all ranks; noisiest sample: only min_rank
        assert float(mask[0].sum()) == 8.0
        assert float(mask[2].sum()) == 2.0
        assert float(mask[1].sum()) <= float(mask[0].sum())

    def test_tlora_train_step(self):
        model = make_flux(lora_type="lycoris", lycoris_config={"algo": "tlora", "min_rank": 1})
        assert model.lora_algo == "tlora"
        batch = model.example_batch(batch_size=2, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(7), batch["latents"].shape)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

class TestDiff2Flow:
    def test_epsilon_model_trains_with_flow_target(self):
        cfg = TrainingConfig(
            {
                "model_family": "sd1x",
                "model_type": "lora",
                "lora_rank": 4,
                "model_arch_preset": "tiny",
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 10,
                "diff2flow_enabled": True,
                "diff2flow_loss": True,
            }
        )
        model = SD1x(cfg)
        batch = model.example_batch(batch_size=2, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        loss, _ = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
        assert np.isfinite(float(loss))

    def test_enabled_without_loss_keeps_epsilon_objective(self):
        """Reference common.py:5697-5704: --diff2flow_enabled alone exposes
        the flow target but the main loss stays in ε space; the flow-space
        swap needs --diff2flow_loss too."""
        def build(**extra):
            cfg = TrainingConfig(
                {
                    "model_family": "sd1x",
                    "model_type": "lora",
                    "lora_rank": 4,
                    "model_arch_preset": "tiny",
                    "optimizer": "adamw",
                    "learning_rate": 1e-3,
                    "max_train_steps": 10,
                    **extra,
                }
            )
            return SD1x(cfg)

        plain = build()
        bridged = build(diff2flow_enabled=True)
        swapped = build(diff2flow_enabled=True, diff2flow_loss=True)
        batch = plain.example_batch(batch_size=2, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
        variables = plain.init_params(jax.random.PRNGKey(0), batch)
        loss_plain, _ = plain.loss_fn(variables, jax.random.PRNGKey(1), batch)
        loss_bridged, _ = bridged.loss_fn(variables, jax.random.PRNGKey(1), batch)
        loss_swapped, _ = swapped.loss_fn(variables, jax.random.PRNGKey(1), batch)
        np.testing.assert_allclose(float(loss_bridged), float(loss_plain), rtol=1e-6)
        assert abs(float(loss_swapped) - float(loss_plain)) > 1e-6

    def test_flow_conversion_identity(self):
        """A perfect ε prediction converts to the exact flow field ε − x0."""
        from simpletuner_tpu.models.common import make_alphas_cumprod
        from simpletuner_tpu.training.diff2flow import prediction_to_flow
        from simpletuner_tpu.training.losses import DDPMScheduleConfig

        alphas = make_alphas_cumprod(DDPMScheduleConfig())
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.normal(rng, (2, 4, 4, 4))
        eps = jax.random.normal(jax.random.fold_in(rng, 1), (2, 4, 4, 4))
        t = jnp.asarray([100, 700])
        a = alphas[t].reshape(2, 1, 1, 1)
        noisy = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps
        flow = prediction_to_flow(eps, noisy, t, alphas, "epsilon")
        np.testing.assert_allclose(np.asarray(flow), np.asarray(eps - x0), rtol=2e-2, atol=2e-2)

class TestPriorRegularization:
    def test_regularisation_batch_uses_parent_target(self):
        """With fresh zero adapters, student == parent, so the reg loss is ~0
        while the normal loss is not."""
        model = make_flux()
        batch = model.example_batch(batch_size=2, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        loss_plain, _ = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
        reg_batch = dict(batch)
        reg_batch["is_regularisation_data"] = jnp.float32(1.0)
        loss_reg, _ = model.loss_fn(variables, jax.random.PRNGKey(1), reg_batch)
        assert float(loss_reg) < 1e-8
        assert float(loss_plain) > 1e-4

    def test_dataset_config_flag_accepted(self):
        from simpletuner_tpu.configuration.dataloader import DatasetConfig

        cfg = DatasetConfig.from_dict({"id": "reg", "is_regularization_data": True})
        assert cfg.is_regularisation_data


def test_lora_dropout_trains_and_inference_deterministic():
    """--lora_dropout: adapter-branch dropout active only with a dropout rng
    (train path); inference predictions stay deterministic."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.models.layers import set_lora_dropout

    cfg = TrainingConfig({
        "model_family": "flux", "model_type": "lora", "lora_rank": 4,
        "lora_dropout": 0.5, "optimizer": "adamw", "learning_rate": 1e-3,
        "max_train_steps": 2, "mixed_precision": "fp32",
        # a randomly-initialized flux has exact-zero adaLN-Zero gates, so
        # adapters behind them (the default "all" preset = attention only)
        # cannot reach the output; the embedder preset adapts the ungated
        # x_embedder so the dropout effect is observable
        "flux_lora_target": "all+ffs+embedder",
    })
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # make lora_B nonzero so the adapter branch (and its dropout) shows up.
    # The perturbation must be RANDOM: a constant matrix B yields channel-
    # uniform deltas, which the final LayerNorm annihilates exactly
    leaves, treedef = jax.tree_util.tree_flatten(variables["lora"])
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    variables["lora"] = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)

    with_rng_a = np.asarray(model.model_predict(
        variables, prepared, rngs={"dropout": jax.random.PRNGKey(7)}))
    with_rng_b = np.asarray(model.model_predict(
        variables, prepared, rngs={"dropout": jax.random.PRNGKey(8)}))
    without = np.asarray(model.model_predict(variables, prepared))
    without2 = np.asarray(model.model_predict(variables, prepared))

    assert not np.allclose(with_rng_a, with_rng_b), "dropout rng had no effect"
    np.testing.assert_array_equal(without, without2)
    assert not np.allclose(with_rng_a, without)
    set_lora_dropout(0.0)
