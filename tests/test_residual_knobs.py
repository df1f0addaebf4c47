"""Round-5 residual knob wirings: SingLoRA ramp, LoKr norm init, TwinFlow
validation step count, lyrics-sidecar LR scheduler (reference: peft-singlora
ramp_up_steps via common.py:1016; peft_init.init_lokr_network_with_perturbed_normal;
validation.py:2789 twinflow steps; trainer.py:3965 lyrics scheduler)."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig


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


def open_gates(params, seed=9, scale=0.05):
    """Flux is AdaLN-ZERO: at random init every gate is exactly 0, so adapter
    deltas in gated branches cannot reach the output.  Perturb the base params
    (as pretrained weights would) so adapter sensitivity is observable."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [l + scale * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


class TestSingloraRamp:
    def test_ramp_scales_adapter_step_dependently(self):
        """At the same weights, the loss must differ between early and late
        optimizer steps because u(t) rescales the adapter delta."""
        from simpletuner_tpu.training.optimizers import get_optimizer
        from simpletuner_tpu.training.schedules import get_lr_schedule
        from simpletuner_tpu.training.train_state import build_train_step, create_train_state

        model = make_flux(peft_lora_mode="singlora", singlora_ramp_up_steps=100)
        batch = model.example_batch(batch_size=1, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        variables = dict(variables, params=open_gates(variables["params"]))
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        step_fn = jax.jit(build_train_step(model, tx, schedule))

        state_early = state.replace(step=jnp.int32(0))
        state_late = state.replace(step=jnp.int32(99))
        # make the adapter non-trivial so the ramp has something to scale
        bumped = jax.tree_util.tree_map(lambda x: x + 0.05, state.trainable["lora"])
        state_early = state_early.replace(trainable={**state.trainable, "lora": bumped})
        state_late = state_late.replace(trainable={**state.trainable, "lora": bumped})
        _, m_early = step_fn(state_early, batch, jax.random.PRNGKey(1))
        _, m_late = step_fn(state_late, batch, jax.random.PRNGKey(1))
        assert abs(float(m_early["loss"]) - float(m_late["loss"])) > 1e-7

    def test_no_ramp_for_standard_lora(self):
        from simpletuner_tpu.training.optimizers import get_optimizer
        from simpletuner_tpu.training.schedules import get_lr_schedule
        from simpletuner_tpu.training.train_state import build_train_step, create_train_state

        model = make_flux()
        batch = model.example_batch(batch_size=1, resolution=32)
        batch["latents"] = jax.random.normal(jax.random.PRNGKey(3), batch["latents"].shape)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        variables = dict(variables, params=open_gates(variables["params"]))
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        step_fn = jax.jit(build_train_step(model, tx, schedule))
        bumped = jax.tree_util.tree_map(lambda x: x + 0.05, state.trainable["lora"])
        s0 = state.replace(step=jnp.int32(0), trainable={**state.trainable, "lora": bumped})
        s1 = state.replace(step=jnp.int32(99), trainable={**state.trainable, "lora": bumped})
        _, m0 = step_fn(s0, batch, jax.random.PRNGKey(1))
        _, m1 = step_fn(s1, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-6)


class TestLokrNormInit:
    def test_perturbed_normal_init(self):
        """init_lokr_norm: w1 == ones, w2 nonzero with norm tracking the org
        kernel's statistics × scale (reference peft_init.py:14-39)."""
        model = make_flux(lora_type="lycoris", lycoris_algo="lokr", init_lokr_norm=1e-3)
        batch = model.example_batch(batch_size=1, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        leaves = jax.tree_util.tree_leaves_with_path(variables["lora"])
        w1s = [l for p, l in leaves if "lokr_w1" in str(p)]
        w2s = [l for p, l in leaves if "lokr_w2" in str(p)]
        assert w1s and w2s
        for w1 in w1s:
            np.testing.assert_array_equal(np.asarray(w1), 1.0)
        assert all(float(jnp.abs(w2).max()) > 0 for w2 in w2s)

    def test_default_zero_init(self):
        model = make_flux(lora_type="lycoris", lycoris_algo="lokr")
        batch = model.example_batch(batch_size=1, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        leaves = jax.tree_util.tree_leaves_with_path(variables["lora"])
        w2s = [l for p, l in leaves if "lokr_w2" in str(p)]
        assert w2s and all(float(jnp.abs(w2).max()) == 0 for w2 in w2s)


class TestTwinflowValidationSteps:
    def test_step_count_override(self, tmp_path):
        from simpletuner_tpu.training.validation import Validation

        model = make_flux(
            twinflow_enabled=True, twinflow_target_step_count=2,
            validation_num_inference_steps=20, validation_prompt="x",
        )
        validation = Validation(model, model.config, output_dir=str(tmp_path))
        assert validation.num_steps == 2

    def test_no_override_without_twinflow(self, tmp_path):
        from simpletuner_tpu.training.validation import Validation

        model = make_flux(validation_num_inference_steps=20, validation_prompt="x")
        validation = Validation(model, model.config, output_dir=str(tmp_path))
        assert validation.num_steps == 20


class TestLyricsScheduler:
    def test_sidecar_scheduler_override(self):
        """The lyrics transform must follow its own cosine curve, not the
        main constant schedule."""
        import optax

        from simpletuner_tpu.training.optimizers import get_optimizer

        cfg = TrainingConfig(
            {
                "model_family": "ace_step",
                "model_type": "lora",
                "lora_rank": 4,
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 100,
                "lr_scheduler": "constant",
                "lyrics_embedder_train": True,
                "lyrics_embedder_lr": 5e-4,
                "lyrics_embedder_lr_scheduler": "cosine",
            }
        )
        tx = get_optimizer(cfg, 1e-3)
        params = {
            "lora": {"a": jnp.ones((4, 4))},
            "lyrics_params": {"w": jnp.ones((4, 4))},
        }
        opt_state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)

        def lr_seen(state, steps):
            p = params
            s = state
            for _ in range(steps):
                updates, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, updates)
            return p

        p10 = lr_seen(opt_state, 1)
        # first-step update magnitude: adamw update ~ lr; lyrics must differ
        # from the model group's and decay over steps under cosine
        d_model = float(jnp.abs(p10["lora"]["a"] - 1.0).mean())
        d_lyr = float(jnp.abs(p10["lyrics_params"]["w"] - 1.0).mean())
        assert abs(d_model - 1e-3) < 2e-4
        assert abs(d_lyr - 5e-4) < 2e-4


class TestTEIntermediaryTaps:
    def test_custom_layers_concat_feature_dim(self):
        """--custom_text_encoder_intermediary_layers concatenates the chosen
        hidden states along features (reference flux2/model.py:622)."""
        from simpletuner_tpu.configuration import TrainingConfig
        from simpletuner_tpu.models.flux2.model import Flux2
        from simpletuner_tpu.models.text_encoders import load_text_encoders

        cfg = TrainingConfig(
            {
                "model_family": "flux2",
                "model_type": "lora",
                "lora_rank": 4,
                "model_arch_preset": "tiny",
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 10,
                "custom_text_encoder_intermediary_layers": "[1, 2]",
            }
        )
        model = Flux2(cfg)
        model.attach_text_encoders(
            load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True)
        )
        (te,) = model.text_encoders
        hidden = te.config.hidden_size
        embeds = model.encode_text(["a photo"])
        assert embeds[0]["text_embeds"].shape[-1] == 2 * hidden
        # default path: single final hidden state
        plain = Flux2(
            TrainingConfig(
                {
                    "model_family": "flux2",
                    "model_type": "lora",
                    "lora_rank": 4,
                    "model_arch_preset": "tiny",
                    "optimizer": "adamw",
                    "learning_rate": 1e-3,
                    "max_train_steps": 10,
                }
            )
        )
        plain.attach_text_encoders(model.text_encoders)
        assert plain.encode_text(["a photo"])[0]["text_embeds"].shape[-1] == hidden

    def test_bad_json_raises(self):
        from simpletuner_tpu.configuration import TrainingConfig
        from simpletuner_tpu.models.flux2.model import Flux2

        import pytest

        cfg = TrainingConfig(
            {
                "model_family": "flux2",
                "model_type": "lora",
                "lora_rank": 4,
                "model_arch_preset": "tiny",
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 10,
                "custom_text_encoder_intermediary_layers": "not-json",
            }
        )
        with pytest.raises(ValueError, match="not valid JSON"):
            Flux2(cfg)._te_tap_layers()
