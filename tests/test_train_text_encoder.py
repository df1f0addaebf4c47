"""--train_text_encoder (reference field_registry training.py:723,
trainer.py:2711,3394): the text encoder joins the optimizer for full SD 1.x/2.x
fine-tunes, captions encode in-step from live TE params, the cache is bypassed,
and unsupported combinations fail loudly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import get_model_family
from simpletuner_tpu.models.text_encoders import load_text_encoders
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow


def _cfg(**over):
    base = {
        "model_family": "sd1x", "model_type": "full", "model_arch_preset": "tiny",
        "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 3,
        "train_text_encoder": True, "mixed_precision": "fp32",
    }
    base.update(over)
    return TrainingConfig(base)


def _build(cfg):
    model = get_model_family(cfg)
    model.attach_text_encoders(
        load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, None, tiny=True)
    )
    return model


class TestGating:
    def test_lora_combination_rejected(self):
        with pytest.raises(NotImplementedError, match="model_type=full"):
            get_model_family(_cfg(model_type="lora", lora_rank=4))

    def test_unsupported_family_rejected(self):
        with pytest.raises(ValueError, match="train_text_encoder"):
            get_model_family(_cfg(model_family="flux"))

    def test_deepfloyd_opted_out(self):
        with pytest.raises(ValueError, match="train_text_encoder"):
            get_model_family(_cfg(model_family="deepfloyd"))


def test_te_params_train_and_captions_encode_in_step():
    cfg = _cfg(text_encoder_lr=1e-4)
    model = _build(cfg)

    batch = model.example_batch(batch_size=2, resolution=32)
    batch.pop("text_embeds", None)
    tokens = model.tokenize_captions(["a photo of a cat", "a painting"])
    assert tokens["te_input_ids"].shape[0] == 2
    batch.update(tokens)
    # latents need real values so the loss is non-degenerate
    rng = np.random.default_rng(0)
    batch["latents"] = jnp.asarray(
        rng.normal(0, 1, batch["latents"].shape), jnp.float32)

    variables = model.init_params(jax.random.PRNGKey(0), dict(
        batch, text_embeds=jnp.zeros(
            (2, model.text_encoders[0].spec.max_length,
             model.text_encoders[0].model.config.hidden_size), jnp.float32)))
    schedule = get_lr_schedule(cfg, 3)
    tx = get_optimizer(cfg, schedule)
    te_init = model.text_encoders[0].model.params
    state = create_train_state(model, variables, tx,
                               text_encoder_params=te_init)
    assert "te_params" in state.trainable

    step = jax.jit(build_train_step(model, tx, schedule))
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)

    # the text encoder actually moved
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.trainable["te_params"], te_init)
    max_delta = max(jax.tree_util.tree_leaves(delta))
    assert max_delta > 0, "te_params unchanged after 3 steps"

    # and the unet moved too (joint training)
    unet_delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.trainable["params"], variables["params"])
    assert max(jax.tree_util.tree_leaves(unet_delta)) > 0


def test_text_encoder_lr_applied_separately():
    """With text_encoder_lr=0 the TE must stay frozen while the unet moves."""
    cfg = _cfg(text_encoder_lr=0.0)
    # te_lr of 0 is falsy -> same optimizer; use a tiny-but-nonzero rate and
    # compare magnitudes instead
    cfg.text_encoder_lr = 1e-9
    model = _build(cfg)
    batch = model.example_batch(batch_size=1, resolution=32)
    batch.pop("text_embeds", None)
    batch.update(model.tokenize_captions(["x"]))
    rng = np.random.default_rng(1)
    batch["latents"] = jnp.asarray(rng.normal(0, 1, batch["latents"].shape), jnp.float32)
    variables = model.init_params(jax.random.PRNGKey(0), dict(
        batch, text_embeds=jnp.zeros(
            (1, model.text_encoders[0].spec.max_length,
             model.text_encoders[0].model.config.hidden_size), jnp.float32)))
    schedule = get_lr_schedule(cfg, 2)
    tx = get_optimizer(cfg, schedule)
    te_init = model.text_encoders[0].model.params
    state = create_train_state(model, variables, tx, text_encoder_params=te_init)
    step = jax.jit(build_train_step(model, tx, schedule))
    state, _ = step(state, batch, jax.random.PRNGKey(5))

    te_delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.trainable["te_params"], te_init)))
    unet_delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.trainable["params"], variables["params"])))
    assert unet_delta > 1e-5
    assert te_delta < unet_delta * 1e-2, (
        f"te moved {te_delta} vs unet {unet_delta}; text_encoder_lr not applied")


def test_freeze_encoder_strategy_masks_layers():
    """freeze_encoder_strategy=before: layers < N (and embeddings) get zero
    updates while later layers and the unet train."""
    cfg = _cfg(freeze_encoder_strategy="before", freeze_encoder_before=1,
               text_encoder_lr=1e-3)
    model = _build(cfg)
    batch = model.example_batch(batch_size=1, resolution=32)
    batch.pop("text_embeds", None)
    batch.update(model.tokenize_captions(["x"]))
    rng = np.random.default_rng(2)
    batch["latents"] = jnp.asarray(rng.normal(0, 1, batch["latents"].shape), jnp.float32)
    variables = model.init_params(jax.random.PRNGKey(0), dict(
        batch, text_embeds=jnp.zeros(
            (1, model.text_encoders[0].spec.max_length,
             model.text_encoders[0].model.config.hidden_size), jnp.float32)))
    schedule = get_lr_schedule(cfg, 2)
    tx = get_optimizer(cfg, schedule)
    te_init = model.text_encoders[0].model.params
    state = create_train_state(model, variables, tx, text_encoder_params=te_init)
    step = jax.jit(build_train_step(model, tx, schedule))
    state, _ = step(state, batch, jax.random.PRNGKey(9))

    def delta_for(subpath_fragment):
        vals = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.trainable["te_params"]):
            if subpath_fragment in jax.tree_util.keystr(path):
                ref = te_init
                for k in path:
                    ref = ref[getattr(k, "key", k)]
                vals.append(float(jnp.max(jnp.abs(leaf - ref))))
        return max(vals) if vals else 0.0

    frozen_delta = delta_for("layers']['0")
    live_delta = delta_for("layers']['1")
    embed_delta = delta_for("embeddings")
    assert frozen_delta == 0.0, f"layer 0 moved: {frozen_delta}"
    assert embed_delta == 0.0, f"embeddings moved: {embed_delta}"
    assert live_delta > 0.0, "layer 1 did not train"
