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
    def test_sd1x_lora_combination_supported(self):
        # TE LoRA landed (reference trainer.py:4307): no longer rejected
        model = get_model_family(_cfg(model_type="lora", lora_rank=4))
        assert model.SUPPORTS_TEXT_ENCODER_TRAINING

    def test_sd3_full_te_rejected(self):
        # reference keeps SD3 TE training LoRA-only ("third TE not trained")
        with pytest.raises(NotImplementedError, match="model_type=full"):
            get_model_family(_cfg(model_family="sd3", model_type="full"))

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


# ---------------------------------------------------------------------------------
# text-encoder LoRA (reference trainer.py:4307 '"lora" in model_type and
# train_text_encoder': PEFT adapters over the CLIP projections)
# ---------------------------------------------------------------------------------


def _te_lora_setup(family, captions, **over):
    from simpletuner_tpu.training.te_lora import init_te_lora, set_te_lora_scale

    cfg = _cfg(model_family=family, model_type="lora", lora_rank=4,
               lora_alpha=4.0, text_encoder_lr=1e-3, **over)
    model = _build(cfg)
    batch = model.example_batch(batch_size=len(captions), resolution=32)
    init_batch = dict(batch)
    batch.pop("text_embeds", None)
    batch.pop("pooled_embeds", None)
    batch.update(model.tokenize_captions(captions))
    rng = np.random.default_rng(0)
    batch["latents"] = jnp.asarray(rng.normal(0, 1, batch["latents"].shape), jnp.float32)
    variables = model.init_params(jax.random.PRNGKey(0), init_batch)
    # perturb the backbone so adaLN-Zero gates are open (as with loaded
    # pretrained weights) — at exact-zero gates the text path carries no
    # gradient for the first steps (MMDiT context contributions are gated)
    perturb = np.random.default_rng(1)
    variables["params"] = jax.tree_util.tree_map(
        lambda p: p + 0.02 * perturb.standard_normal(p.shape).astype(np.asarray(p).dtype),
        variables["params"])
    te_base = model.host_te_params()
    set_te_lora_scale(1.0)
    te_lora = {
        key: init_te_lora(params, 4, jax.random.fold_in(jax.random.PRNGKey(7), i))
        for i, (key, params) in enumerate(sorted(te_base.items()))
    }
    schedule = get_lr_schedule(cfg, 3)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(
        model, variables, tx,
        text_encoder_params=te_base, text_encoder_lora=te_lora,
    )
    return model, cfg, batch, state, tx, schedule, te_lora


@pytest.mark.e2e
def test_sdxl_te_lora_trains_e2e():
    """SDXL dual-CLIP TE LoRA: adapters join the optimizer, captions encode
    in-step through the merged TEs, lora_B moves after a step, the frozen TE
    base stays bitwise untouched."""
    model, cfg, batch, state, tx, schedule, te_init = _te_lora_setup(
        "sdxl", ["a photo of a cat", "a painting of a dog"])
    assert set(state.trainable["te_lora"]) == {"te_0", "te_1"}
    assert "te_base" in state.frozen

    base_before = jax.device_get(state.frozen["te_base"])
    step = jax.jit(build_train_step(model, tx, schedule))
    losses = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)

    for key in ("te_0", "te_1"):
        moved = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.trainable["te_lora"][key], te_init[key])))
        assert moved > 0, f"{key} adapter unchanged after 2 steps"
    base_after = jax.device_get(state.frozen["te_base"])
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), base_before, base_after)
    assert max(jax.tree_util.tree_leaves(deltas)) == 0.0, "frozen TE base moved"


@pytest.mark.e2e
def test_sd3_te_lora_trains_with_frozen_t5():
    """SD3: CLIP-L/G adapters train while T5 embeds ride the batch from the
    frozen host encoder (reference: 'The third text encoder is not trained')."""
    model, cfg, batch, state, tx, schedule, _ = _te_lora_setup(
        "sd3", ["a castle", ""])
    assert set(state.trainable["te_lora"]) == {"te_0", "te_1"}
    assert "t5_seq" in batch  # frozen T5 encoded at collate
    step = jax.jit(build_train_step(model, tx, schedule))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    b_norm = max(
        float(jnp.max(jnp.abs(leaf)))
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.trainable["te_lora"])
        if "lora_B" in jax.tree_util.keystr(path)
    )
    assert b_norm > 0, "lora_B stayed zero: no gradient reached the TE adapters"


@pytest.mark.e2e
def test_sd1x_te_lora_trains_e2e():
    model, cfg, batch, state, tx, schedule, te_init = _te_lora_setup(
        "sd1x", ["a sketch"])
    assert set(state.trainable["te_lora"]) == {"te_0"}
    step = jax.jit(build_train_step(model, tx, schedule))
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    moved = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.trainable["te_lora"]["te_0"], te_init["te_0"])))
    assert moved > 0


def test_te_lora_peft_state_dict_round_trip():
    """te_lora_state_dict <-> te_lora_from_state_dict are exact inverses and
    use the PEFT torch layout (text_encoder. prefixes, transposed A/B)."""
    from simpletuner_tpu.models.text_encoders import load_text_encoders
    from simpletuner_tpu.training.te_lora import (
        init_te_lora, te_lora_from_state_dict, te_lora_state_dict,
    )

    cfg = _cfg(model_family="sdxl", model_type="lora", lora_rank=4)
    model = _build(cfg)
    te_base = model.host_te_params()
    te_lora = {
        key: init_te_lora(params, 4, jax.random.fold_in(jax.random.PRNGKey(1), i))
        for i, (key, params) in enumerate(sorted(te_base.items()))
    }
    # make B nonzero so the round trip is non-trivial
    te_lora = jax.tree_util.tree_map(lambda l: np.asarray(l) + 0.25, te_lora)
    sd = te_lora_state_dict(te_lora, alpha=4.0)
    prefixes = {k.split(".")[0] for k in sd}
    assert prefixes == {"text_encoder", "text_encoder_2"}
    assert any(k.endswith(".lora_A.weight") for k in sd)
    example_a = next(k for k in sd if k.endswith("q_proj.lora_A.weight"))
    assert sd[example_a].shape[0] == 4  # torch (r, in)
    back = te_lora_from_state_dict(sd, te_lora)
    np.testing.assert_array_equal(
        np.sort(np.asarray(jax.tree_util.tree_leaves(back)[0]).ravel()),
        np.sort(np.asarray(jax.tree_util.tree_leaves(te_lora)[0]).ravel()),
    )
    flat_a = jax.tree_util.tree_leaves_with_path(te_lora)
    flat_b = {jax.tree_util.keystr(p): l for p, l in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[jax.tree_util.keystr(path)]))


def test_te_lora_missing_modules_fail_loudly():
    from simpletuner_tpu.training.te_lora import (
        init_te_lora, te_lora_from_state_dict, te_lora_state_dict,
    )

    cfg = _cfg(model_type="lora", lora_rank=4)
    model = _build(cfg)
    te_base = model.host_te_params()
    te_lora = {"te_0": init_te_lora(te_base["te_0"], 4, jax.random.PRNGKey(0))}
    sd = te_lora_state_dict(te_lora)
    victim = next(k for k in sd if k.endswith(".lora_A.weight"))
    del sd[victim]
    with pytest.raises(KeyError, match="missing adapted modules"):
        te_lora_from_state_dict(sd, te_lora)
