"""HeartMuLa autoregressive music LM: forward shapes, masked CE loss, and a

LoRA train step (reference: helpers/models/heartmula/{model,modeling_heartmula}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.heartmula.model import HeartMuLa
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make_model(**extra):
    cfg = TrainingConfig(
        {
            "model_family": "heartmula",
            "model_type": "lora",
            "lora_rank": 4,
            "model_arch_preset": "tiny",
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            **extra,
        }
    )
    return HeartMuLa(cfg)

@pytest.fixture(scope="module")
def model_and_vars():
    model = make_model()
    rng = jax.random.PRNGKey(0)
    batch = model.example_batch(batch_size=2)
    batch["tokens"] = jax.random.randint(rng, batch["tokens"].shape, 0, 32)
    variables = model.init_params(jax.random.PRNGKey(1), batch)
    return model, variables, batch

def test_registered():
    assert "heartmula" in ModelRegistry.families()
    meta = ModelRegistry.metadata("heartmula")
    assert meta["modality"] == "audio" and meta["prediction"] == "autoregressive"

def test_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    out = model.model_predict(variables, prepared)
    B, S, K1 = batch["tokens"].shape
    K = K1 - 1
    vocab = model.arch["audio_vocab"]
    assert out["codebook0_logits"].shape == (B, S - 1, vocab)
    assert out["codebook_logits"].shape == (B, S - 1, K - 1, vocab)

def test_loss_masks_padded_frames(model_and_vars):
    model, variables, batch = model_and_vars
    loss_full, _ = model.loss_fn(variables, jax.random.PRNGKey(3), batch)
    # zero out all frames but the first two: loss must change (it no longer
    # averages over the padded tail) yet stay finite
    masked = dict(batch)
    mask = np.zeros(batch["audio_frame_mask"].shape, np.float32)
    mask[:, :2] = 1.0
    masked["audio_frame_mask"] = jnp.asarray(mask)
    loss_masked, logs = model.loss_fn(variables, jax.random.PRNGKey(3), masked)
    assert np.isfinite(float(loss_masked)) and np.isfinite(float(loss_full))
    assert "ce_codebook0" in logs and "ce_rest" in logs
    assert abs(float(loss_masked) - float(loss_full)) > 1e-7

def test_lora_train_step_reduces_loss():
    model = make_model()
    rng = jax.random.PRNGKey(0)
    batch = model.example_batch(batch_size=2)
    batch["tokens"] = jax.random.randint(rng, batch["tokens"].shape, 0, 32)
    variables = model.init_params(jax.random.PRNGKey(1), batch)
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    assert "lora" in state.trainable
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]  # overfits the fixed tiny batch

def test_caption_dropout_uses_uncond_embedding():
    model = make_model(caption_dropout_probability=1.0)
    rng = jax.random.PRNGKey(0)
    batch = model.example_batch(batch_size=2)
    batch["tokens"] = jax.random.randint(rng, batch["tokens"].shape, 0, 32)
    variables = model.init_params(jax.random.PRNGKey(1), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    assert bool(jnp.all(prepared["uncond_mask"]))
    out_uncond = model.model_predict(variables, prepared)
    prepared_cond = dict(prepared)
    prepared_cond.pop("uncond_mask")
    out_cond = model.model_predict(variables, prepared_cond)
    assert bool(jnp.any(out_uncond["codebook0_logits"] != out_cond["codebook0_logits"]))

def test_collate_token_batch_grid_layout():
    """Grid semantics of reference model.py:401-481 collate_audio_tokens:
    tags ids then a separator row then lyric ids on the text column, codec
    frames on the first K columns, masks split text/audio."""
    model = make_model()
    K = model.arch["num_codebooks"]
    audio = np.arange(5 * K).reshape(5, K) % 7 + 1
    batch = model.collate_token_batch(
        [{"tags": "rock, synth", "lyrics": "la la", "audio_tokens": audio}]
    )
    tokens, mask = batch["tokens"][0], batch["tokens_mask"][0]
    frame_mask = batch["audio_frame_mask"][0]
    tag_ids = model._text_token_ids(model._normalize_tags("rock, synth"))
    lyric_ids = model._text_token_ids("la la")
    prompt_len = len(tag_ids) + 1 + len(lyric_ids)
    # text column carries tags then (separator row stays empty) lyrics
    np.testing.assert_array_equal(tokens[: len(tag_ids), -1], tag_ids)
    assert tokens[len(tag_ids), -1] == 0  # separator row = empty_id
    np.testing.assert_array_equal(tokens[len(tag_ids) + 1 : prompt_len, -1], lyric_ids)
    # audio rows carry codec frames on the first K columns
    np.testing.assert_array_equal(tokens[prompt_len : prompt_len + 5, :K], audio)
    # masks: text column masked over the prompt, codebooks over audio rows
    assert mask[: prompt_len, -1].all() and not mask[:prompt_len, :K].any()
    assert mask[prompt_len : prompt_len + 5, :K].all()
    assert not frame_mask[:prompt_len].any() and frame_mask[prompt_len : prompt_len + 5].all()
    # padded region is inert
    assert tokens.shape[0] % 32 == 0
    assert not mask[prompt_len + 5 :].any()
    # transposed [codebooks, frames] input resolves identically
    batch_t = model.collate_token_batch(
        [{"tags": "rock, synth", "lyrics": "la la", "audio_tokens": audio.T}]
    )
    np.testing.assert_array_equal(batch_t["tokens"], batch["tokens"])


def test_collate_token_batch_trains(model_and_vars):
    """A collated token batch flows through loss_fn to a finite loss."""
    model = make_model()
    K = model.arch["num_codebooks"]
    rng = np.random.default_rng(5)
    examples = [
        {"tags": "piano", "lyrics": "hello world", "audio_tokens": rng.integers(0, 30, (9, K))},
        {"tags": "edm, bass", "lyrics": "drop it", "audio_tokens": rng.integers(0, 30, (12, K))},
    ]
    batch = {k: jnp.asarray(v) for k, v in model.collate_token_batch(examples).items()}
    variables = model.init_params(jax.random.PRNGKey(2), batch)
    loss, aux = model.loss_fn(variables, jax.random.PRNGKey(3), batch)
    assert np.isfinite(float(loss))
