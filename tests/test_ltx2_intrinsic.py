"""LTX-2 intrinsic conditioning (reference ltxvideo2/model.py:1680-1893):
clean-token conditioning via first_frame/prefix/suffix/spatial_crop/mask specs
— conditioned tokens get the clean latents at tokenwise t=0 and drop out of
the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.ltxvideo2.model import LTXVideo2


def _model(**extra):
    return LTXVideo2(
        TrainingConfig(
            {"model_family": "ltxvideo2", "model_type": "lora", "lora_rank": 0,
             "model_arch_preset": "tiny", "max_train_steps": 10, **extra}
        )
    )


def _prep(model, seed=0, batch_size=2):
    batch = model.example_batch(batch_size=batch_size)
    rng = np.random.default_rng(seed)
    batch["latents"] = jnp.asarray(rng.normal(size=batch["latents"].shape), jnp.float32)
    return model.prepare_batch(jax.random.PRNGKey(1), batch)


def test_first_frame_conditioning_holds_clean_tokens():
    model = _model(ltx2_first_frame_conditioning_probability=1.0)
    prepared = _prep(model)
    clean = np.asarray(prepared["latents"])
    noisy = np.asarray(prepared["noisy_latents"])
    # first frame exactly clean, later frames still noised
    np.testing.assert_allclose(noisy[:, 0], clean[:, 0], atol=1e-6)
    assert np.abs(noisy[:, 1] - clean[:, 1]).max() > 1e-3
    # tokenwise timesteps: frame-0 tokens at t=0, the rest at the drawn sigma
    t_tok = np.asarray(prepared["token_timesteps"])
    b, f, h, w, _ = clean.shape
    per_frame = t_tok.reshape(b, f, h * w)
    np.testing.assert_allclose(per_frame[:, 0], 0.0, atol=1e-7)
    sig = np.asarray(prepared["sigmas"]).reshape(b, 1)
    np.testing.assert_allclose(per_frame[:, 1], np.broadcast_to(sig, (b, h * w)), rtol=1e-6)
    # loss mask excludes the conditioned tokens
    mask = np.asarray(prepared["loss_mask"]).reshape(b, f, h * w)
    assert mask[:, 0].max() == 0.0 and mask[:, 1:].min() == 1.0


def test_suffix_and_spatial_specs():
    model = _model(
        ltx2_suffix_conditioning_probability=1.0, ltx2_suffix_conditioning_frames=1
    )
    prepared = _prep(model)
    clean = np.asarray(prepared["latents"])
    noisy = np.asarray(prepared["noisy_latents"])
    np.testing.assert_allclose(noisy[:, -1], clean[:, -1], atol=1e-6)
    assert np.abs(noisy[:, 0] - clean[:, 0]).max() > 1e-3

    model2 = _model(
        ltx2_intrinsic_conditioning=[
            {"type": "spatial_crop", "probability": 1.0, "region": [0, 0, 2, 2]}
        ]
    )
    prepared2 = _prep(model2)
    clean2 = np.asarray(prepared2["latents"])
    noisy2 = np.asarray(prepared2["noisy_latents"])
    np.testing.assert_allclose(noisy2[:, :, :2, :2], clean2[:, :, :2, :2], atol=1e-6)
    assert np.abs(noisy2[:, :, 2:, 2:] - clean2[:, :, 2:, 2:]).max() > 1e-3


def test_probability_zero_is_passthrough_and_unknown_type_raises():
    model = _model()
    prepared = _prep(model)
    assert "token_timesteps" not in prepared
    with pytest.raises(ValueError, match="Unsupported LTX-2 intrinsic"):
        _prep(_model(ltx2_intrinsic_conditioning=[{"type": "sideways"}]))
    with pytest.raises(ValueError, match="mask conditioning requested"):
        _prep(_model(ltx2_mask_conditioning_probability=1.0))


def test_mask_spec_uses_loss_mask_and_forward_runs():
    model = _model(ltx2_mask_conditioning_probability=1.0)
    batch = model.example_batch(batch_size=1)
    rng = np.random.default_rng(3)
    batch["latents"] = jnp.asarray(rng.normal(size=batch["latents"].shape), jnp.float32)
    b, f, h, w, _ = batch["latents"].shape
    pix = np.zeros((1, h, w), np.float32)
    pix[:, : h // 2] = 1.0
    batch["loss_mask"] = jnp.asarray(pix)
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    clean = np.asarray(prepared["latents"])
    noisy = np.asarray(prepared["noisy_latents"])
    np.testing.assert_allclose(noisy[:, :, : h // 2], clean[:, :, : h // 2], atol=1e-6)
    assert np.abs(noisy[:, :, h // 2 :] - clean[:, :, h // 2 :]).max() > 1e-3

    # full jitted loss with tokenwise timesteps stays finite
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    loss, aux = jax.jit(model.loss_fn)(variables, jax.random.PRNGKey(2), batch)
    assert np.isfinite(float(loss))
