"""LTX-2 IC-LoRA reference-video conditioning (reference ltxvideo2/model.py:
2048-2102 ref-token concat + :1916-1948 rope coord scaling; validation knob at
:1161-1195 + pipeline_ltx2.py:792)."""

import json

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


def _batch_with_ref(model, ref_hw_scale=1, seed=0):
    batch = model.example_batch(batch_size=1)
    rng = np.random.default_rng(seed)
    batch["latents"] = jnp.asarray(rng.normal(size=batch["latents"].shape), jnp.float32)
    b, f, h, w, c = batch["latents"].shape
    rh, rw = h // ref_hw_scale, w // ref_hw_scale
    batch["control_latents"] = jnp.asarray(
        rng.normal(size=(b, f, rh, rw, c)), jnp.float32
    )
    return batch


def test_ic_lora_forward_and_loss():
    """Reference tokens concat, prediction stays target-shaped, loss finite
    and sensitive to the reference content."""
    model = _model()
    batch = _batch_with_ref(model)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape

    loss_a, _ = model.loss_fn(variables, jax.random.PRNGKey(2), batch)
    other = dict(batch)
    other["control_latents"] = batch["control_latents"] + 1.0
    loss_b, _ = model.loss_fn(variables, jax.random.PRNGKey(2), other)
    assert np.isfinite(float(loss_a)) and np.isfinite(float(loss_b))
    assert abs(float(loss_a) - float(loss_b)) > 1e-8


def test_ic_lora_downscaled_reference_infers_spatial_scale():
    model = _model()
    batch = _batch_with_ref(model, ref_hw_scale=2)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    inputs = model.get_model_inputs(prepared)
    assert inputs["ref_spatial_scale"] == 2
    pred = model.model_predict(variables, prepared)
    assert pred.shape == batch["latents"].shape


def test_ic_lora_uneven_reference_raises():
    model = _model()
    batch = model.example_batch(batch_size=1)
    b, f, h, w, c = batch["latents"].shape
    if h < 3:
        pytest.skip("tiny latent too small for uneven test")
    batch["control_latents"] = jnp.zeros((b, f, h - 1, w, c), jnp.float32)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    with pytest.raises(ValueError, match="evenly divide"):
        model.get_model_inputs(prepared)


def test_ref_coord_scaling_matches_reference_math():
    """Spatial coords multiply by the scale; temporal coords shift back by
    (temporal_scale-1) x first-target-patch-end and clamp at 0
    (reference _scale_ltx2_reference_coords, model.py:1916-1948)."""
    from simpletuner_tpu.models.ltxvideo2.transformer import LTX2Config, ltx2_video_coords

    cfg = LTX2Config.tiny() if hasattr(LTX2Config, "tiny") else LTX2Config()
    coords = ltx2_video_coords(cfg, 2, 4, 4, fps=25.0)
    scaled = coords.copy()
    spatial, temporal = 2, 3
    sf_t = cfg.vae_scale_factors[0]
    first_end = max(cfg.patch_size_t * sf_t + cfg.causal_offset - sf_t, 0.0) / 25.0
    scaled[:, 0] = np.clip(scaled[:, 0] - (temporal - 1) * first_end, 0.0, None)
    scaled[:, 1] *= spatial
    scaled[:, 2] *= spatial
    assert (scaled[:, 1] == coords[:, 1] * 2).all()
    assert (scaled[:, 0] >= 0).all()


def test_validation_conditioning_parser():
    model = _model(validation_ltx2_video_conditioning=json.dumps(
        ["/a/b.mp4", ["/c/d.mp4", 0.5], {"video_path": "/e/f.mp4", "strength": 0.25}]
    ))
    entries = model.validation_video_conditioning_entries()
    assert entries == [("/a/b.mp4", 1.0), ("/c/d.mp4", 0.5), ("/e/f.mp4", 0.25)]

    with pytest.raises(ValueError, match="missing path"):
        _model(validation_ltx2_video_conditioning=json.dumps([{"strength": 1.0}])
               ).validation_video_conditioning_entries()
    assert _model().validation_video_conditioning_entries() is None


def test_validation_ref_rides_inference_conditioning():
    model = _model()
    batch = model.example_batch(batch_size=1)
    b, f, h, w, c = batch["latents"].shape
    model.set_validation_video_conditioning(np.ones((1, f, h, w, c), np.float32), 0.5)
    cond = model.inference_conditioning({"text_embeds": batch["text_embeds"]})
    assert "control_latents" in cond
    assert float(cond["conditioning_strength"][0]) == 0.5
