"""MuonClip QK-clip: per-head max attention logits collected in the forward,
q/k projections rescaled after the optimizer step (reference
helpers/training/optimizers/muon _apply_qk_clip + trainer.py:6743-6751)."""

import numpy as np
import jax
import jax.numpy as jnp

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux

import pytest

pytestmark = pytest.mark.slow

def _model(optimizer="muon", model_type="full"):
    cfg = TrainingConfig(
        {"model_family": "flux", "model_type": model_type, "model_arch_preset": "tiny",
         "lora_rank": 0 if model_type == "full" else 4, "optimizer": optimizer,
         "learning_rate": 1e-4, "max_train_steps": 5, "flux_guidance_value": 1.0}
    )
    return Flux(cfg)

def test_wants_qk_clip_gating():
    assert _model("muon", "full").wants_qk_clip
    assert not _model("adamw", "full").wants_qk_clip
    assert not _model("muon", "lora").wants_qk_clip  # frozen base must not mutate

def test_qk_max_collected_in_aux():
    model = _model()
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    loss, aux = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
    qk = {k: v for k, v in aux.items() if k.startswith("qk_clip/")}
    arch = model.arch
    assert len(qk) == arch.depth_double + arch.depth_single
    for value in qk.values():
        assert value.shape == (arch.num_heads,)
        assert bool(jnp.all(jnp.isfinite(value)))

def test_apply_qk_clip_scales_offending_heads():
    model = _model()
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    trainable = {"params": variables["params"]}
    heads = model.arch.num_heads
    dh = model.arch.head_dim

    # head 0 exceeded tau=100 by 4x; head 1 stayed below
    maxima = {"double_0": jnp.asarray([400.0] + [50.0] * (heads - 1))}
    before_q = np.asarray(trainable["params"]["double_0"]["img_attn_q"]["kernel"])
    before_k = np.asarray(trainable["params"]["double_0"]["img_attn_k"]["kernel"])
    clipped = model.apply_qk_clip(trainable, maxima, tau=100.0, alpha=0.5)
    after_q = np.asarray(clipped["params"]["double_0"]["img_attn_q"]["kernel"])
    after_k = np.asarray(clipped["params"]["double_0"]["img_attn_k"]["kernel"])

    g = 0.25 ** 0.5  # gamma^alpha for head 0
    np.testing.assert_allclose(after_q[:, :dh], before_q[:, :dh] * g, rtol=1e-6)
    np.testing.assert_allclose(after_k[:, :dh], before_k[:, :dh] * g, rtol=1e-6)
    # untouched heads stay bit-identical
    np.testing.assert_array_equal(after_q[:, dh:], before_q[:, dh:])
    # combined q*k logit scaling = gamma
    assert np.isclose((after_q[0, 0] / before_q[0, 0]) * (after_k[0, 0] / before_k[0, 0]), 0.25)

def test_muon_full_rank_step_applies_clip():
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    model = _model()
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # flux qk-RMSNorms absorb kernel scale, so drive the logits through the
    # learned norm scales (the realistic runaway path under qk-norm)
    params = variables["params"]
    params["double_0"]["img_attn_norm_q"]["scale"] = (
        params["double_0"]["img_attn_norm_q"]["scale"] * 60.0
    )
    params["double_0"]["img_attn_norm_k"]["scale"] = (
        params["double_0"]["img_attn_norm_k"]["scale"] * 60.0
    )
    schedule = get_lr_schedule(model.config, 5)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    before = float(jnp.abs(state.trainable["params"]["double_0"]["img_attn_q"]["kernel"]).max())
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    after = float(jnp.abs(state.trainable["params"]["double_0"]["img_attn_q"]["kernel"]).max())
    assert np.isfinite(float(metrics["loss"]))
    # the clip shrinks the inflated q projection well below its pre-step scale
    assert after < before * 0.8, (before, after)