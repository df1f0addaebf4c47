"""Full-depth CREPA (training/crepa.py) vs the reference formulas.

Reference: helpers/training/crepa.py — CrepaScheduler._compute_scheduled_weight
(warmup/linear/cosine/polynomial/cutoff), compute_loss Eq.(6) adjacency
weighting, _update_similarity_ema (permanent/recoverable threshold modes),
attach_to_model (projector), self-flow EMA teacher; plus the trainer wiring
(crepa_params in the train state, crepa_cutoff host flag).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.training.crepa import (
    CrepaHostState,
    CrepaSettings,
    alignment_loss,
    apply_projector,
    crepa_loss_term,
    init_projector,
    scheduled_weight,
    to_btnd,
)

pytestmark = pytest.mark.slow


def make_settings(**kw):
    defaults = dict(enabled=True, block_index=1, max_train_steps=100)
    defaults.update(kw)
    return CrepaSettings(**defaults)


# ---------------------------------------------------------------------------------
# weight schedule: exact reference math
# ---------------------------------------------------------------------------------


def test_schedule_warmup_linear_ramp():
    s = make_settings(base_weight=0.8, warmup_steps=10, scheduler="constant")
    for step, want in [(0, 0.0), (5, 0.4), (10, 0.8), (50, 0.8)]:
        got = float(scheduled_weight(s, jnp.asarray(step)))
        assert got == pytest.approx(want, abs=1e-6), step


def test_schedule_linear_decay():
    s = make_settings(
        base_weight=1.0, lambda_end=0.2, scheduler="linear",
        warmup_steps=0, decay_steps=100,
    )
    assert float(scheduled_weight(s, jnp.asarray(0))) == pytest.approx(1.0)
    assert float(scheduled_weight(s, jnp.asarray(50))) == pytest.approx(0.6)
    assert float(scheduled_weight(s, jnp.asarray(100))) == pytest.approx(0.2)
    assert float(scheduled_weight(s, jnp.asarray(500))) == pytest.approx(0.2)


def test_schedule_cosine_decay():
    s = make_settings(
        base_weight=1.0, lambda_end=0.0, scheduler="cosine", decay_steps=100,
    )
    # reference: end + (base-end) * (1 + cos(pi * progress)) / 2
    for step in (0, 25, 50, 75, 100):
        want = (1 + math.cos(math.pi * step / 100)) / 2
        assert float(scheduled_weight(s, jnp.asarray(step))) == pytest.approx(want, abs=1e-5)


def test_schedule_polynomial_power():
    s = make_settings(
        base_weight=1.0, lambda_end=0.0, scheduler="polynomial",
        decay_steps=100, power=2.0,
    )
    assert float(scheduled_weight(s, jnp.asarray(50))) == pytest.approx(0.25, abs=1e-6)


def test_schedule_cutoff_step_zeroes():
    s = make_settings(base_weight=1.0, cutoff_step=30)
    assert float(scheduled_weight(s, jnp.asarray(29))) == pytest.approx(1.0)
    assert float(scheduled_weight(s, jnp.asarray(30))) == 0.0
    assert float(scheduled_weight(s, jnp.asarray(99))) == 0.0


# ---------------------------------------------------------------------------------
# alignment loss: hand-computed adjacency weighting
# ---------------------------------------------------------------------------------


def _numpy_alignment(p, f, distance, tau, cumulative, norm_sum, norm_frames):
    """Reference Eq.(6) re-derived in numpy (B,T,N,D inputs, unnormalized)."""
    p = p / (np.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
    f = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
    sim = lambda a, b: (a * b).sum(-1).mean(-1)  # (B,T)
    total = sim(p, f)
    weights = np.ones_like(total) if norm_sum else None
    T = p.shape[1]
    d = min(distance, T - 1)
    offsets = range(1, d + 1) if cumulative else ([d] if d > 0 else [])
    for off in offsets:
        w = math.exp(-off / tau)
        total[:, :-off] += w * sim(p[:, :-off], f[:, off:])
        total[:, off:] += w * sim(p[:, off:], f[:, :-off])
        if weights is not None:
            weights[:, :-off] += w
            weights[:, off:] += w
    if weights is not None:
        total = total / np.maximum(weights, 1e-12)
    per_video = total.sum(1)
    if norm_frames:
        per_video = per_video / T
    return -per_video.mean()


@pytest.mark.parametrize("cumulative", [False, True])
@pytest.mark.parametrize("norm_sum", [False, True])
def test_alignment_matches_reference_math(cumulative, norm_sum):
    rng = np.random.default_rng(0)
    p = rng.standard_normal((2, 5, 3, 8)).astype(np.float32)
    f = rng.standard_normal((2, 5, 3, 8)).astype(np.float32)
    s = make_settings(
        distance=2, tau=0.7, cumulative_neighbors=cumulative,
        normalize_neighbour_sum=norm_sum, normalize_by_frames=True,
    )
    loss, align, self_sim = alignment_loss(jnp.asarray(p), jnp.asarray(f), s)
    want = _numpy_alignment(p.copy(), f.copy(), 2, 0.7, cumulative, norm_sum, True)
    assert float(loss) == pytest.approx(float(want), abs=1e-5)
    assert np.isfinite(float(align)) and np.isfinite(float(self_sim))


def test_alignment_identical_features_maximal():
    x = np.random.default_rng(1).standard_normal((1, 3, 4, 8)).astype(np.float32)
    s = make_settings(distance=0, normalize_by_frames=True)
    loss, align, self_sim = alignment_loss(jnp.asarray(x), jnp.asarray(x), s)
    # cos(x, x) = 1 per patch -> per-video mean similarity 1 -> loss -1
    assert float(loss) == pytest.approx(-1.0, abs=1e-5)
    assert float(self_sim) == pytest.approx(1.0, abs=1e-5)


def test_to_btnd_video_frame_reshape():
    tokens = jnp.zeros((2, 12, 8))
    out = to_btnd(tokens, "video", num_frames=4)
    assert out.shape == (2, 4, 3, 8)
    # indivisible stream degrades to per-token frames
    out = to_btnd(jnp.zeros((2, 13, 8)), "video", num_frames=4)
    assert out.shape == (2, 13, 1, 8)
    assert to_btnd(jnp.zeros((2, 12, 8)), "image").shape == (2, 1, 12, 8)


# ---------------------------------------------------------------------------------
# similarity-EMA cutoff host state
# ---------------------------------------------------------------------------------


def test_host_state_permanent_cutoff():
    s = make_settings(similarity_threshold=0.9, similarity_ema_decay=0.0,
                      threshold_mode="permanent")
    host = CrepaHostState(s)
    host.update(0.5)
    assert host.flag() == 0.0
    host.update(0.95)  # decay 0 -> ema = latest
    assert host.flag() == 1.0
    host.update(0.1)  # permanent: stays triggered
    assert host.flag() == 1.0


def test_host_state_recoverable_cutoff():
    s = make_settings(similarity_threshold=0.9, similarity_ema_decay=0.0,
                      threshold_mode="recoverable")
    host = CrepaHostState(s)
    host.update(0.95)
    assert host.flag() == 1.0
    host.update(0.1)
    assert host.flag() == 0.0


def test_host_state_ema_decay():
    s = make_settings(similarity_threshold=0.9, similarity_ema_decay=0.5)
    host = CrepaHostState(s)
    host.update(1.0)
    host.update(0.0)
    assert host.ema == pytest.approx(0.5)
    host.update(np.nan)  # non-finite scores are ignored
    assert host.ema == pytest.approx(0.5)


# ---------------------------------------------------------------------------------
# settings validation
# ---------------------------------------------------------------------------------


def _cfg(**kw):
    base = {"model_family": "flux", "model_type": "lora", "lora_rank": 4,
            "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 10}
    base.update(kw)
    return TrainingConfig(base)


def test_settings_source_conflicts_raise():
    with pytest.raises(ValueError, match="cannot both"):
        CrepaSettings.from_config(_cfg(
            crepa_enabled=True, crepa_use_backbone_features=True, crepa_self_flow=True,
        ))
    with pytest.raises(ValueError, match="conflicts"):
        CrepaSettings.from_config(_cfg(
            crepa_enabled=True, crepa_feature_source="encoder",
            crepa_use_backbone_features=True,
        ))
    with pytest.raises(ValueError, match="unsupported crepa_feature_source"):
        CrepaSettings.from_config(_cfg(crepa_enabled=True, crepa_feature_source="bogus"))


def test_settings_self_flow_requires_ema_and_teacher_block():
    with pytest.raises(ValueError, match="crepa_teacher_block_index"):
        CrepaSettings.from_config(_cfg(
            crepa_enabled=True, crepa_feature_source="self_flow", use_ema=True,
        ))
    with pytest.raises(ValueError, match="use_ema"):
        CrepaSettings.from_config(_cfg(
            crepa_enabled=True, crepa_feature_source="self_flow",
            crepa_teacher_block_index=0,
        ))


def test_settings_disabled_by_default():
    assert not CrepaSettings.from_config(_cfg()).enabled


# ---------------------------------------------------------------------------------
# loss-path integration (flux tiny)
# ---------------------------------------------------------------------------------


def make_flux(**extra):
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig

    return Flux(_cfg(**extra), arch=FluxConfig.tiny())


def test_backbone_source_loss_and_projector_grads():
    model = make_flux(
        crepa_enabled=True, crepa_feature_source="backbone",
        crepa_block_index=0, crepa_teacher_block_index=2, crepa_lambda=1.0,
    )
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    hidden = model.arch.hidden_size
    variables["crepa_params"] = init_projector(jax.random.PRNGKey(2), hidden, hidden)

    def loss(proj):
        value, aux = model.loss_fn(
            {**variables, "crepa_params": proj}, jax.random.PRNGKey(1), batch
        )
        return value, aux

    (value, aux), grads = jax.jit(jax.value_and_grad(loss, has_aux=True))(
        variables["crepa_params"]
    )
    assert np.isfinite(float(value))
    for key in ("crepa_loss", "crepa_alignment_score", "crepa_weight"):
        assert key in aux and np.isfinite(float(aux[key])), key
    # projector receives gradient (the reference trains it with the model)
    assert float(jnp.abs(grads["kernel"]).max()) > 0


def test_encoder_source_with_vision_teacher():
    from simpletuner_tpu.models.vision_encoder import build_vision_teacher

    model = make_flux(
        crepa_enabled=True, crepa_feature_source="encoder",
        crepa_block_index=1, crepa_lambda=0.5, crepa_encoder_image_size=64,
        crepa_encoder="tiny",
    )
    module, params, dim = build_vision_teacher("tiny", None, jax.random.PRNGKey(5))
    model._crepa_teacher_module = module
    # stand-in decoder: latents (B,h,w,C) -> pixels (B,8h,8w,3) in [-1,1]
    model._crepa_decode_fn = lambda variables, z: jnp.tanh(
        jax.image.resize(z[..., :3], (z.shape[0], z.shape[1] * 8, z.shape[2] * 8, 3),
                         "bilinear")
    )
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    variables["crepa_teacher"] = params
    variables["crepa_params"] = init_projector(
        jax.random.PRNGKey(2), model.arch.hidden_size, dim
    )
    value, aux = jax.jit(model.loss_fn)(variables, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(value))
    assert np.isfinite(float(aux["crepa_alignment_score"]))


def test_self_flow_source_with_ema_overlay():
    model = make_flux(
        crepa_enabled=True, crepa_feature_source="self_flow",
        crepa_block_index=1, crepa_teacher_block_index=1, crepa_lambda=1.0,
        use_ema=True, crepa_self_flow_mask_ratio=0.2,
    )
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    hidden = model.arch.hidden_size
    variables["crepa_params"] = init_projector(jax.random.PRNGKey(2), hidden, hidden)
    # EMA overlay: a perturbed copy of the adapters rides the batch
    ema = {"lora": jax.tree_util.tree_map(lambda x: x + 0.01, variables["lora"])}
    batch = dict(batch)
    batch["crepa_ema_trainable"] = ema
    value, aux = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(value))
    assert "crepa_loss" in aux


def test_missing_projector_fails_loudly():
    model = make_flux(
        crepa_enabled=True, crepa_feature_source="backbone",
        crepa_block_index=0, crepa_teacher_block_index=2,
    )
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="crepa_params"):
        model.loss_fn(variables, jax.random.PRNGKey(1), batch)


def test_cutoff_flag_zeroes_term():
    model = make_flux(
        crepa_enabled=True, crepa_feature_source="backbone",
        crepa_block_index=0, crepa_teacher_block_index=2, crepa_lambda=1.0,
    )
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    hidden = model.arch.hidden_size
    variables["crepa_params"] = init_projector(jax.random.PRNGKey(2), hidden, hidden)
    on = dict(batch)
    on["crepa_cutoff"] = jnp.asarray(1.0)
    _, aux_on = model.loss_fn(variables, jax.random.PRNGKey(1), on)
    _, aux_off = model.loss_fn(variables, jax.random.PRNGKey(1), batch)
    assert float(aux_on["crepa_weight"]) == 0.0
    assert float(aux_off["crepa_weight"]) == pytest.approx(1.0)


# ---------------------------------------------------------------------------------
# projector
# ---------------------------------------------------------------------------------


def test_projector_shapes_and_layernorm():
    params = init_projector(jax.random.PRNGKey(0), 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 5, 16))
    out = apply_projector(params, x)
    assert out.shape == (2, 1, 5, 8)
    # LayerNorm precedes the linear: scaling the input must not change the
    # normalized activations feeding the kernel
    out2 = apply_projector(params, x * 100.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-3)


# ---------------------------------------------------------------------------------
# trainer e2e: 2 real steps with CREPA backbone source (the full wiring:
# init_crepa projector sizing, crepa_params in the optimizer, cutoff flag)
# ---------------------------------------------------------------------------------


def _trainer_config(tmp_path, **extra):
    import os

    from PIL import Image

    root = tmp_path / "data"
    root.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(
            root / f"i_{i}.png"
        )
        (root / f"i_{i}.txt").write_text(f"photo {i}")
    cache_root = str(tmp_path / "cache")
    return TrainingConfig({
        "model_family": "flux", "model_type": "lora", "lora_rank": 4,
        "model_arch_preset": "tiny", "optimizer": "adamw", "learning_rate": 1e-4,
        "max_train_steps": 2, "train_batch_size": 1, "resolution": 32,
        "report_to": "none", "checkpointing_steps": None,
        "validation_prompt": None, "validation_steps": None,
        "cache_dir": cache_root, "output_dir": str(tmp_path / "out"),
        "push_to_hub": False,
        "data_backend_config": [
            {"id": "train", "dataset_type": "image", "type": "local",
             "instance_data_dir": str(root), "crop": True, "crop_style": "center",
             "crop_aspect": "square", "resolution": 32,
             "resolution_type": "pixel_area", "caption_strategy": "textfile",
             "cache_dir_vae": os.path.join(cache_root, "vae"),
             "text_embeds": "embeds", "repeats": 7},
            {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
             "default": True, "cache_dir": os.path.join(cache_root, "text")},
        ],
        **extra,
    })


@pytest.mark.e2e
def test_trainer_e2e_crepa_backbone(tmp_path):
    from simpletuner_tpu.training.trainer import Trainer

    config = _trainer_config(
        tmp_path,
        crepa_enabled=True, crepa_feature_source="backbone",
        crepa_block_index=0, crepa_teacher_block_index=2, crepa_lambda=0.5,
        crepa_similarity_threshold=0.999, crepa_scheduler="linear",
        crepa_lambda_end=0.1,
    )
    trainer = Trainer(config=config)
    trainer.run()
    assert trainer.global_step == 2
    assert "crepa_params" in trainer._state.trainable
    assert "crepa_cutoff" in trainer._align_hosts


@pytest.mark.e2e
def test_trainer_e2e_crepa_encoder_tiny_teacher(tmp_path):
    from simpletuner_tpu.training.trainer import Trainer

    config = _trainer_config(
        tmp_path,
        crepa_enabled=True, crepa_feature_source="encoder",
        crepa_block_index=1, crepa_lambda=0.5, crepa_encoder="tiny",
        crepa_encoder_image_size=64,
    )
    trainer = Trainer(config=config)
    trainer.run()
    assert trainer.global_step == 2
    assert "crepa_teacher" in trainer._state.frozen
    assert "crepa_vae" in trainer._state.frozen


@pytest.mark.e2e
def test_trainer_e2e_urepa_in_loop_scheduled(tmp_path):
    """U-REPA on a UNet with scheduled weight + in-loop tiny encoder."""
    from simpletuner_tpu.training.trainer import Trainer

    config = _trainer_config(
        tmp_path,
        model_family="sd1x",
        urepa_enabled=True, urepa_lambda=0.5, urepa_scheduler="cosine",
        urepa_model="tiny",
        urepa_similarity_threshold=0.999, urepa_encoder_image_size=64,
    )
    trainer = Trainer(config=config)
    trainer.run()
    assert trainer.global_step == 2
    assert "urepa_cutoff" in trainer._align_hosts
