import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.parallel.mesh import MeshConfig, build_mesh, batch_sharding
from simpletuner_tpu.training.ema import EMAConfig
from simpletuner_tpu.training.optimizers import get_optimizer, optimizer_names
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import (
    build_train_step,
    create_train_state,
    jit_train_step,
)

pytestmark = pytest.mark.slow


def _open_adaln_gates(variables, seed=9, scale=0.05):
    """Flux is AdaLN-ZERO: at raw init every gate is exactly 0, so adapters in
    gated branches get exactly zero gradient (constant loss).  Perturb the base
    params like pretrained weights would so adapter training is observable.
    (The pre-round-5 green runs of these tests were an artifact of a corrupted
    XLA compile cache producing drifting math — see tests/conftest.py.)"""
    import jax as _jax

    leaves, treedef = _jax.tree_util.tree_flatten(variables["params"])
    keys = _jax.random.split(_jax.random.PRNGKey(seed), len(leaves))
    leaves = [l + scale * _jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    return dict(variables, params=_jax.tree_util.tree_unflatten(treedef, leaves))

def _tiny_setup(model_type="lora", use_ema=False, **extra):
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": model_type,
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 100,
            **extra,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=8, resolution=32)
    variables = _open_adaln_gates(model.init_params(jax.random.PRNGKey(0), batch))
    schedule = get_lr_schedule(cfg, 100)
    tx = get_optimizer(cfg, schedule)
    ema_cfg = EMAConfig() if use_ema else None
    state = create_train_state(model, variables, tx, ema_cfg)
    step_fn = build_train_step(model, tx, schedule, ema_cfg)
    return model, state, step_fn, batch

def test_train_step_reduces_loss_lora():
    model, state, step_fn, batch = _tiny_setup()
    step = jax.jit(step_fn, donate_argnums=(0,))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))  # fixed noise
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert int(state.step) == 8

def test_train_step_full_model():
    model, state, step_fn, batch = _tiny_setup(model_type="full")
    assert "params" in state.trainable and "lora" not in state.trainable
    step = jax.jit(step_fn, donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert jnp.isfinite(metrics["loss"])

def test_train_step_ema_tracks():
    model, state, step_fn, batch = _tiny_setup(use_ema=True)
    assert state.ema is not None
    step = jax.jit(step_fn, donate_argnums=(0,))
    before = jax.tree_util.tree_leaves(state.ema)[0].copy()
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    leaves_ema = jax.tree_util.tree_leaves(state.ema)
    leaves_train = jax.tree_util.tree_leaves(state.trainable)
    assert any(bool(jnp.any(e != b)) for e, b in zip(leaves_ema, [before] * len(leaves_ema)))
    # ema stays finite and near trainable
    assert all(bool(jnp.isfinite(e).all()) for e in leaves_ema)

def test_sharded_train_step_on_virtual_mesh():
    # 8 virtual CPU devices: data=4, fsdp=2
    model, state, step_fn, batch = _tiny_setup()
    mesh = build_mesh(MeshConfig(fsdp_size=2, context_size=1))
    assert mesh.devices.size == 8
    step = jit_train_step(step_fn, mesh, state)
    batch = jax.device_put(batch, batch_sharding(mesh))
    step_before = int(state.step)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert jnp.isfinite(metrics["loss"])
    assert int(state2.step) == step_before + 1

def test_nonfinite_guard_skips_update():
    model, state, step_fn, batch = _tiny_setup()
    bad = dict(batch)
    bad["latents"] = jnp.full_like(batch["latents"], jnp.nan)
    step = jax.jit(step_fn)
    before = jax.tree_util.tree_leaves(state.trainable)
    state2, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped_nonfinite"]) == 1.0
    after = jax.tree_util.tree_leaves(state2.trainable)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

@pytest.mark.parametrize("name", ["adamw", "adamw_bf16", "lion", "adafactor", "prodigy", "muon"])
def test_optimizer_variants_run(name):
    model, state, step_fn, batch = _tiny_setup(optimizer=name)
    step = jax.jit(step_fn)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert jnp.isfinite(metrics["loss"])

def test_grad_accumulation():
    """GA batches carry a leading micro axis; one call = one optimizer update
    over averaged micro-grads."""
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 100,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=8, resolution=32)
    variables = _open_adaln_gates(model.init_params(jax.random.PRNGKey(0), batch))
    schedule = get_lr_schedule(cfg, 100)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_accum = jax.jit(build_train_step(model, tx, schedule, grad_accum_steps=2))

    micro = {k: v.reshape(2, 4, *v.shape[1:]) for k, v in batch.items()}
    state2, metrics = step_accum(state, micro, jax.random.PRNGKey(0))
    assert int(state2.step) == int(state.step) + 1
    assert jnp.isfinite(metrics["loss"])
    p0 = jax.tree_util.tree_leaves(state.trainable)[0]
    p1 = jax.tree_util.tree_leaves(state2.trainable)[0]
    assert bool(jnp.any(p0 != p1))

def test_grad_accumulation_scalars_and_aux():
    """Scalar batch entries (slider_scale) ride the scan with a broadcast
    (accum,) axis, and aux metrics survive accumulation instead of vanishing."""
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 100,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=4, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    schedule = get_lr_schedule(cfg, 100)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step_accum = jax.jit(build_train_step(model, tx, schedule, grad_accum_steps=2))

    micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in batch.items()}
    micro["slider_scale"] = jnp.ones((2,), jnp.float32)  # per-micro-step scalar
    state2, metrics = step_accum(state, micro, jax.random.PRNGKey(0))
    assert jnp.isfinite(metrics["loss"])
    assert int(state2.step) == 1

def test_lr_schedules_shapes():
    cfg = TrainingConfig({"learning_rate": 1e-3, "lr_warmup_steps": 10, "lr_scheduler": "polynomial", "max_train_steps": 100})
    sched = get_lr_schedule(cfg, 100)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(100)) < 1e-3

    for name in ["constant", "constant_with_warmup", "cosine", "cosine_with_restarts", "cosine_annealing_hard_restarts", "sine", "linear"]:
        cfg = TrainingConfig({"learning_rate": 1e-3, "lr_scheduler": name, "max_train_steps": 100})
        sched = get_lr_schedule(cfg, 100)
        values = [float(sched(i)) for i in (0, 50, 99)]
        assert all(np.isfinite(values)), (name, values)

def test_optimizer_names_exported():
    names = optimizer_names()
    for expected in ("adamw", "adamw_bf16", "lion", "prodigy", "muon", "soap", "bnb-lion8bit"):
        assert expected in names

def test_noise_offset_and_input_perturbation():
    model, state, step_fn, batch = _tiny_setup(
        noise_offset=0.1, noise_offset_probability=1.0, input_perturbation=0.1
    )
    prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
    # target is the (offset) noise, input carries extra perturbation on top
    diff = prepared["noisy_latents"] - (
        (1 - prepared["sigmas"].reshape(-1, 1, 1, 1)) * batch["latents"]
        + prepared["sigmas"].reshape(-1, 1, 1, 1) * prepared["noise"]
    )
    assert float(jnp.abs(diff).max()) > 0  # perturbation visible on the input
    step = jax.jit(step_fn)
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(metrics["loss"])
def test_input_perturbation_steps_decay():
    """--input_perturbation_steps: the extra input noise decays linearly to
    zero over the first N steps and is off afterwards (reference
    common.py:5443-5448)."""
    model, state, step_fn, batch = _tiny_setup(
        input_perturbation=0.5, input_perturbation_steps=10
    )

    def input_gap(step):
        prepared = model.prepare_batch(
            jax.random.PRNGKey(0), dict(batch, global_step=jnp.asarray(step))
        )
        s = prepared["sigmas"].reshape(-1, 1, 1, 1)
        clean = (1 - s) * prepared["latents"] + s * prepared["noise"]
        return float(jnp.abs(prepared["noisy_latents"] - clean).max())

    g0, g5, g20 = input_gap(0), input_gap(5), input_gap(20)
    assert g0 > 0
    assert np.isclose(g5, g0 / 2, rtol=1e-4)  # linear: half strength at N/2
    assert g20 == 0.0  # past the window: clean interpolation exactly

def test_bitfit_trains_biases_only():
    """layer_freeze_strategy=bitfit (reference model_freeze.py:82): full
    fine-tune updates ONLY bias leaves; everything else stays frozen."""
    model, state, step_fn, batch = _tiny_setup(
        model_type="full", layer_freeze_strategy="bitfit"
    )
    before = state.trainable
    new_state, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(metrics["loss"])

    moved_bias, moved_other = 0, 0
    flat_before = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_after = jax.tree_util.tree_flatten_with_path(new_state.trainable)[0]
    for (path, a), (_, b) in zip(flat_before, flat_after):
        name = getattr(path[-1], "key", str(path[-1]))
        changed = bool(jnp.any(a != b))
        if name == "bias":
            moved_bias += changed
        else:
            moved_other += changed
    assert moved_bias > 0  # biases train
    assert moved_other == 0  # weights frozen

    with pytest.raises(ValueError, match="layer_freeze_strategy"):
        _tiny_setup(model_type="full", layer_freeze_strategy="nope")
