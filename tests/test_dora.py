"""DoRA (weight-decomposed LoRA; PEFT --use_dora, reference peft injection):
W' = m ⊙ (W+ΔW)/‖W+ΔW‖ with m init ‖W₀‖ — identity at step 0, magnitude +
direction train jointly, PEFT-layout export round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow


def _cfg(**over):
    base = {
        "model_family": "flux", "model_type": "lora", "lora_rank": 4,
        "use_dora": True, "optimizer": "adamw", "learning_rate": 1e-3,
        "max_train_steps": 5, "mixed_precision": "fp32",
    }
    base.update(over)
    return TrainingConfig(base)


def test_dora_identity_at_init_and_trains():
    cfg = _cfg()
    model = Flux(cfg, arch=FluxConfig.tiny())
    assert model.lora_algo == "dora"
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)

    # magnitude vectors exist and B=0 -> adapter output == base output
    leaves = jax.tree_util.tree_leaves_with_path(variables["lora"])
    assert any("dora_m" in str(p) for p, _ in leaves)

    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    with_adapter = model.model_predict(variables, prepared)
    base_only = model.model_predict(
        {"params": variables["params"],
         "lora": jax.tree_util.tree_map(
             lambda p, l: jnp.zeros_like(l) if l.ndim == 2 else l,
             variables["lora"], variables["lora"])},
        prepared,
    )
    # zeroing A/B (2-D leaves) but keeping m: still identity because norm
    # detaches and m == ||W0||; full check: fresh init == base behavior
    np.testing.assert_allclose(np.asarray(with_adapter), np.asarray(base_only),
                               rtol=1e-4, atol=1e-4)

    schedule = get_lr_schedule(cfg, 5)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule))
    losses = []
    m_before = jax.tree_util.tree_leaves(
        {str(p): v for p, v in leaves if "dora_m" in str(p)})
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # magnitudes moved
    after = [v for p, v in jax.tree_util.tree_leaves_with_path(state.trainable["lora"])
             if "dora_m" in str(p)]
    before = [v for p, v in leaves if "dora_m" in str(p)]
    moved = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(after, before))
    assert moved > 0, "dora_m unchanged after training"


def test_dora_export_import_roundtrip(tmp_path):
    from simpletuner_tpu.training.lora import (
        load_lora_safetensors,
        lora_state_dict,
        save_lora_safetensors,
    )

    cfg = _cfg()
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # make the adapter non-trivial before export
    lora = jax.tree_util.tree_map(
        lambda l: l + 0.01 * jnp.arange(l.size, dtype=l.dtype).reshape(l.shape),
        variables["lora"])

    tensors = lora_state_dict(model, jax.device_get(lora))
    mags = [k for k in tensors if k.endswith("lora_magnitude_vector.weight")]
    assert mags, "no magnitude vectors in the exported state dict"

    path = tmp_path / "dora.safetensors"
    save_lora_safetensors(model, jax.device_get(lora), str(path))
    loaded = load_lora_safetensors(model, str(path), jax.device_get(lora))

    flat_src = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(jax.device_get(lora))}
    flat_out = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(loaded)}
    assert set(flat_src) == set(flat_out)
    for key in flat_src:
        np.testing.assert_allclose(flat_out[key], flat_src[key], rtol=1e-5, atol=1e-6,
                                   err_msg=key)


def test_dora_with_int8_base():
    """DoRA bypasses the int8-MXU fast path (needs the dense kernel) but must
    still train on an int8-quantized frozen base."""
    cfg = _cfg(quantized_matmul="forward")
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    schedule = get_lr_schedule(cfg, 2)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx, quantize_mode="int8")
    step = jax.jit(build_train_step(model, tx, schedule))
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    from simpletuner_tpu.models.layers import set_quantized_matmul

    set_quantized_matmul("off")
