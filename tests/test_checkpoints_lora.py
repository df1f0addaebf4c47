import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.checkpoints import CheckpointManager
from simpletuner_tpu.training.lora import (
    flatten_lora,
    load_lora_safetensors,
    lora_state_dict,
    merge_lora_into_params,
    save_lora_safetensors,
)
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def tiny():
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            # widest preset so the export covers embedder + ff keys too
            "flux_lora_target": "all+ffs+embedder",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    return cfg, model, variables, batch

def test_lora_export_diffusers_keys(tiny, tmp_path):
    cfg, model, variables, _ = tiny
    sd = lora_state_dict(model, variables["lora"], format="diffusers")
    keys = set(sd)
    assert "transformer.transformer_blocks.0.attn.to_q.lora_A.weight" in keys
    assert "transformer.transformer_blocks.0.attn.add_q_proj.lora_B.weight" in keys
    assert "transformer.single_transformer_blocks.0.attn.to_q.lora_A.weight" in keys
    assert "transformer.single_transformer_blocks.0.proj_mlp.lora_B.weight" in keys
    assert "transformer.x_embedder.lora_A.weight" in keys
    # torch orientation: lora_A (r, in)
    a = sd["transformer.transformer_blocks.0.attn.to_q.lora_A.weight"]
    assert a.shape[0] == 4

def test_lora_export_comfyui_keys(tiny):
    cfg, model, variables, _ = tiny
    sd = lora_state_dict(model, variables["lora"], format="comfyui")
    assert "diffusion_model.transformer_blocks.0.attn.to_q.lora_down.weight" in sd
    assert "diffusion_model.transformer_blocks.0.attn.to_q.alpha" in sd

def test_lora_roundtrip_through_safetensors(tiny, tmp_path):
    cfg, model, variables, batch = tiny
    # train a couple steps so lora_B is nonzero
    schedule = get_lr_schedule(cfg, 10)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule))
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    lora = jax.device_get(state.trainable["lora"])

    path = str(tmp_path / "lora.safetensors")
    save_lora_safetensors(model, lora, path)
    assert os.path.exists(path)

    template = jax.tree_util.tree_map(np.zeros_like, lora)
    restored = load_lora_safetensors(model, path, template)

    flat_orig = flatten_lora(lora)
    flat_rest = flatten_lora(restored)
    assert set(flat_orig) == set(flat_rest)
    for key in flat_orig:
        if "linear1" in key:
            # fused layers roundtrip through shared-A reconstruction
            a_o, b_o = flat_orig[key]["lora_A"], flat_orig[key]["lora_B"]
            a_r, b_r = flat_rest[key]["lora_A"], flat_rest[key]["lora_B"]
            np.testing.assert_allclose(a_o @ b_o, a_r @ b_r, atol=1e-5)
        else:
            np.testing.assert_allclose(flat_orig[key]["lora_A"], flat_rest[key]["lora_A"], atol=1e-6)
            np.testing.assert_allclose(flat_orig[key]["lora_B"], flat_rest[key]["lora_B"], atol=1e-6)

def test_lora_merge_matches_adapter_forward(tiny):
    cfg, model, variables, batch = tiny
    # random nonzero lora
    lora = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.PRNGKey(1), p.shape, p.dtype) * 0.02,
        variables["lora"],
    )
    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    with_adapter = model.model_predict({"params": variables["params"], "lora": lora}, prepared)
    scale = float(model.lora_alpha or model.lora_rank) / model.lora_rank
    merged = merge_lora_into_params(jax.device_get(variables["params"]), jax.device_get(lora), scale=scale)
    merged = jax.tree_util.tree_map(jnp.asarray, merged)
    zero_lora = jax.tree_util.tree_map(jnp.zeros_like, lora)
    with_merged = model.model_predict({"params": merged, "lora": zero_lora}, prepared)
    np.testing.assert_allclose(
        np.asarray(with_adapter), np.asarray(with_merged), atol=5e-2, rtol=5e-2
    )

def test_checkpoint_save_restore_resume(tiny, tmp_path):
    cfg, model, variables, batch = tiny
    schedule = get_lr_schedule(cfg, 10)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule))
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))

    manager = CheckpointManager(str(tmp_path / "out"), total_limit=2)
    manager.save(3, state, extra_state={"sampler": {"epoch": 0}})
    assert manager.latest_checkpoint().endswith("checkpoint-3")

    # restore into a freshly-initialized state
    state2 = create_train_state(model, model.init_params(jax.random.PRNGKey(9), batch), tx)
    restored, extra = manager.restore(manager.latest_checkpoint(), state2)
    assert int(restored.step) == 3
    assert extra["sampler"] == {"epoch": 0}
    for a, b in zip(jax.tree_util.tree_leaves(state.trainable), jax.tree_util.tree_leaves(restored.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training continues identically from the restored state
    s_a, m_a = step(state, batch, jax.random.PRNGKey(42))
    s_b, m_b = step(restored, batch, jax.random.PRNGKey(42))
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), abs=1e-6)

def test_checkpoint_retention(tiny, tmp_path):
    cfg, model, variables, batch = tiny
    schedule = get_lr_schedule(cfg, 10)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    manager = CheckpointManager(str(tmp_path / "out"), total_limit=2)
    for step_num in (1, 2, 3):
        manager.save(step_num, state)
    names = [os.path.basename(p) for p in manager.list_checkpoints()]
    assert names == ["checkpoint-2", "checkpoint-3"]

    manager.save(4, state, rolling=True)
    manager.save(5, state, rolling=True)
    rolling = [os.path.basename(p) for p in manager.list_checkpoints(rolling=True)]
    assert rolling == ["rolling-checkpoint-5"]
    assert manager.latest_checkpoint().endswith("rolling-checkpoint-5")

def test_resolve_resume(tiny, tmp_path):
    cfg, model, variables, batch = tiny
    schedule = get_lr_schedule(cfg, 10)
    tx = get_optimizer(cfg, schedule)
    state = create_train_state(model, variables, tx)
    manager = CheckpointManager(str(tmp_path / "out"))
    assert manager.resolve_resume("latest") is None
    manager.save(7, state)
    assert manager.resolve_resume("latest").endswith("checkpoint-7")
    assert manager.resolve_resume("checkpoint-7").endswith("checkpoint-7")
    assert manager.resolve_resume(None) is None
