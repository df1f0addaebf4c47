"""LyCORIS LoHa + (IA)³ adapters (VERDICT r2 Next #10): zero-init identity,
training step, LyCORIS-layout export + load round trip, preset table.
Reference: lycoris-lora LohaModule / IA3Module via lycoris_config.algo
(simpletuner/lycoris_defaults.py:5)."""

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


def make_model(algo, **extra):
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_type": "lycoris",
            "lycoris_config": {"algo": algo},
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-2,
            "max_train_steps": 10,
            **extra,
        }
    )
    return Flux(cfg, arch=FluxConfig.tiny())


@pytest.fixture(scope="module", params=["loha", "ia3"])
def setup(request):
    algo = request.param
    model = make_model(algo)
    assert model.lora_algo == algo
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    assert "lora" in variables
    return algo, model, batch, variables


def test_adapter_params_exist(setup):
    algo, model, batch, variables = setup
    leaves = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(variables["lora"])[0]
    }
    if algo == "loha":
        assert any("loha_w1_a" in k for k in leaves)
        assert any("loha_w2_b" in k for k in leaves)
    else:
        assert any("ia3_scale" in k for k in leaves)
        assert not any("lora_A" in k for k in leaves)


def test_zero_init_identity(setup):
    """Fresh adapters must not change the base prediction (LoHa: w2_b=0;
    (IA)³: scale vector of ones)."""
    algo, model, batch, variables = setup
    prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
    with_adapter = model.model_predict(variables, prepared)
    zeroed = dict(variables)
    if algo == "loha":
        # doubly sure: identical by exact construction, not approximately
        pass
    base_cfg = TrainingConfig(
        {"model_family": "flux", "model_type": "full", "optimizer": "adamw",
         "learning_rate": 1e-2, "max_train_steps": 10}
    )
    base_model = Flux(base_cfg, arch=FluxConfig.tiny())
    base_out = base_model.model_predict({"params": variables["params"]}, prepared)
    np.testing.assert_allclose(
        np.asarray(with_adapter), np.asarray(base_out), atol=2e-5
    )


def test_train_step_moves_adapter(setup):
    algo, model, batch, variables = setup
    variables = jax.tree_util.tree_map(jnp.array, variables)
    schedule = get_lr_schedule(model.config, 10)
    tx = get_optimizer(model.config, schedule)
    state = create_train_state(model, variables, tx)
    step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
    flat_before = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(state.trainable["lora"])[0]
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    flat_after = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(state.trainable["lora"])[0]
    }
    moved = [k for k in flat_before if not np.array_equal(flat_before[k], flat_after[k])]
    assert moved, "no adapter parameter changed after one step"


def test_export_load_round_trip(setup, tmp_path):
    algo, model, batch, variables = setup
    from simpletuner_tpu.training.lora import (
        load_lora_safetensors,
        lora_state_dict,
        save_lora_safetensors,
    )

    lora = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), variables["lora"])
    # perturb so the round trip carries real signal, not zeros
    lora = jax.tree_util.tree_map(
        lambda v: v + np.random.default_rng(0).normal(0, 0.01, v.shape).astype(np.float32),
        lora,
    )
    tensors = lora_state_dict(model, lora)
    if algo == "loha":
        assert any(k.endswith(".hada_w1_a") for k in tensors)
        assert any(k.endswith(".alpha") for k in tensors)
    else:
        assert any(k.endswith(".w") for k in tensors)

    path = str(tmp_path / f"{algo}.safetensors")
    save_lora_safetensors(model, lora, path)
    template = jax.tree_util.tree_map(np.zeros_like, lora)
    loaded = load_lora_safetensors(model, path, template)
    flat_a = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(lora)[0]}
    flat_b = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    assert set(flat_a) == set(flat_b)
    for key in flat_a:
        np.testing.assert_allclose(flat_a[key], flat_b[key], atol=1e-6, err_msg=key)


def test_preset_table_covers_implemented_algos():
    from simpletuner_tpu.cli.configure_tui import LYCORIS_ALGORITHMS

    for algo in ("lora", "lokr", "loha", "ia3", "tlora"):
        assert algo in LYCORIS_ALGORITHMS, algo
    # presets that reach training must resolve through lora_algo
    for algo in ("lokr", "loha", "ia3", "tlora"):
        model = make_model(algo)
        assert model.lora_algo == algo


def test_unknown_algo_still_raises():
    model = make_model("boft")
    with pytest.raises(NotImplementedError):
        _ = model.lora_algo
