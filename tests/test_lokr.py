"""LyCORIS LoKr adapter: factorization, zero-init identity, training step,

export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.models.layers import lokr_factorize
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make_model(**extra):
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_type": "lycoris",
            "lycoris_config": {"algo": "lokr"},
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            **extra,
        }
    )
    return Flux(cfg, arch=FluxConfig.tiny())

class TestFactorize:
    def test_balanced(self):
        assert lokr_factorize(64) == (8, 8)
        assert lokr_factorize(12) == (3, 4)
        assert lokr_factorize(7) == (1, 7)

    def test_explicit_factor(self):
        assert lokr_factorize(64, factor=4) == (4, 16)

    def test_product(self):
        for n in (16, 48, 96, 3072):
            m, k = lokr_factorize(n)
            assert m * k == n and m <= k

class TestLoKrTraining:
    @pytest.fixture(scope="class")
    def setup(self):
        model = make_model()
        batch = model.example_batch(batch_size=2, resolution=32)
        from test_train_step import _open_adaln_gates

        variables = _open_adaln_gates(model.init_params(jax.random.PRNGKey(0), batch))
        return model, batch, variables

    def test_lokr_params_created(self, setup):
        model, _, variables = setup
        flat = jax.tree_util.tree_flatten_with_path(variables["lora"])[0]
        names = {jax.tree_util.keystr(p) for p, _ in flat}
        assert any("lokr_w1" in n for n in names)
        assert not any("lora_A" in n for n in names)

    def test_zero_init_identity(self, setup):
        """w2 = 0 at init: adapter output == base output."""
        model, batch, variables = setup
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        with_lokr = model.model_predict(variables, prepared)
        base = make_model()
        base_model_plain = Flux(
            TrainingConfig(
                {"model_family": "flux", "model_type": "full", "optimizer": "adamw",
                 "learning_rate": 1e-3, "max_train_steps": 10}
            ),
            arch=FluxConfig.tiny(),
        )
        plain = base_model_plain.module.apply(
            {"params": variables["params"]}, **base_model_plain.get_model_inputs(prepared)
        )
        from simpletuner_tpu.models.flux.transformer import unpack_latents

        h, w = prepared["noisy_latents"].shape[1:3]
        np.testing.assert_allclose(
            np.asarray(with_lokr), np.asarray(unpack_latents(plain, h, w)), atol=1e-5
        )

    def test_train_step_moves_lokr(self, setup):
        model, batch, variables = setup
        schedule = get_lr_schedule(model.config, 10)
        tx = get_optimizer(model.config, schedule)
        state = create_train_state(model, variables, tx)
        # no donation: the module-scoped fixture still references these buffers
        step = jax.jit(build_train_step(model, tx, schedule))
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
        leaves = jax.tree_util.tree_flatten_with_path(state.trainable["lora"])[0]
        w2_moved = any(
            "lokr_w2" in jax.tree_util.keystr(p) and bool(jnp.any(v != 0)) for p, v in leaves
        )
        assert w2_moved

    def test_export_lycoris_layout(self, setup, tmp_path):
        from safetensors import safe_open

        from simpletuner_tpu.training.lora import save_lora_safetensors

        model, _, variables = setup
        path = str(tmp_path / "lokr.safetensors")
        save_lora_safetensors(model, jax.device_get(variables["lora"]), path)
        with safe_open(path, framework="np") as handle:
            keys = list(handle.keys())
        assert any(k.startswith("lycoris_") and k.endswith(".lokr_w1") for k in keys)
        assert any(k.endswith(".alpha") for k in keys)