"""TREAD router unit tests + routed Flux forward/backward."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.tread import TREADRouter

import pytest

pytestmark = pytest.mark.slow

class TestRouter:
    def test_static_keep_size(self):
        tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
        router = TREADRouter(0.5)
        keep_idx, _ = router.plan(tokens, jax.random.PRNGKey(1))
        assert keep_idx.shape == (2, 8)
        routed = TREADRouter.select(tokens, keep_idx)
        assert routed.shape == (2, 8, 8)

    def test_force_keep_wins(self):
        tokens = jnp.zeros((1, 16, 8))
        force = jnp.zeros((1, 16), bool).at[0, 3].set(True).at[0, 7].set(True)
        router = TREADRouter(0.25, force_keep=force)
        keep_idx, _ = router.plan(tokens)
        kept = set(np.asarray(keep_idx)[0].tolist())
        assert {3, 7} <= kept

    def test_restore_scatters_back(self):
        tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 4))
        router = TREADRouter(0.5)
        keep_idx, _ = router.plan(tokens)
        routed = TREADRouter.select(tokens, keep_idx) * 2.0
        restored = TREADRouter.restore(tokens, routed, keep_idx)
        arr, idx = np.asarray(tokens), np.asarray(keep_idx)
        out = np.asarray(restored)
        for b in range(2):
            kept = set(idx[b].tolist())
            for s in range(10):
                expected = arr[b, s] * 2.0 if s in kept else arr[b, s]
                np.testing.assert_allclose(out[b, s], expected, rtol=1e-6)

    def test_selection_order_preserved(self):
        tokens = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 4))
        keep_idx, _ = TREADRouter(0.5).plan(tokens)
        idx = np.asarray(keep_idx)[0]
        assert np.all(np.diff(idx) > 0)

class TestFluxTREAD:
    def _model(self):
        cfg = TrainingConfig(
            {
                "model_family": "flux",
                "model_type": "lora",
                "lora_rank": 4,
                "optimizer": "adamw",
                "learning_rate": 1e-3,
                "max_train_steps": 10,
                "tread_config": {"routes": [{"selection_ratio": 0.5, "start_layer": 0, "end_layer": 0}]},
            }
        )
        return Flux(cfg, arch=FluxConfig.tiny())

    def test_routed_train_forward_and_grads(self):
        model = self._model()
        batch = model.example_batch(batch_size=2, resolution=32)
        from test_train_step import _open_adaln_gates

        variables = _open_adaln_gates(model.init_params(jax.random.PRNGKey(0), batch))

        def loss(lora):
            merged = {**variables, "lora": lora}
            value, _ = model.loss_fn(merged, jax.random.PRNGKey(1), batch)
            return value

        value, grads = jax.jit(jax.value_and_grad(loss))(variables["lora"])
        assert np.isfinite(float(value))
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
        assert any(n > 0 for n in norms)

    def test_inference_path_skips_tread(self):
        model = self._model()
        batch = model.example_batch(batch_size=1, resolution=32)
        variables = model.init_params(jax.random.PRNGKey(0), batch)
        cond = model.inference_conditioning(batch)
        fn = model.denoise_fn(variables, cond)
        out = jax.jit(fn)(batch["latents"], jnp.asarray(0.5))
        assert out.shape == batch["latents"].shape