"""SD1x / SD2x / SDXL UNet family tests: shape contracts, LoRA collections,

train-step smoke, prediction-type targets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.models.sd1x.model import SD1x, SD2x
from simpletuner_tpu.models.sdxl.model import SDXL
from simpletuner_tpu.models.unet import UNetConfig
from simpletuner_tpu.training.optimizers import get_optimizer
from simpletuner_tpu.training.schedules import get_lr_schedule
from simpletuner_tpu.training.train_state import build_train_step, create_train_state

pytestmark = pytest.mark.slow

def make_cfg(family, **extra):
    return TrainingConfig(
        {
            "model_family": family,
            "model_type": "lora",
            "model_arch_preset": "tiny",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
            **extra,
        }
    )

@pytest.fixture(scope="module")
def sd1x_setup():
    model = SD1x(make_cfg("sd1x"))
    batch = model.example_batch(batch_size=2, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, variables

@pytest.fixture(scope="module")
def sdxl_setup():
    model = SDXL(make_cfg("sdxl"))
    batch = model.example_batch(batch_size=2, resolution=64)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, variables

class TestSD1x:
    def test_registry(self):
        assert ModelRegistry.get("sd1x") is SD1x
        assert ModelRegistry.get("sd15") is SD1x
        assert ModelRegistry.get("sd2x") is SD2x

    def test_forward_shape(self, sd1x_setup):
        model, batch, variables = sd1x_setup
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
        assert pred.shape == batch["latents"].shape

    def test_lora_collection_exists(self, sd1x_setup):
        _, _, variables = sd1x_setup
        assert "lora" in variables
        leaves = jax.tree_util.tree_leaves(variables["lora"])
        assert all(l.shape[-1] == 4 or l.shape[0] == 4 for l in leaves)

    def test_epsilon_target(self, sd1x_setup):
        model, batch, _ = sd1x_setup
        prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
        np.testing.assert_array_equal(
            np.asarray(prepared["target"]), np.asarray(prepared["noise"])
        )

    def test_train_step(self, sd1x_setup):
        model, batch, variables = sd1x_setup
        cfg = model.config
        schedule = get_lr_schedule(cfg, 10)
        tx = get_optimizer(cfg, schedule)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

class TestSD2x:
    def test_v_prediction_target(self):
        model = SD2x(make_cfg("sd2x"))
        # tiny arch but 2.x prediction type
        batch = model.example_batch(batch_size=2, resolution=64)
        prepared = model.prepare_batch(jax.random.PRNGKey(0), batch)
        # v = sqrt(a)*eps - sqrt(1-a)*x0 — differs from plain noise
        assert not np.allclose(np.asarray(prepared["target"]), np.asarray(prepared["noise"]))

class TestSDXL:
    def test_forward_shape(self, sdxl_setup):
        model, batch, variables = sdxl_setup
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = jax.jit(lambda v, p: model.model_predict(v, p))(variables, prepared)
        assert pred.shape == batch["latents"].shape

    def test_time_ids_from_collate_metadata(self, sdxl_setup):
        model, batch, variables = sdxl_setup
        b = dict(batch)
        del b["time_ids"]
        b["original_sizes"] = jnp.asarray([[96, 96], [128, 96]], jnp.int32)
        b["crop_coordinates"] = jnp.asarray([[0, 0], [16, 0]], jnp.int32)
        b["target_sizes"] = jnp.asarray([[64, 64], [64, 64]], jnp.int32)
        prepared = model.prepare_batch(jax.random.PRNGKey(1), b)
        ids = model._time_ids(prepared, 2)
        np.testing.assert_array_equal(
            np.asarray(ids), [[96, 96, 0, 0, 64, 64], [128, 96, 16, 0, 64, 64]]
        )

    def test_train_step(self, sdxl_setup):
        model, batch, variables = sdxl_setup
        cfg = model.config
        schedule = get_lr_schedule(cfg, 10)
        tx = get_optimizer(cfg, schedule)
        state = create_train_state(model, variables, tx)
        step = jax.jit(build_train_step(model, tx, schedule), donate_argnums=(0,))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    def test_text_encoding_tiny(self):
        from simpletuner_tpu.models.text_encoders import load_text_encoders

        model = SDXL(make_cfg("sdxl"))
        model.attach_text_encoders(
            load_text_encoders(model.TEXT_ENCODER_CONFIGURATION, tiny=True)
        )
        embeds = model.encode_text(["a cat", "a dog"])
        assert embeds[0]["text_embeds"].shape == (77, 96)
        assert embeds[0]["pooled_embeds"].shape == (64,)
        collated = model.collate_text_embeds(embeds)
        assert collated["text_embeds"].shape == (2, 77, 96)

class TestFullArchShapes:
    """Full-size configs build (init only at trivial spatial dims to stay fast)."""

    @pytest.mark.parametrize("arch_name", ["sd15", "sd21", "sdxl"])
    def test_param_count_plausible(self, arch_name):
        arch = getattr(UNetConfig, arch_name)()
        assert arch.block_out_channels[0] == 320
        if arch_name == "sdxl":
            assert arch.cross_attention_dim == 2048
            assert arch.transformer_layers == (1, 2, 10)