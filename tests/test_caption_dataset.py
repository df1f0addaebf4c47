"""Caption-only datasets for on-policy distillers (reference:

helpers/data_backend/caption_{dataset,sampler}.py + metadata/backends/caption.py)."""

import os

import jax
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.data.factory import configure_multi_databackend
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig

pytestmark = pytest.mark.slow

@pytest.fixture()
def caption_plane(tmp_path):
    root = tmp_path / "captions"
    root.mkdir()
    for i in range(6):
        (root / f"c_{i}.txt").write_text(f"a painting of thing {i}")
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-4,
            "max_train_steps": 4,
            "train_batch_size": 2,
            "resolution": 0.004096,  # 64x64 pixels -> 8x8 latents
            "cache_dir": str(tmp_path / "cache"),
            "distillation_method": "self_forcing",
            "data_backend_config": [
                {"id": "prompts", "dataset_type": "caption", "type": "local",
                 "instance_data_dir": str(root), "caption_strategy": "textfile",
                 "repeats": 3},
                {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
                 "default": True, "cache_dir": str(tmp_path / "cache" / "text")},
            ],
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())

    class FakeEncoder:
        def encode(self, prompts):
            rng = np.random.default_rng(0)
            return {
                "last_hidden_state": rng.standard_normal((len(prompts), 16, model.arch.txt_in_features)).astype(np.float32),
                "pooled": rng.standard_normal((len(prompts), model.arch.vec_in_features)).astype(np.float32),
                "attention_mask": np.ones((len(prompts), 16), np.int64),
            }

    model.attach_text_encoders([FakeEncoder(), FakeEncoder()])
    plane = configure_multi_databackend(model.config, model)
    return model, plane

def test_caption_batches(caption_plane):
    model, plane = caption_plane
    batch = plane.iterator.next_batch()
    assert batch["caption_only"] == 1.0
    assert batch["latents"].shape == (2, 8, 8, model.arch.in_channels // 4)
    assert np.all(batch["latents"] == 0)
    assert batch["t5_embeds"].shape[0] == 2
    assert all(c.startswith("a painting") for c in batch["captions"])

def test_self_forcing_trains_from_caption_batch(caption_plane):
    import jax.numpy as jnp

    from simpletuner_tpu.distillation import init_distillation
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    model, plane = caption_plane
    raw = plane.iterator.next_batch()
    batch = {k: jnp.asarray(v) for k, v in raw.items() if isinstance(v, np.ndarray)}
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    schedule = get_lr_schedule(model.config, 4)
    tx = get_optimizer(model.config, schedule)
    distiller = init_distillation(model.config)
    critic = jax.tree_util.tree_map(jnp.array, variables["lora"])
    state = create_train_state(model, variables, tx, critic_params=critic)
    step = jax.jit(build_train_step(model, tx, schedule, distiller=distiller))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "self_forcing_generator_loss" in metrics