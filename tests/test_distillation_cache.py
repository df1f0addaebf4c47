"""Distillation teacher-output cache: artifact store round-robin, ODE-pair
generation, and cached-pair training (reference helpers/caching/distillation.py
+ perflow/generator.py + perflow/distiller.py:229)."""

import os

import numpy as np
import pytest

from simpletuner_tpu.caching.distillation import DistillationCache, generate_ode_pairs
from simpletuner_tpu.data.backends.local import LocalDataBackend

pytestmark = pytest.mark.slow


def test_cache_write_and_round_robin(tmp_path):
    backend = LocalDataBackend(id="dc")
    cache = DistillationCache(
        id="dc", data_backend=backend, cache_dir=str(tmp_path), distillation_type="perflow"
    )
    assert not cache.has_cached_pairs()
    for i in range(3):
        cache.write_pair(
            {"latents": np.full((4, 4, 2), float(i), np.float32),
             "noise": np.zeros((4, 4, 2), np.float32)},
            metadata={"index": i},
        )
    assert len(cache) == 3
    seen = []
    for _ in range(6):  # two full cycles
        payload, path = cache.load_next_pair()
        assert payload is not None
        assert payload["metadata"]["distillation_type"] == "perflow"
        seen.append(float(np.asarray(payload["latents"]).ravel()[0]))
    assert seen == [0.0, 1.0, 2.0, 0.0, 1.0, 2.0]

    # a fresh instance discovers artifacts from disk
    cache2 = DistillationCache(id="dc", data_backend=backend, cache_dir=str(tmp_path))
    assert cache2.has_cached_pairs() and len(cache2) == 3
    batch = cache2.next_batch(2)
    assert batch["latents"].shape == (2, 4, 4, 2)


def _tiny_flux():
    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig

    cfg = TrainingConfig(
        {
            "model_family": "flux", "model_type": "lora", "lora_rank": 4,
            "optimizer": "adamw", "learning_rate": 1e-3, "max_train_steps": 4,
            "distillation_method": "perflow",
        }
    )
    return Flux(cfg, arch=FluxConfig.tiny())


def test_generate_ode_pairs_and_cached_training_step(tmp_path):
    import jax
    import jax.numpy as jnp

    model = _tiny_flux()
    batch = model.example_batch(batch_size=2, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)

    backend = LocalDataBackend(id="dc")
    cache = DistillationCache(
        id="dc", data_backend=backend, cache_dir=str(tmp_path), distillation_type="perflow"
    )
    host_batch = {k: np.asarray(v) for k, v in batch.items() if hasattr(v, "shape")}
    written = generate_ode_pairs(model, variables, cache, [host_batch], num_steps=4, seed=0)
    assert written == 2
    payload, _ = cache.load_next_pair()
    # the teacher solve must actually move away from the initial noise
    assert not np.allclose(payload["latents"], payload["noise"], atol=1e-3)
    assert payload["metadata"]["num_steps"] == 4

    # cached-pair training: inject the pair, PerFlow takes the analytic
    # ReFlow branch (no teacher forward)
    from simpletuner_tpu.distillation import init_distillation

    distiller = init_distillation(model.config)
    assert distiller.uses_ode_cache()
    pairs = cache.next_batch(2)
    train_batch = dict(batch)
    train_batch["latents"] = jnp.asarray(pairs["latents"])
    train_batch["override_noise"] = jnp.asarray(pairs["noise"])
    train_batch["ode_pair"] = jnp.asarray(1.0)
    prepared = model.prepare_batch(jax.random.PRNGKey(1), train_batch)
    pred = model.model_predict(variables, prepared)
    loss, logs = distiller.distill_loss(model, variables, prepared, pred, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert "perflow_reflow_loss" in logs


def test_trainer_generates_and_consumes_cache(tmp_path):
    """End-to-end: perflow + distillation_cache dataset -> trainer generates
    pairs at init, trains on them, and a resumed run reuses the artifacts."""
    from PIL import Image

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(
            data_dir / f"i_{i}.png"
        )
        (data_dir / f"i_{i}.txt").write_text(f"photo {i}")
    cache_root = str(tmp_path / "cache")
    ode_dir = str(tmp_path / "ode_pairs")
    config = {
        "model_family": "flux", "model_type": "lora", "lora_rank": 4,
        "model_arch_preset": "tiny", "optimizer": "adamw", "learning_rate": 1e-4,
        "max_train_steps": 2, "train_batch_size": 1, "resolution": 32,
        "report_to": "none", "cache_dir": cache_root,
        "output_dir": str(tmp_path / "out"), "push_to_hub": False,
        "checkpointing_steps": None, "validation_prompt": None,
        "validation_steps": None, "seed": 42,
        "distillation_method": "perflow",
        "distillation_cache_num_pairs": 2,
        "distillation_cache_ode_steps": 2,
        "data_backend_config": [
            {"id": "train", "dataset_type": "image", "type": "local",
             "instance_data_dir": str(data_dir), "crop": True,
             "crop_style": "center", "crop_aspect": "square", "resolution": 32,
             "resolution_type": "pixel_area", "caption_strategy": "textfile",
             "cache_dir_vae": os.path.join(cache_root, "vae"),
             "text_embeds": "embeds", "repeats": 7},
            {"id": "ode", "dataset_type": "distillation_cache", "type": "local",
             "cache_dir": ode_dir, "distillation_type": "perflow"},
            {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
             "default": True, "cache_dir": os.path.join(cache_root, "text")},
        ],
    }
    from simpletuner_tpu.training.trainer import run_trainer_job

    trainer = run_trainer_job(config)
    assert trainer.global_step == 2
    artifacts = [f for f in os.listdir(ode_dir) if f.endswith(".pt")]
    assert len(artifacts) == 2
    metrics_path = os.path.join(str(tmp_path / "out"), "simpletuner-tpu-metrics.jsonl")
    with open(metrics_path) as fh:
        lines = [line for line in fh if "loss" in line]
    assert lines
