"""CheckpointInferenceRuntime: load a training checkpoint once, render many
prompts (reference simpletuner/inference.py:53)."""

import json
import os

import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow


def _train_tiny_checkpoint(tmp_path):
    from PIL import Image

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            data_dir / f"img_{i}.png"
        )
        (data_dir / f"img_{i}.txt").write_text(f"photo {i}")
    cache = tmp_path / "cache"
    out = tmp_path / "out"
    config = {
        "model_family": "sd1x",
        "model_type": "lora",
        "model_arch_preset": "tiny",
        "lora_rank": 4,
        "optimizer": "adamw",
        "learning_rate": 1e-3,
        "max_train_steps": 1,
        "train_batch_size": 1,
        "resolution": 32,
        "checkpointing_steps": 1,
        "report_to": "none",
        "cache_dir": str(cache),
        "output_dir": str(out),
        "seed": 3,
        "data_backend_config": [
            {"id": "train", "dataset_type": "image", "type": "local",
             "instance_data_dir": str(data_dir), "crop": True, "crop_style": "center",
             "crop_aspect": "square", "resolution": 32, "resolution_type": "pixel_area",
             "caption_strategy": "textfile", "cache_dir_vae": str(cache / "vae"),
             "text_embeds": "embeds", "repeats": 7},
            {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
             "default": True, "cache_dir": str(cache / "text")},
        ],
    }
    trainer = Trainer(config=TrainingConfig(dict(config)))
    trainer.run()
    checkpoints = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert checkpoints
    config_path = tmp_path / "config.json"
    config_path.write_text(json.dumps(config))
    return str(out / sorted(checkpoints)[-1]), str(config_path)


def test_runtime_renders_multiple_prompts(tmp_path):
    from simpletuner_tpu.inference import CheckpointInferenceRuntime

    checkpoint, config_path = _train_tiny_checkpoint(tmp_path)
    runtime = CheckpointInferenceRuntime(
        checkpoint,
        config_path=config_path,
        output=str(tmp_path / "renders"),
        config_overrides={"validation_resolution": 32, "validation_num_inference_steps": 2},
    )
    first = runtime.render("a red cat", steps=2)
    assert first and os.path.exists(first[0])
    first_bytes = open(first[0], "rb").read()
    # second prompt re-encodes without reloading the checkpoint; a different
    # prompt + seed must change the rendered pixels
    second = runtime.render("a blue dog", steps=2, seed=9)
    assert second and os.path.exists(second[0])
    assert open(second[0], "rb").read() != first_bytes
