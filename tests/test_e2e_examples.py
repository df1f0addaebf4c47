"""End-to-end example runner (reference: tests/test_e2e_examples.py:20-60 —

gated by SIMPLETUNER_E2E_TEST=1, loads every example config, forces a few
steps, runs the real Trainer).

Here: every per-family generated example runs 2 real steps at tiny scale with
synthetic data.  Without the env var only a fast smoke subset runs.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.cli.examples import EXAMPLES
from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import ModelRegistry
from simpletuner_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow

E2E = os.environ.get("SIMPLETUNER_E2E_TEST") == "1"

# fast smoke subset (one per modality) unless the full e2e run is requested
SMOKE_FAMILIES = ("sd1x", "wan", "ace_step")

def _family_examples():
    names = []
    for name, meta in EXAMPLES.items():
        config = meta["config"]
        if not isinstance(config, dict) or "model_family" not in config:
            continue
        family = config["model_family"]
        if not E2E and family not in SMOKE_FAMILIES:
            continue
        names.append(name)
    return names

def _make_data(tmp_path, modality):
    root = tmp_path / "data"
    root.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    if modality == "audio":
        from scipy.io import wavfile

        for i in range(4):
            data = (rng.standard_normal(16000) * 0.1 * 32767).astype(np.int16)
            wavfile.write(str(root / f"a_{i}.wav"), 8000, data)
            (root / f"a_{i}.txt").write_text(f"song {i}")
    elif modality == "video":
        import cv2

        for i in range(4):
            writer = cv2.VideoWriter(
                str(root / f"v_{i}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 8, (64, 64)
            )
            for _ in range(10):
                writer.write(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
            writer.release()
            (root / f"v_{i}.txt").write_text(f"clip {i}")
    else:
        for i in range(4):
            Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(
                root / f"i_{i}.png"
            )
            (root / f"i_{i}.txt").write_text(f"photo {i}")
    return str(root)

@pytest.mark.parametrize("name", _family_examples())
def test_example_trains(name, tmp_path):
    example = dict(EXAMPLES[name]["config"])
    family = example["model_family"]
    modality = ModelRegistry.metadata(family).get("modality", "image")
    data_dir = _make_data(tmp_path, modality)
    cache_root = str(tmp_path / "cache")

    dataset = {
        "id": "train",
        "dataset_type": modality,
        "type": "local",
        "instance_data_dir": data_dir,
        "crop": True,
        "crop_style": "center",
        "crop_aspect": "square",
        "resolution": 32,
        "resolution_type": "pixel_area",
        "caption_strategy": "textfile",
        "cache_dir_vae": os.path.join(cache_root, "vae"),
        "text_embeds": "embeds",
        "repeats": 7,
    }
    if modality == "video":
        dataset["video"] = {"num_frames": 9}
    if modality == "audio":
        dataset["audio"] = {"max_duration": 2.0}
        dataset.pop("crop")
    example.update(
        {
            "model_arch_preset": "tiny",
            "max_train_steps": 2,
            "train_batch_size": 1,
            "checkpointing_steps": None,
            "validation_prompt": None,
            "validation_steps": None,
            "resolution": 32,
            "report_to": "none",
            "cache_dir": cache_root,
            "output_dir": str(tmp_path / "out"),
            "data_backend_config": [
                dataset,
                {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
                 "default": True, "cache_dir": os.path.join(cache_root, "text")},
            ],
            "push_to_hub": False,
            "pretrained_model_name_or_path": None,
            "pretrained_transformer_path": None,
        }
    )
    trainer = Trainer(config=TrainingConfig(example))
    trainer.run()
    assert trainer.global_step == 2