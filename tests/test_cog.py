"""Cog/Replicate packaging runner (reference simpletuner/cog.py + predict.py):
archive staging, dataset-config materialization, subprocess training, output
packaging."""

import io
import json
import os
import tarfile
import zipfile

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.cog import CogRunner

pytestmark = pytest.mark.slow


def _make_archive(path, n=4):
    rng = np.random.default_rng(0)
    with zipfile.ZipFile(path, "w") as zf:
        for i in range(n):
            img = Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            zf.writestr(f"photos/img_{i}.png", buf.getvalue())
            zf.writestr(f"photos/img_{i}.txt", f"a photo {i}")


def test_stage_archive_flattens_single_dir(tmp_path):
    archive = tmp_path / "data.zip"
    _make_archive(archive)
    runner = CogRunner(str(tmp_path / "work"))
    dataset = runner.stage_archive(str(archive))
    names = sorted(p.name for p in dataset.iterdir())
    assert "img_0.png" in names and "img_0.txt" in names  # photos/ flattened


def test_unsupported_archive_rejected(tmp_path):
    bad = tmp_path / "data.rar"
    bad.write_bytes(b"not an archive")
    runner = CogRunner(str(tmp_path / "work"))
    with pytest.raises(ValueError, match="unsupported archive"):
        runner.stage_archive(str(bad))


def test_end_to_end_train_and_package(tmp_path):
    archive = tmp_path / "data.zip"
    # 16 images: the conftest's 8-device CPU mesh needs a global batch of 8
    _make_archive(archive, n=16)
    runner = CogRunner(str(tmp_path / "work"))
    logs = []
    config = {
        "model_family": "flux", "model_type": "lora", "model_arch_preset": "tiny",
        "lora_rank": 4, "optimizer": "adamw", "learning_rate": 1e-3,
        "max_train_steps": 2, "train_batch_size": 1, "resolution": 64,
        "resolution_type": "pixel_area", "seed": 7, "disable_benchmark": True,
        "cache_dir": str(tmp_path / "cache"),
    }
    output_dir = runner.train(config, data_archive=str(archive), log_fn=logs.append)
    assert any("lifecycle: train (completed)" in line for line in logs)
    archive_out = runner.package(output_dir)
    with tarfile.open(archive_out) as tar:
        members = tar.getnames()
    assert any("checkpoint-" in m for m in members)
    # metrics jsonl rode along in the packaged outputs
    assert any(m.endswith("simpletuner-tpu-metrics.jsonl") for m in members)
