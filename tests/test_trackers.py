"""Tracker construction: jsonl default, tensorboard, custom drop-in modules."""

import json
import os

import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.training.trackers import build_trackers


def _cfg(**extra):
    return TrainingConfig(
        {"model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
         "max_train_steps": 10, **extra}
    )


def test_jsonl_always_present(tmp_path):
    trackers = build_trackers(_cfg(report_to="none"), str(tmp_path))
    assert len(trackers) == 1 and trackers[0].name == "jsonl"
    trackers[0].log({"loss": 1.0}, step=1)
    trackers[0].finish()
    records = [json.loads(l) for l in open(trackers[0].path)]
    assert records[0]["loss"] == 1.0


def test_tensorboard(tmp_path):
    trackers = build_trackers(_cfg(report_to="tensorboard"), str(tmp_path))
    names = {t.name for t in trackers}
    assert "tensorboard" in names
    for t in trackers:
        t.log({"loss": 0.5}, 1)
        t.finish()


def test_custom_dropin(tmp_path):
    module = tmp_path / "mytracker.py"
    module.write_text(
        "class Tracker:\n"
        "    name = 'custom'\n"
        "    def __init__(self, config, output_dir):\n"
        "        self.records = []\n"
        "    def log(self, metrics, step):\n"
        "        self.records.append((step, dict(metrics)))\n"
        "    def log_images(self, images, captions, step):\n"
        "        pass\n"
        "    def finish(self):\n"
        "        pass\n"
    )
    trackers = build_trackers(_cfg(report_to=str(module)), str(tmp_path))
    custom = [t for t in trackers if getattr(t, "name", "") == "custom"]
    assert custom
    custom[0].log({"loss": 2.0}, 3)
    assert custom[0].records == [(3, {"loss": 2.0})]
