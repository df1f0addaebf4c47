"""Preemption-aware checkpointing (VERDICT r2 Next #7).

TPU preemption/maintenance events deliver SIGTERM; the trainer must write a
synchronous checkpoint at the interrupted step, emit a device_fault webhook,
and exit 0 — resumable through the existing manifest path.  Reference intent:
GPU circuit breaker (helpers/training/gpu_circuit_breaker.py), SURVEY.md §5.3
"pod-level preemption handling".
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.training.trainer import Trainer

values = json.load(open(sys.argv[1]))

# capture webhook events to a file (the raw backend posts to a URL; tests
# observe the event stream instead)
from simpletuner_tpu.webhooks.handler import WebhookHandler
events_path = os.path.join(values["output_dir"], "events.jsonl")
original_send = WebhookHandler.send_raw
def capture(self, event):
    os.makedirs(values["output_dir"], exist_ok=True)
    with open(events_path, "a") as fh:
        fh.write(json.dumps(event) + "\\n")
WebhookHandler.send_raw = capture

trainer = Trainer(config=TrainingConfig(values))

# slow the loop so the test's SIGTERM lands mid-train deterministically
original = Trainer._run_step
def slow_step(self, batch, rng):
    import time
    out = original(self, batch, rng)
    if self.global_step >= 1:
        open(os.path.join(self.output_dir, "step1.marker"), "w").write("x")
        time.sleep(0.5)
    return out
Trainer._run_step = slow_step
trainer.run()
print("CLEAN_EXIT", trainer.global_step)
"""


def _make_dataset(root):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(
            os.path.join(root, f"img_{i}.png")
        )
        with open(os.path.join(root, f"img_{i}.txt"), "w") as fh:
            fh.write(f"photo {i}")


def test_sigterm_mid_train_checkpoints_and_exits_zero(tmp_path):
    img_dir = str(tmp_path / "images")
    _make_dataset(img_dir)
    out_dir = str(tmp_path / "out")
    cache = str(tmp_path / "cache")
    config = {
        "model_family": "flux", "model_type": "lora", "model_arch_preset": "tiny",
        "lora_rank": 4, "train_batch_size": 1, "resolution": 64,
        "resolution_type": "pixel_area", "max_train_steps": 200,
        "cache_dir": cache, "output_dir": out_dir, "optimizer": "adamw",
        "learning_rate": 1e-3, "seed": 7, "report_to": "none",
        "data_backend_config": [
            {"id": "images", "type": "local", "instance_data_dir": img_dir,
             "crop": True, "crop_style": "center", "crop_aspect": "square",
             "resolution": 64, "resolution_type": "pixel_area",
             "caption_strategy": "textfile",
             "cache_dir_vae": os.path.join(cache, "vae"),
             "text_embeds": "embeds", "repeats": 30},
            {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
             "default": True, "cache_dir": os.path.join(cache, "text")},
        ],
    }
    config_path = str(tmp_path / "cfg.json")
    json.dump(config, open(config_path, "w"))
    worker = str(tmp_path / "worker.py")
    open(worker, "w").write(WORKER.format(repo=REPO))

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.Popen(
        [sys.executable, "-u", worker, config_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    marker = os.path.join(out_dir, "step1.marker")
    deadline = time.time() + 600
    while not os.path.exists(marker):
        if proc.poll() is not None:
            out, _ = proc.communicate()
            raise AssertionError(f"worker died before step 1:\n{out[-3000:]}")
        if time.time() > deadline:
            proc.kill()
            raise AssertionError("worker never reached step 1")
        time.sleep(0.2)

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, f"non-zero exit after SIGTERM:\n{out[-3000:]}"
    assert "CLEAN_EXIT" in out
    assert "preemption checkpoint complete" in out

    # a guarded checkpoint exists at the interrupted step
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts, "no preemption checkpoint written"
    for name in ckpts:
        assert os.path.exists(os.path.join(out_dir, name, ".checkpoint_complete"))

    # device_fault webhook with the preemption detail was emitted
    events = [json.loads(line) for line in open(os.path.join(out_dir, "events.jsonl"))]
    faults = [e for e in events if "fault" in str(e.get("event_type", ""))]
    assert any(
        (e.get("details") or {}).get("kind") == "preemption" for e in faults
    ), f"no preemption fault event; got types {[e.get('event_type') for e in events]}"
