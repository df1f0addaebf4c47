"""Auxiliary platform route tests: hardware/version/system, checkpoint
inventory, prompt libraries, LyCORIS presets, dataset viewer, webhook
test-fire, inference job submission (reference simpletuner_sdk route modules
hardware.py, version.py, checkpoints.py, prompt_libraries.py,
dataset_viewer.py, webhooks.py, lycoris.py)."""

import http.client
import json
import os
import threading

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.server.app import create_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    state = tmp_path_factory.mktemp("state")
    srv = create_server("127.0.0.1", 0, state_dir=str(state))
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, port
    srv.shutdown()


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    payload = json.dumps(body) if body is not None else None
    headers = {"Content-Type": "application/json"} if payload else {}
    conn.request(method, path, body=payload, headers=headers)
    response = conn.getresponse()
    data = json.loads(response.read() or b"null")
    conn.close()
    return response.status, data


def test_version(server):
    _, port = server
    status, data = _request(port, "GET", "/api/version")
    assert status == 200
    assert data["simpletuner_tpu"]
    assert data["jax"]


def test_hardware(server):
    _, port = server
    status, data = _request(port, "GET", "/api/hardware")
    assert status == 200
    assert data["host"]["cpu_count"] >= 1
    assert data["host"]["disk"]["free_bytes"] > 0
    assert isinstance(data["accelerators"], list) and data["accelerators"]
    assert data["accelerators"][0]["platform"]


def test_system(server):
    _, port = server
    status, data = _request(port, "GET", "/api/system")
    assert status == 200
    assert data["uptime_seconds"] >= 0
    assert data["version"]["simpletuner_tpu"]


def test_checkpoint_inventory(server, tmp_path):
    _, port = server
    out = tmp_path / "run"
    ck = out / "checkpoint-100"
    ck.mkdir(parents=True)
    (ck / ".checkpoint_complete").write_text("")
    (ck / "manifest.json").write_text(json.dumps({"global_step": 100}))
    (ck / "pytorch_lora_weights.safetensors").write_text("x")
    incomplete = out / "checkpoint-200"
    incomplete.mkdir()
    (out / "not-a-checkpoint").mkdir()

    status, data = _request(port, "GET", f"/api/checkpoints?output_dir={out}")
    assert status == 200
    by_step = {e["step"]: e for e in data}
    assert set(by_step) == {100, 200}
    assert by_step[100]["complete"] and by_step[100]["manifest"]["global_step"] == 100
    assert "pytorch_lora_weights.safetensors" in by_step[100]["artifacts"]
    assert not by_step[200]["complete"]

    status, _ = _request(port, "GET", "/api/checkpoints")
    assert status == 422


def test_prompt_library_crud(server):
    _, port = server
    status, data = _request(port, "POST", "/api/prompt-libraries/portraits",
                            {"library": {"woman": "a photo of a woman",
                                         "man": "a photo of a man"}})
    assert status == 201 and data["prompts"] == 2

    status, listing = _request(port, "GET", "/api/prompt-libraries")
    assert status == 200
    assert any(e["name"] == "portraits" and e["prompts"] == 2 for e in listing)

    status, entry = _request(port, "GET", "/api/prompt-libraries/portraits")
    assert status == 200 and entry["library"]["man"] == "a photo of a man"

    # invalid payloads rejected
    status, _ = _request(port, "POST", "/api/prompt-libraries/bad", {"library": {}})
    assert status == 422
    status, _ = _request(port, "POST", "/api/prompt-libraries/bad",
                         {"library": {"k": 42}})
    assert status == 422

    status, data = _request(port, "DELETE", "/api/prompt-libraries/portraits")
    assert status == 200 and data["deleted"]
    status, _ = _request(port, "GET", "/api/prompt-libraries/portraits")
    assert status == 404


def test_lycoris_presets(server):
    _, port = server
    status, presets = _request(port, "GET", "/api/lycoris/presets")
    assert status == 200
    assert {"lokr", "loha", "ia3", "tlora"} <= set(presets)
    assert presets["lokr"]["algo"] == "lokr"


def test_dataset_viewer(server, tmp_path):
    _, port = server
    data_dir = tmp_path / "ds"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            data_dir / f"img_{i}.png")
        (data_dir / f"img_{i}.txt").write_text(f"caption {i}")

    status, data = _request(
        port, "GET", f"/api/datasets/viewer?dir={data_dir}&limit=2&thumbnails=1")
    assert status == 200
    assert data["total"] == 3 and len(data["samples"]) == 2
    sample = data["samples"][0]
    assert sample["caption"] == "caption 0"
    assert sample["thumbnail"].startswith("data:image/jpeg;base64,")

    status, page2 = _request(
        port, "GET", f"/api/datasets/viewer?dir={data_dir}&offset=2&limit=2")
    assert status == 200 and len(page2["samples"]) == 1
    assert "thumbnail" not in page2["samples"][0]

    status, _ = _request(port, "GET", "/api/datasets/viewer?dir=/nope/nothing")
    assert status == 404


def test_webhook_test_fire(server):
    """Fire a test webhook at a second ephemeral server's callback route and
    watch the event land in its SSE history."""
    srv, port = server
    status, data = _request(
        port, "POST", "/api/webhooks/test",
        {"url": f"http://127.0.0.1:{port}/api/events/callback",
         "message": "hello from the test"})
    assert status == 200 and data["sent"]
    assert any(e.get("message") == "hello from the test" for e in srv.sse._history)

    status, _ = _request(port, "POST", "/api/webhooks/test", {})
    assert status == 422


@pytest.mark.slow
def test_inference_job_submission(server):
    """An inference job runs a ``cli inference`` subprocess through the
    keeper; with a bogus checkpoint it must fail fast but report kind +
    output_dir faithfully."""
    _, port = server
    status, job = _request(
        port, "POST", "/api/inference/start",
        {"checkpoint": "/nope/checkpoint-1", "prompt": "a cat", "steps": 1})
    assert status == 201
    assert job["kind"] == "inference"
    job_id = job["job_id"]

    import time

    deadline = time.time() + 120
    info = {}
    while time.time() < deadline:
        _, info = _request(port, "GET", f"/api/training/status/{job_id}")
        if info["state"] in ("completed", "failed", "cancelled"):
            break
        time.sleep(1.0)
    assert info["state"] == "failed"

    status, _ = _request(port, "POST", "/api/inference/start", {"prompt": "x"})
    assert status == 422
