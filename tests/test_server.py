"""Training API server tests over real HTTP on an ephemeral port."""

import http.client
import json
import threading
import time

import pytest

from simpletuner_tpu.server.app import create_server


@pytest.fixture(scope="module")
def server():
    srv = create_server("127.0.0.1", 0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, port
    srv.shutdown()


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    payload = json.dumps(body) if body is not None else None
    headers = {"Content-Type": "application/json"} if payload else {}
    conn.request(method, path, body=payload, headers=headers)
    response = conn.getresponse()
    data = json.loads(response.read() or b"null")
    conn.close()
    return response.status, data


def test_health(server):
    _, port = server
    status, data = _request(port, "GET", "/health")
    assert status == 200 and data["status"] == "ok"


def test_models_and_optimizers(server):
    _, port = server
    status, models = _request(port, "GET", "/api/models")
    assert status == 200 and "flux" in models
    status, opts = _request(port, "GET", "/api/optimizers")
    assert status == 200 and "adamw" in opts


def test_config_validate(server):
    _, port = server
    status, data = _request(
        port, "POST", "/api/config/validate",
        {"config": {"model_family": "flux", "optimizer": "adamw", "learning_rate": 1e-4,
                    "max_train_steps": 10}},
    )
    assert status == 200 and data["valid"]
    status, data = _request(
        port, "POST", "/api/config/validate",
        {"config": {"model_family": "flux", "optimizer": "nope", "learning_rate": 1e-4,
                    "max_train_steps": 10}},
    )
    assert status == 422 and not data["valid"]


def test_job_lifecycle_failing_job(server):
    """Submit a config that fails fast; lifecycle must reach 'failed' with logs."""
    _, port = server
    status, job = _request(
        port, "POST", "/api/training/start",
        {"config": {"model_family": "definitely-not-a-model", "optimizer": "adamw",
                    "learning_rate": 1e-4, "max_train_steps": 1}},
    )
    assert status == 201
    job_id = job["job_id"]
    deadline = time.time() + 120
    state = None
    while time.time() < deadline:
        _, info = _request(port, "GET", f"/api/training/status/{job_id}")
        state = info["state"]
        if state in ("completed", "failed", "cancelled"):
            break
        time.sleep(1.0)
    assert state == "failed"
    assert info["return_code"] not in (0, None)
    _, logs = _request(port, "GET", f"/api/training/logs/{job_id}?tail=50")
    assert any("model" in line.lower() or "error" in line.lower() for line in logs["logs"])


def test_missing_model_family_rejected(server):
    _, port = server
    status, data = _request(port, "POST", "/api/training/start", {"config": {}})
    assert status == 422


def test_unknown_job_404(server):
    _, port = server
    status, _ = _request(port, "GET", "/api/training/status/nope")
    assert status == 404


def test_events_callback_roundtrip(server):
    srv, port = server
    status, data = _request(
        port, "POST", "/api/events/callback", {"event_type": "training_status", "global_step": 5}
    )
    assert status == 200 and data["received"]
    assert any(e.get("global_step") == 5 for e in srv.sse._history)


def test_ui_page(server):
    _, port = server

    def get_text(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", path)
        response = conn.getresponse()
        body = response.read().decode()
        conn.close()
        return response.status, body

    status, body = get_text("/")
    assert status == 200
    assert "simpletuner" in body and "app.js" in body
    status, js = get_text("/static/app.js")
    assert status == 200
    assert "EventSource" in js and "/api/fields" in js and "/api/datasets/plan" in js
    status, css = get_text("/static/style.css")
    assert status == 200 and "--accent" in css
    # traversal out of the static dir is rejected
    status, _ = get_text("/static/../app.py")
    assert status == 404


def test_prometheus_metrics(server):
    _, port = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/metrics")
    response = conn.getresponse()
    body = response.read().decode()
    conn.close()
    assert response.status == 200
    assert "simpletuner_jobs_total" in body
    assert 'state="failed"' in body


class TestAuditLog:
    def test_chain_append_and_verify(self, tmp_path):
        from simpletuner_tpu.server.audit import AuditLog

        log = AuditLog(str(tmp_path / "audit.jsonl"))
        log.append("job.submit", detail={"job_id": "a"})
        log.append("job.cancel", detail={"job_id": "a"})
        ok, bad = log.verify()
        assert ok and bad is None
        # reload from disk: chain still verifies
        log2 = AuditLog(str(tmp_path / "audit.jsonl"))
        assert log2.verify() == (True, None)
        # tamper with the middle record -> verification pinpoints it
        log2._records[0]["action"] = "job.forged"
        ok, bad = log2.verify()
        assert not ok and bad == 1

    def test_audit_endpoint(self, server):
        srv, port = server
        _request(port, "POST", "/api/training/start",
                 {"config": {"model_family": "flux", "max_train_steps": 1}})
        status, payload = _request(port, "GET", "/api/audit")
        assert status == 200
        assert payload["verified"] is True
        assert any(r["action"] == "job.submit" for r in payload["records"])
