"""Users, bearer-token auth, and quota enforcement on the training server
(reference simpletuner_sdk users/auth routes + quota manager)."""

import http.client
import json
import threading

import pytest

from simpletuner_tpu.server.app import create_server


@pytest.fixture()
def server(tmp_path):
    srv = create_server("127.0.0.1", 0, state_dir=str(tmp_path))
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, port
    srv.shutdown()


def _request(port, method, path, body=None, token=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    payload = json.dumps(body) if body is not None else None
    headers = {"Content-Type": "application/json"} if payload else {}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    conn.request(method, path, body=payload, headers=headers)
    response = conn.getresponse()
    data = json.loads(response.read() or b"null")
    conn.close()
    return response.status, data


def test_auth_lifecycle_and_quota(server):
    _, port = server

    # open until the first user exists
    status, _ = _request(port, "GET", "/api/models")
    assert status == 200

    # bootstrap admin
    status, admin = _request(port, "POST", "/api/users", {"username": "root"})
    assert status == 201 and admin["role"] == "admin"
    admin_token = admin["token"]

    # now unauthenticated requests are rejected (health stays open)
    status, _ = _request(port, "GET", "/api/models")
    assert status == 401
    status, _ = _request(port, "GET", "/health")
    assert status == 200

    # admin creates a user with a tight quota
    status, user = _request(
        port, "POST", "/api/users",
        {"username": "alice", "max_concurrent_jobs": 1, "max_total_steps": 5},
        token=admin_token,
    )
    assert status == 201
    alice = user["token"]

    # non-admin cannot manage users
    status, _ = _request(port, "POST", "/api/users", {"username": "bob"}, token=alice)
    assert status == 403
    status, _ = _request(port, "GET", "/api/users", token=alice)
    assert status == 403
    status, listing = _request(port, "GET", "/api/users", token=admin_token)
    assert status == 200 and {u["username"] for u in listing} == {"root", "alice"}

    # step-budget quota: 5 steps total; a 10-step job is denied
    config = {"model_family": "flux", "model_type": "lora", "max_train_steps": 10,
              "model_arch_preset": "tiny"}
    status, err = _request(port, "POST", "/api/training/start", {"config": config}, token=alice)
    assert status == 429 and "budget" in err["error"]

    # a 3-step job passes and is recorded against the budget
    config["max_train_steps"] = 3
    status, job = _request(port, "POST", "/api/training/start", {"config": config}, token=alice)
    assert status == 201
    status, usage = _request(port, "GET", "/api/quota", token=alice)
    assert status == 200 and usage["usage"]["steps_requested"] == 3

    # concurrent-job quota: alice may only have 1 active job
    status, err = _request(port, "POST", "/api/training/start", {"config": config}, token=alice)
    assert status == 429 and "active jobs" in err["error"]

    # cancel so the fixture can shut down cleanly
    _request(port, "POST", f"/api/training/cancel/{job['job_id']}", {}, token=alice)
