"""Platform CLI tree (reference cli/__init__.py:105-715: users/orgs/quota/
approvals/notifications/pricing/metrics/audit/database/backup) — exercised
against a live ephemeral API server and the local state dir."""

import json
import os
import threading

import pytest

from simpletuner_tpu.cli import main
from simpletuner_tpu.server.app import create_server


@pytest.fixture()
def api(tmp_path):
    srv = create_server("127.0.0.1", 0, state_dir=str(tmp_path / "state"))
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", srv
    srv.run_queue.close()
    srv.shutdown()


def test_users_quota_orgs_cycle(api, capsys):
    url, _ = api
    assert main(["users", "create", "root", "--role", "admin", "--server", url]) == 0
    out = capsys.readouterr().out
    token = out.split("token:")[1].strip()

    common = ["--server", url, "--token", token]
    assert main(["users", "create", "alice", *common]) == 0
    capsys.readouterr()
    assert main(["users", "list", *common]) == 0
    out = capsys.readouterr().out
    assert "root" in out and "alice" in out

    assert main(["quota", *common]) == 0
    assert "usage" in capsys.readouterr().out

    assert main(["orgs", "create", "lab", "--owner", "alice",
                 "--require-approval", *common]) == 0
    capsys.readouterr()
    assert main(["orgs", "list", *common]) == 0
    assert "lab" in capsys.readouterr().out
    assert main(["orgs", "add-member", "lab", "root", "--member-role", "admin", *common]) == 0
    capsys.readouterr()
    assert main(["orgs", "show", "lab", *common]) == 0
    assert "root" in capsys.readouterr().out


def test_pricing_and_metrics(api, capsys):
    url, _ = api
    common = ["--server", url]
    assert main(["pricing", "list", *common]) == 0
    assert "v5e" in capsys.readouterr().out
    assert main(["pricing", "set", "--accelerator", "v5e", "--rate", "9.99", *common]) == 0
    assert "9.99" in capsys.readouterr().out
    assert main(["metrics", *common]) == 0
    assert "simpletuner_jobs_total" in capsys.readouterr().out


def test_approvals_and_notifications_cycle(api, capsys):
    url, srv = api
    assert main(["users", "create", "boss", "--role", "admin", "--server", url]) == 0
    token = capsys.readouterr().out.split("token:")[1].strip()
    common = ["--server", url, "--token", token]
    assert main(["users", "create", "emp", *common]) == 0
    emp_token = capsys.readouterr().out.split("token:")[1].strip()
    assert main(["orgs", "create", "corp", "--owner", "emp", "--require-approval", *common]) == 0
    capsys.readouterr()

    # employee submits through the jobs CLI -> lands in approvals
    import urllib.request

    req = urllib.request.Request(
        url + "/api/training/start",
        data=json.dumps({"config": {"model_family": "flux", "max_train_steps": 1}}).encode(),
        headers={"Content-Type": "application/json",
                 "Authorization": f"Bearer {emp_token}"},
        method="POST")
    with urllib.request.urlopen(req) as response:
        assert response.status == 202

    assert main(["approvals", "list", "--state", "pending", *common]) == 0
    out = capsys.readouterr().out
    approval_id = out.split()[0]
    assert main(["approvals", "reject", approval_id, "--reason", "nope", *common]) == 0
    assert "rejected" in capsys.readouterr().out

    emp_common = ["--server", url, "--token", emp_token]
    assert main(["notifications", "list", *emp_common]) == 0
    assert "job_rejected" in capsys.readouterr().out
    assert main(["notifications", "read", *emp_common]) == 0
    capsys.readouterr()

    assert main(["audit", "--show", *common]) == 0
    out = capsys.readouterr().out
    assert "VERIFIED" in out and "job.reject" in out


def test_database_and_backup(tmp_path, capsys):
    state = tmp_path / "state"
    from simpletuner_tpu.server.store import JobStore

    store = JobStore(str(state))
    store.upsert({"job_id": "old1", "state": "completed", "created_at": 1.0})
    store.upsert({"job_id": "new1", "state": "completed", "created_at": 9e9})

    assert main(["database", "list", "--state-dir", str(state)]) == 0
    out = capsys.readouterr().out
    assert "old1" in out and "new1" in out
    assert main(["database", "show", "old1", "--state-dir", str(state)]) == 0
    assert "completed" in capsys.readouterr().out
    assert main(["database", "vacuum", "--state-dir", str(state), "--keep-days", "1"]) == 0
    assert "removed 1" in capsys.readouterr().out

    backup = tmp_path / "b.tar.gz"
    assert main(["backup", "create", "--state-dir", str(state), "--file", str(backup)]) == 0
    capsys.readouterr()
    restore_dir = tmp_path / "restored"
    assert main(["backup", "restore", "--state-dir", str(restore_dir),
                 "--file", str(backup)]) == 0
    assert json.load(open(restore_dir / "jobs.json"))["new1"]["state"] == "completed"
    # non-empty target refused without --force
    assert main(["backup", "restore", "--state-dir", str(restore_dir),
                 "--file", str(backup)]) == 1
    assert main(["backup", "restore", "--state-dir", str(restore_dir),
                 "--file", str(backup), "--force"]) == 0


def test_webhook_test_fire(tmp_path, capsys):
    """webhooks test-fire against a local HTTP sink."""
    import http.server

    hits = []

    class Sink(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            hits.append(json.loads(self.rfile.read(length)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    sink = http.server.HTTPServer(("127.0.0.1", 0), Sink)
    threading.Thread(target=sink.serve_forever, daemon=True).start()
    config = tmp_path / "webhook.json"
    config.write_text(json.dumps({
        "webhook_type": "raw",
        "callback_url": f"http://127.0.0.1:{sink.server_address[1]}/hook",
    }))
    assert main(["webhooks", "--config", str(config), "--message", "ping-123"]) == 0
    sink.shutdown()
    assert any("ping-123" in json.dumps(h) for h in hits)


def test_hardware_version_local_and_server(api, capsys):
    url, _ = api
    assert main(["hardware", "--server", url]) == 0
    out = capsys.readouterr().out
    assert "backend:" in out and "[0]" in out
    assert main(["hardware", "--local", "--json"]) == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["accelerators"]

    assert main(["version", "--full"]) == 0
    out = capsys.readouterr().out
    assert "simpletuner_tpu" in out and "jax" in out


def test_checkpoints_inventory(api, tmp_path, capsys):
    url, _ = api
    out_dir = tmp_path / "run"
    ck = out_dir / "checkpoint-40"
    ck.mkdir(parents=True)
    (ck / ".checkpoint_complete").write_text("")
    (ck / "adapter.safetensors").write_text("x")
    assert main(["checkpoints", str(out_dir), "--server", url]) == 0
    out = capsys.readouterr().out
    assert "step       40" in out and "complete" in out and "adapter.safetensors" in out
    assert main(["checkpoints", str(out_dir), "--local"]) == 0
    assert main(["checkpoints", str(tmp_path / "empty"), "--server", url]) == 1


def test_prompt_libraries_cycle(api, tmp_path, capsys):
    url, _ = api
    lib = tmp_path / "lib.json"
    lib.write_text(json.dumps({"cat": "a photo of a cat", "dog": "a photo of a dog"}))
    common = ["--server", url]
    assert main(["prompt-libraries", "push", "animals", "--file", str(lib), *common]) == 0
    capsys.readouterr()
    assert main(["prompt-libraries", "list", *common]) == 0
    assert "animals" in capsys.readouterr().out
    assert main(["prompt-libraries", "show", "animals", *common]) == 0
    assert "a photo of a dog" in capsys.readouterr().out
    assert main(["prompt-libraries", "delete", "animals", *common]) == 0
    capsys.readouterr()
    assert main(["prompt-libraries", "list", *common]) == 0
    assert "animals" not in capsys.readouterr().out
