"""Platform layer: versioned config store, persistent job records, dataset
plan / field registry routes, worker agent (VERDICT r1 Next #8, Missing #6)."""

import json
import threading
import urllib.request

import pytest

from simpletuner_tpu.server.store import ConfigStore, JobStore


def test_config_store_versioning(tmp_path):
    store = ConfigStore(str(tmp_path))
    assert store.list() == []
    r1 = store.save("myrun", {"model_family": "flux", "learning_rate": 1e-4})
    r2 = store.save("myrun", {"model_family": "flux", "learning_rate": 2e-4})
    assert (r1["version"], r2["version"]) == (1, 2)
    assert store.get("myrun")["config"]["learning_rate"] == 2e-4
    assert store.get("myrun", version=1)["config"]["learning_rate"] == 1e-4
    assert [v["version"] for v in store.versions("myrun")] == [1, 2]
    assert store.list() == ["myrun"]
    assert store.delete("myrun")
    assert store.get("myrun") is None


def test_job_store_persistence_marks_interrupted(tmp_path):
    store = JobStore(str(tmp_path))
    store.upsert({"job_id": "a", "state": "running", "created_at": 1.0})
    store.upsert({"job_id": "b", "state": "completed", "created_at": 2.0})
    # new store instance = simulated server restart
    store2 = JobStore(str(tmp_path))
    hist = {r["job_id"]: r for r in store2.history()}
    assert hist["a"]["state"] == "interrupted"
    assert hist["b"]["state"] == "completed"


@pytest.fixture
def server(tmp_path):
    from simpletuner_tpu.server.app import create_server

    srv = create_server(port=0, state_dir=str(tmp_path))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as resp:
        return json.loads(resp.read())


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return json.loads(resp.read())


def test_config_routes(server):
    r = _post(server, "/api/configs/demo", {"config": {"model_family": "flux"}})
    assert r == {"name": "demo", "version": 1}
    _post(server, "/api/configs/demo", {"config": {"model_family": "sdxl"}})
    assert _get(server, "/api/configs") == ["demo"]
    assert _get(server, "/api/configs/demo")["config"]["model_family"] == "sdxl"
    assert _get(server, "/api/configs/demo?version=1")["config"]["model_family"] == "flux"
    assert len(_get(server, "/api/configs/demo/versions")) == 2


def test_fields_route(server):
    fields = _get(server, "/api/fields")
    names = {f["name"] for f in fields}
    assert "model_family" in names and "learning_rate" in names
    assert len(fields) > 150


def test_datasets_plan_route(server):
    plan = _post(
        server,
        "/api/datasets/plan",
        {
            "config": [
                {"id": "train", "dataset_type": "image", "type": "local",
                 "instance_data_dir": "/tmp/x", "resolution": 512,
                 "caption_strategy": "textfile", "text_embeds": "emb"},
                {"id": "emb", "dataset_type": "text_embeds", "type": "local",
                 "default": True, "cache_dir": "/tmp/y"},
            ]
        },
    )
    assert plan["valid"] is True
    assert {d["id"] for d in plan["datasets"]} == {"train", "emb"}


def test_worker_agent_event_handling(monkeypatch):
    from simpletuner_tpu.worker_agent import WorkerAgent, WorkerConfig

    agent = WorkerAgent(WorkerConfig(server="http://127.0.0.1:1", worker_id="w1"))
    submitted = {}
    posted = []
    monkeypatch.setattr(
        agent.keeper, "submit_job",
        lambda config, job_id=None: submitted.update(config=config, job_id=job_id) or
        type("J", (), {"job_id": job_id or "j1"})(),
    )
    monkeypatch.setattr(agent, "_post", lambda payload: posted.append(payload))

    agent._handle_event({"event_type": "job_offer", "job_id": "jobX",
                         "config": {"model_family": "flux"}})
    assert submitted["job_id"] == "jobX"
    assert posted and posted[-1]["event_type"] == "worker_job_accepted"

    # offers addressed to another worker are ignored
    submitted.clear()
    agent._handle_event({"event_type": "job_offer", "worker_id": "other",
                         "config": {"model_family": "flux"}})
    assert not submitted
