"""WebUI end-to-end (VERDICT r2 Next #5): the dashboard's own HTTP calls —
submit a tiny training job through POST /api/training/start (what the job
form does) and watch it run to completion on the SSE stream (what the
dashboard's EventSource consumes).  Reference: simpletuner/static/js trainer
dashboard over routes/training + sse_manager."""

import http.client
import json
import os
import threading
import time

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.server.app import create_server

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    state = str(tmp_path_factory.mktemp("server_state"))
    srv = create_server("127.0.0.1", 0, state_dir=state)
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


def _tiny_job_config(tmp_path):
    img_dir = os.path.join(tmp_path, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, f"img_{i}.png")
        )
        with open(os.path.join(img_dir, f"img_{i}.txt"), "w") as fh:
            fh.write(f"photo {i}")
    cache = os.path.join(tmp_path, "cache")
    return {
        "model_family": "flux", "model_type": "lora", "model_arch_preset": "tiny",
        "lora_rank": 4, "train_batch_size": 1, "resolution": 64,
        "resolution_type": "pixel_area", "max_train_steps": 2,
        "cache_dir": cache, "output_dir": os.path.join(tmp_path, "out"),
        "optimizer": "adamw", "learning_rate": 1e-3, "seed": 7,
        "report_to": "none",
        "data_backend_config": [
            {"id": "images", "type": "local", "instance_data_dir": img_dir,
             "crop": True, "crop_style": "center", "crop_aspect": "square",
             "resolution": 64, "resolution_type": "pixel_area",
             "caption_strategy": "textfile",
             "cache_dir_vae": os.path.join(cache, "vae"),
             "text_embeds": "embeds", "repeats": 7},
            {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
             "default": True, "cache_dir": os.path.join(cache, "text")},
        ],
    }


def test_form_schema_covers_submitted_fields(server):
    """The job form builds itself from /api/fields — every field the e2e
    config submits must exist in the schema (else the form can't express it)."""
    _, port = server
    status, fields = _request(port, "GET", "/api/fields")
    assert status == 200
    names = {f["name"] for f in fields}
    for key in ("model_family", "model_type", "optimizer", "learning_rate",
                "max_train_steps", "train_batch_size", "resolution", "lora_rank",
                "output_dir", "seed", "data_backend_config"):
        assert key in names, f"form field {key} missing from /api/fields"


def test_submit_job_and_watch_sse_to_completion(server, tmp_path):
    srv, port = server
    config = _tiny_job_config(str(tmp_path))

    # subscribe to SSE first so no event is missed
    sse_conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    sse_conn.request("GET", "/api/events")
    sse_response = sse_conn.getresponse()
    assert sse_response.status == 200

    status, job = _request(port, "POST", "/api/training/start", {"config": config})
    assert status == 201, job
    job_id = job["job_id"]

    # read the SSE stream until the job reaches a terminal state
    terminal = None
    events = []
    deadline = time.time() + 600
    buffer = b""
    while time.time() < deadline and terminal is None:
        chunk = sse_response.read1(4096)
        if not chunk:
            break
        buffer += chunk
        while b"\n\n" in buffer:
            frame, buffer = buffer.split(b"\n\n", 1)
            for line in frame.decode().splitlines():
                if not line.startswith("data: "):
                    continue
                event = json.loads(line[len("data: "):])
                events.append(event)
                if event.get("job_id") == job_id and event.get("state") in (
                    "completed", "failed", "cancelled"
                ):
                    terminal = event["state"]
    sse_conn.close()

    assert terminal == "completed", (
        f"job ended {terminal}; events={[e.get('state') or e.get('event_type') for e in events]}"
    )
    status, detail = _request(port, "GET", f"/api/training/status/{job_id}")
    assert status == 200 and detail["state"] == "completed" and detail["return_code"] == 0

    # the dashboard's logs pane has content
    status, logs = _request(port, "GET", f"/api/training/logs/{job_id}?tail=50")
    assert status == 200 and logs["logs"]

    # training artifacts exist where the job said they would
    out_dir = detail["output_dir"] or config["output_dir"]
    ckpts = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    assert ckpts, f"no checkpoints in {out_dir}"


def test_admin_tab_assets_and_flow(server):
    """The admin panel's own HTTP calls (what static/app.js refreshAdmin does):
    queue + approvals + users + orgs + notifications + pricing, plus the page
    assets carrying the admin tab."""
    srv, port = server

    def get_text(path, token=None):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        headers = {"Authorization": f"Bearer {token}"} if token else {}
        conn.request("GET", path, headers=headers)
        response = conn.getresponse()
        body = response.read().decode()
        conn.close()
        return response.status, body

    status, html = get_text("/")
    assert status == 200
    for anchor in ("data-tab=\"admin\"", "queue-table", "approvals-table",
                   "users-table", "orgs-table", "pricing-table", "id=\"token\""):
        assert anchor in html, f"missing {anchor} in index.html"
    status, js = get_text("/static/app.js")
    assert status == 200
    for anchor in ("/api/queue", "/api/approvals", "/api/orgs",
                   "/api/notifications", "/api/pricing", "st_token", "Authorization"):
        assert anchor in js, f"missing {anchor} in app.js"

    # the JSON calls the admin tab makes, end to end
    status, queue = _request(port, "GET", "/api/queue")
    assert status == 200 and "pending" in queue and "slots_free" in queue
    status, approvals = _request(port, "GET", "/api/approvals?state=pending")
    assert status == 200 and isinstance(approvals, list)
    status, pricing = _request(port, "GET", "/api/pricing")
    assert status == 200 and "v5e" in pricing


def test_new_tabs_assets_and_id_crossref(server):
    """Checkpoints/System/dataset-browser tabs: every element id the JS
    references must exist in the page (a missing id nulls the whole script),
    and the JSON calls the new tabs make work end to end."""
    import re

    _, port = server

    def get_text(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", path)
        response = conn.getresponse()
        body = response.read().decode()
        conn.close()
        return response.status, body

    status, html = get_text("/")
    assert status == 200
    for anchor in ('data-tab="checkpoints"', 'data-tab="system"',
                   "viewer-grid", "ckpt-table", "plib-table", "hw-table"):
        assert anchor in html, f"missing {anchor} in index.html"
    status, js = get_text("/static/app.js")
    assert status == 200
    for anchor in ("/api/checkpoints", "/api/inference/start",
                   "/api/prompt-libraries", "/api/hardware", "/api/webhooks/test",
                   "/api/datasets/viewer"):
        assert anchor in js, f"missing {anchor} in app.js"

    referenced = set(re.findall(r'\$\("#([\w-]+)"\)', js))
    present = set(re.findall(r'id="([\w-]+)"', html))
    missing = sorted(referenced - present)
    assert not missing, f"app.js references ids absent from index.html: {missing}"

    status, hw = _request(port, "GET", "/api/hardware")
    assert status == 200 and hw["accelerators"]
    status, ver = _request(port, "GET", "/api/version")
    assert status == 200 and ver["simpletuner_tpu"]


def test_full_flow_upload_configure_train_monitor(server, tmp_path):
    """The onboarding path end-to-end through the HTTP surface only, exactly
    as the WebUI drives it: upload images+captions -> scan buckets -> save the
    dataset plan -> save a config -> start training referencing both -> watch
    SSE to completion (reference: onboarding wizard -> datasets routes ->
    configs service -> training routes -> sse_manager)."""
    import io
    import zipfile

    srv, port = server
    state = srv.datasets.root  # server-managed datasets sandbox
    rng = np.random.default_rng(3)

    # 1. upload: a zip of images + caption sidecars
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(8):
            img = io.BytesIO()
            Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)).save(img, "PNG")
            zf.writestr(f"img_{i}.png", img.getvalue())
            zf.writestr(f"img_{i}.txt", f"photo {i}")
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/api/datasets/upload/zip?dir=flow", body=buf.getvalue(),
                 headers={"Content-Type": "application/zip"})
    resp = conn.getresponse()
    upload = json.loads(resp.read())
    conn.close()
    assert resp.status == 201 and upload["extracted"] == 16

    # 2. detect + scan
    status, det = _request(port, "GET", "/api/datasets/detect?path=flow")
    assert status == 200 and det["counts"]["image"] == 8
    assert det["caption_coverage"] == 1.0
    status, scan = _request(port, "POST", "/api/datasets/scan",
                            {"dir": "flow", "resolution": 64,
                             "resolution_type": "pixel_area"})
    assert status == 202
    deadline = time.time() + 60
    while time.time() < deadline:
        _, info = _request(port, "GET",
                           f"/api/datasets/scan/status?scan_id={scan['scan_id']}")
        if info["state"] in ("completed", "failed"):
            break
        time.sleep(0.2)
    assert info["state"] == "completed" and info["total_files"] == 8

    # 3. dataset plan + config store (what the config editor persists)
    img_dir = os.path.join(state, "flow")
    cache = os.path.join(str(tmp_path), "cache")
    datasets = [
        {"id": "flow", "type": "local", "instance_data_dir": img_dir,
         "crop": True, "crop_style": "center", "crop_aspect": "square",
         "resolution": 64, "resolution_type": "pixel_area",
         "caption_strategy": "textfile",
         "cache_dir_vae": os.path.join(cache, "vae"),
         "text_embeds": "embeds", "repeats": 7},
        {"id": "embeds", "dataset_type": "text_embeds", "type": "local",
         "default": True, "cache_dir": os.path.join(cache, "text")},
    ]
    status, _ = _request(port, "POST", "/api/datasets/plan/save", {"datasets": datasets})
    assert status == 201
    config = {
        "model_family": "flux", "model_type": "lora", "model_arch_preset": "tiny",
        "lora_rank": 4, "train_batch_size": 1, "resolution": 64,
        "resolution_type": "pixel_area", "max_train_steps": 2,
        "cache_dir": cache, "output_dir": os.path.join(str(tmp_path), "out"),
        "optimizer": "adamw", "learning_rate": 1e-3, "seed": 7,
        "report_to": "none", "data_backend_config": datasets,
    }
    status, _ = _request(port, "POST", "/api/configs/flow-run", {"config": config})
    assert status == 201

    # 4. train + monitor over SSE
    sse_conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    sse_conn.request("GET", "/api/events")
    sse_response = sse_conn.getresponse()
    status, job = _request(port, "POST", "/api/training/start", {"config": config})
    assert status == 201, job
    job_id = job["job_id"]
    terminal, progress_events = None, 0
    deadline = time.time() + 600
    buffer = b""
    while time.time() < deadline and terminal is None:
        chunk = sse_response.read1(4096)
        if not chunk:
            break
        buffer += chunk
        while b"\n\n" in buffer:
            frame, buffer = buffer.split(b"\n\n", 1)
            for line in frame.decode().splitlines():
                if not line.startswith("data: "):
                    continue
                event = json.loads(line[len("data: "):])
                if event.get("event_type") == "training_progress":
                    progress_events += 1
                if event.get("job_id") == job_id and event.get("state") in (
                    "completed", "failed", "cancelled"):
                    terminal = event["state"]
    sse_conn.close()
    assert terminal == "completed", f"job ended {terminal}"
    status, detail = _request(port, "GET", f"/api/training/status/{job_id}")
    assert status == 200 and detail["return_code"] == 0
    ckpts = [d for d in os.listdir(config["output_dir"]) if d.startswith("checkpoint-")]
    assert ckpts
