"""Platform routes: dataset management, themes, git config versioning.

Reference surfaces: simpletuner_sdk/server/routes/datasets.py (browse/detect/
folders/upload/upload-zip/captions/plan), routes/dataset_viewer.py (summary/
scan), routes/themes.py, routes/git.py."""

import http.client
import io
import json
import os
import threading
import time
import zipfile

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.server.app import create_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    state = str(tmp_path_factory.mktemp("platform_state"))
    srv = create_server("127.0.0.1", 0, state_dir=state)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, port, state
    srv.shutdown()


def _request(port, method, path, body=None, raw=None, content_type=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    if raw is not None:
        conn.request(method, path, body=raw,
                     headers={"Content-Type": content_type or "application/octet-stream"})
    else:
        payload = json.dumps(body) if body is not None else None
        headers = {"Content-Type": "application/json"} if payload else {}
        conn.request(method, path, body=payload, headers=headers)
    response = conn.getresponse()
    data = response.read()
    conn.close()
    try:
        return response.status, json.loads(data or b"null")
    except ValueError:
        return response.status, data


def _multipart(files):
    """files: [(filename, bytes)] -> (content_type, body)"""
    boundary = "stboundary42"
    out = io.BytesIO()
    for filename, payload in files:
        out.write(f"--{boundary}\r\n".encode())
        out.write(
            f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n".encode())
        out.write(payload)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return f"multipart/form-data; boundary={boundary}", out.getvalue()


def _png_bytes(seed=0, size=64):
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(buf, "PNG")
    return buf.getvalue()


# ---- datasets -----------------------------------------------------------------------------


def test_folder_create_and_browse(server):
    _, port, _state = server
    status, data = _request(port, "POST", "/api/datasets/folders", {"name": "myset"})
    assert status == 201 and data["created"]
    status, listing = _request(port, "GET", "/api/datasets/browse")
    assert status == 200
    assert any(d["name"] == "myset" for d in listing["directories"])


def test_upload_multipart_and_detect(server):
    _, port, _state = server
    ctype, body = _multipart([
        ("a.png", _png_bytes(1)), ("a.txt", b"a red square"),
        ("b.png", _png_bytes(2)),
    ])
    status, data = _request(port, "POST", "/api/datasets/upload?dir=myset",
                            raw=body, content_type=ctype)
    assert status == 201 and len(data["uploaded"]) == 3

    status, det = _request(port, "GET", "/api/datasets/detect?path=myset")
    assert status == 200
    assert det["dataset_type"] == "image"
    assert det["counts"]["image"] == 2
    assert det["suggested_config"]["caption_strategy"] in ("textfile", "filename")

    # captions: one of two images captioned
    status, cap = _request(port, "GET", "/api/datasets/captions/status?path=myset")
    assert status == 200 and cap["media"] == 2 and cap["captioned"] == 1
    status, _w = _request(port, "POST", "/api/datasets/captions",
                          {"path": "myset", "file": "b.png", "text": "a blue circle"})
    assert status == 201
    status, got = _request(port, "GET", "/api/datasets/captions/get?path=myset&file=b.png")
    assert status == 200 and got["caption"] == "a blue circle"


def test_upload_rejects_traversal_and_bad_types(server):
    _, port, _state = server
    ctype, body = _multipart([("evil.sh", b"#!/bin/sh")])
    status, data = _request(port, "POST", "/api/datasets/upload?dir=myset",
                            raw=body, content_type=ctype)
    assert status == 422
    # zip with traversal entry: extracted files exclude it
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ok.png", _png_bytes(3))
        zf.writestr("../escape.png", _png_bytes(4))
        zf.writestr("notes.exe", b"x")
    status, data = _request(port, "POST", "/api/datasets/upload/zip?dir=zipset",
                            raw=buf.getvalue(), content_type="application/zip")
    assert status == 201
    assert data["extracted"] == 1
    assert any("escape" in s for s in data["skipped"])
    # browsing outside the sandbox is refused
    status, _ = _request(port, "GET", "/api/datasets/browse?path=../../etc")
    assert status == 403


def test_scan_builds_buckets(server):
    _, port, _state = server
    # self-contained: scan its own uploaded folder
    ctype, body = _multipart([("s1.png", _png_bytes(11)), ("s2.png", _png_bytes(12))])
    status, _ = _request(port, "POST", "/api/datasets/upload?dir=scanset",
                         raw=body, content_type=ctype)
    assert status == 201
    status, record = _request(port, "POST", "/api/datasets/scan",
                              {"dir": "scanset", "resolution": 64,
                               "resolution_type": "pixel_area"})
    assert status == 202
    scan_id = record["scan_id"]
    deadline = time.time() + 60
    while time.time() < deadline:
        _, info = _request(port, "GET", f"/api/datasets/scan/status?scan_id={scan_id}")
        if info["state"] in ("completed", "failed"):
            break
        time.sleep(0.2)
    assert info["state"] == "completed", info
    assert info["total_files"] == 2
    assert sum(info["buckets"].values()) == 2

    status, summary = _request(port, "GET", "/api/datasets/viewer/summary?path=scanset")
    assert status == 200 and summary["buckets"] is not None


def test_dataset_plan_crud(server):
    _, port, state = server
    datasets = [
        {"id": "images", "type": "local", "instance_data_dir": os.path.join(state, "datasets", "myset"),
         "resolution": 64, "resolution_type": "pixel_area", "caption_strategy": "textfile"},
        {"id": "embeds", "dataset_type": "text_embeds", "type": "local", "default": True,
         "cache_dir": os.path.join(state, "cache", "text")},
    ]
    status, result = _request(port, "POST", "/api/datasets/plan/save", {"datasets": datasets})
    assert status == 201 and result["count"] == 2
    status, plan = _request(port, "GET", "/api/datasets/plan")
    assert status == 200 and len(plan["datasets"]) == 2
    # patch one entry
    patched = dict(datasets[0], repeats=3)
    status, result = _request(port, "PATCH", "/api/datasets/plan", {"dataset": patched})
    assert status == 200
    _, plan = _request(port, "GET", "/api/datasets/plan")
    entry = next(d for d in plan["datasets"] if d["id"] == "images")
    assert entry["repeats"] == 3
    # invalid plan rejected
    status, result = _request(port, "POST", "/api/datasets/plan/save",
                              {"datasets": [{"type": "local"}]})
    assert status in (400, 422)
    # delete
    status, result = _request(port, "DELETE", "/api/datasets/plan/embeds")
    assert status == 200
    _, plan = _request(port, "GET", "/api/datasets/plan")
    assert len(plan["datasets"]) == 1


# ---- themes -------------------------------------------------------------------------------


def test_themes_builtin_and_css(server):
    _, port, _state = server
    status, themes = _request(port, "GET", "/api/themes")
    assert status == 200
    ids = {t["id"] for t in themes}
    assert {"dark", "light", "tron"} <= ids
    status, theme = _request(port, "GET", "/api/themes/dark")
    assert status == 200 and "--bg" in theme["variables"]
    status, css = _request(port, "GET", "/api/themes/dark/theme.css")
    assert status == 200 and b"--bg" in css
    status, _ = _request(port, "GET", "/api/themes/nope")
    assert status == 404


def test_theme_save_local_and_protect_builtin(server):
    _, port, _state = server
    status, _ = _request(port, "POST", "/api/themes/corp",
                         {"name": "Corp", "variables": {"--bg": "#101010"}})
    assert status == 201
    status, themes = _request(port, "GET", "/api/themes")
    entry = next(t for t in themes if t["id"] == "corp")
    assert entry["source"] == "local"
    status, _ = _request(port, "POST", "/api/themes/dark", {"variables": {}})
    assert status == 422


# ---- git ----------------------------------------------------------------------------------


def test_git_config_versioning_flow(server):
    _, port, _state = server
    status, st = _request(port, "GET", "/api/git/status")
    assert status == 200
    if not st["git_available"]:
        pytest.skip("git binary not available")
    status, st = _request(port, "POST", "/api/git/init", {})
    assert status == 201 and st["repo_present"]
    # save a config through the store, snapshot it, mutate, diff, revert
    status, _ = _request(port, "POST", "/api/configs/run1",
                         {"config": {"model_family": "flux", "optimizer": "adamw",
                                     "learning_rate": 1e-4, "max_train_steps": 5}})
    assert status == 201
    status, snap = _request(port, "POST", "/api/git/snapshot", {"message": "first"})
    assert status == 201 and snap["committed"], snap
    status, _ = _request(port, "POST", "/api/configs/run1",
                         {"config": {"model_family": "flux", "optimizer": "adamw",
                                     "learning_rate": 2e-4, "max_train_steps": 5}})
    status, hist = _request(port, "GET", "/api/git/history")
    assert status == 200 and len(hist) >= 1 and hist[0]["message"] == "first"
    status, diff = _request(port, "GET", "/api/git/diff")
    assert status == 200 and "2e-04" in diff["diff"] or "0.0002" in diff["diff"]
    status, snap2 = _request(port, "POST", "/api/git/snapshot", {"message": "second"})
    assert status == 201 and snap2["committed"]
    # revert the file to the first commit
    status, rev = _request(port, "POST", "/api/git/revert",
                           {"path": ".", "commit": hist[0]["commit"]})
    assert status == 200
    status, snap3 = _request(port, "POST", "/api/git/snapshot", {"message": "revert"})
    assert status == 201


# ---- WebUI assets for the new panels --------------------------------------------------------


def test_webui_assets_wizard_datasets_themes_git(server):
    """Wizard/managed-datasets/themes/git panels: anchors present in the page,
    JS wired to the new routes (same crossref guard as the older tabs)."""
    import re

    _, port, _state = server

    def get_text(path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", path)
        response = conn.getresponse()
        body = response.read().decode()
        conn.close()
        return response.status, body

    status, html = get_text("/")
    assert status == 200
    for anchor in ('data-tab="wizard"', "wiz-step-1", "wiz-launch", "ds-table",
                   "cap-text", "theme-select", "git-history", "lr-chart", "ips-chart"):
        assert anchor in html, f"missing {anchor} in index.html"
    status, js = get_text("/static/app.js")
    assert status == 200
    for anchor in ("/api/themes", "/api/datasets/upload", "/api/datasets/scan",
                   "/api/datasets/captions", "/api/git/snapshot", "/api/git/revert",
                   "/api/datasets/browse"):
        assert anchor in js, f"missing {anchor} in app.js"
    referenced = set(re.findall(r'\$\("#([\w-]+)"\)', js))
    present = set(re.findall(r'id="([\w-]+)"', html))
    missing = sorted(r for r in referenced - present if not r.startswith("wiz-step-"))
    # wiz-step-N ids are templated ($(`#wiz-step-${i}`)) and matched above
    assert not missing, f"app.js references ids absent from index.html: {missing}"
