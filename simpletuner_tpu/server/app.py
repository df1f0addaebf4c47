"""Training API server.

Reference: simpletuner_sdk/server/app.py + routes/ (FastAPI; 36 route modules).
This build ships a dependency-free stdlib HTTP server carrying the training
API surface: job submission/status/logs/cancel, manual validation/checkpoint
signals, SSE event stream, model/optimizer listings, config validation, and a
webhook callback endpoint the trainer posts its events to.

Routes:
  GET  /health
  GET  /api/models
  GET  /api/optimizers
  POST /api/config/validate            {config}
  POST /api/training/start             {config, job_id?}
  GET  /api/training/jobs
  GET  /api/training/status/<job_id>
  GET  /api/training/logs/<job_id>?tail=N
  POST /api/training/cancel/<job_id>
  POST /api/training/signal/<job_id>   {action: validation|checkpoint|abort}
  GET  /api/events                     (SSE)
  POST /api/events/callback            (webhook receiver)
  GET  /  /ui  /static/*               (WebUI: dashboard + job form + dataset
                                        plan viewer, server/static/)
"""

from __future__ import annotations

import json
import logging
import os
import queue
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Tuple

from .process_keeper import ProcessKeeper

logger = logging.getLogger(__name__)


class SSEManager:
    """In-memory fanout of server events to any number of SSE clients
    (reference simpletuner_sdk sse_manager.py)."""

    def __init__(self, history: int = 200):
        self._clients: List[queue.Queue] = []
        self._history: List[Dict[str, Any]] = []
        self._history_limit = history
        self._lock = threading.Lock()

    def publish(self, event: Dict[str, Any]) -> None:
        with self._lock:
            self._history.append(event)
            del self._history[: -self._history_limit]
            for q in list(self._clients):
                try:
                    q.put_nowait(event)
                except queue.Full:
                    pass

    def subscribe(self) -> queue.Queue:
        q: queue.Queue = queue.Queue(maxsize=256)
        with self._lock:
            for event in self._history[-20:]:
                q.put_nowait(event)
            self._clients.append(q)
        return q

    def unsubscribe(self, q: queue.Queue) -> None:
        with self._lock:
            if q in self._clients:
                self._clients.remove(q)


def create_server(
    host: str = "127.0.0.1",
    port: int = 8005,
    audit_path: Optional[str] = None,
    state_dir: Optional[str] = None,
) -> ThreadingHTTPServer:
    from .audit import AuditLog
    from .store import ConfigStore, default_state_dir

    state_dir = state_dir or default_state_dir()
    keeper = ProcessKeeper(state_dir=state_dir)
    configs = ConfigStore(state_dir)
    audit = AuditLog(audit_path)
    sse = SSEManager()
    keeper.add_listener(sse.publish)
    from .accounts import QuotaExceeded, UserStore

    users = UserStore(state_dir)
    job_owners: Dict[str, str] = {}

    class Handler(BaseHTTPRequestHandler):
        server_version = "simpletuner-tpu"

        # ---- plumbing -------------------------------------------------------------------
        def log_message(self, fmt, *args):
            logger.debug("%s " + fmt, self.address_string(), *args)

        def _json(self, payload: Any, status: int = 200) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> Dict[str, Any]:
            length = int(self.headers.get("Content-Length", 0) or 0)
            if not length:
                return {}
            return json.loads(self.rfile.read(length) or b"{}")

        def _html(self, body: str, status: int = 200) -> None:
            data = body.encode()
            self.send_response(status)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _static(self, name: str) -> None:
            """Serve the bundled WebUI (reference: simpletuner/static/ +
            templates/ trainer dashboard, rebuilt as static vanilla JS)."""
            base = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")
            full = os.path.normpath(os.path.join(base, name))
            if not full.startswith(base) or not os.path.isfile(full):
                return self._json({"error": "not found"}, 404)
            ctype = {
                ".html": "text/html; charset=utf-8",
                ".js": "application/javascript; charset=utf-8",
                ".css": "text/css; charset=utf-8",
            }.get(os.path.splitext(full)[1], "application/octet-stream")
            with open(full, "rb") as fh:
                data = fh.read()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _auth(self):
            """Bearer auth (reference users/auth routes): active once any user
            exists.  Returns the user dict, or None with a 401 already sent."""
            if not users.auth_required:
                return {"username": "anonymous", "role": "admin"}
            user = users.authenticate(self.headers.get("Authorization"))
            if user is None:
                self._json({"error": "unauthorized"}, 401)
                return None
            return user

        # ---- GET --------------------------------------------------------------------------
        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/health":
                return self._json({"status": "ok", "time": time.time()})
            # static WebUI assets are public (the JSON APIs they call stay
            # behind bearer auth, like the reference's login-gated dashboard)
            if path in ("/", "/ui"):
                return self._static("index.html")
            if path.startswith("/static/"):
                return self._static(path[len("/static/"):])
            user = self._auth()
            if user is None:
                return
            if path == "/api/users":
                if user["role"] != "admin":
                    return self._json({"error": "admin only"}, 403)
                return self._json(users.list_users())
            if path == "/api/quota":
                usage = users.usage(user["username"])
                return self._json(usage or {"username": user["username"], "quotas": None})
            if path == "/metrics":
                # Prometheus text exposition (reference
                # server/services/cloud/prometheus_metrics.py)
                states: Dict[str, int] = {}
                for job in keeper.jobs.values():
                    states[job.state] = states.get(job.state, 0) + 1
                lines = [
                    "# HELP simpletuner_jobs_total Jobs by state",
                    "# TYPE simpletuner_jobs_total gauge",
                ]
                for state_name in ("pending", "running", "completed", "failed", "cancelled"):
                    lines.append(
                        f'simpletuner_jobs_total{{state="{state_name}"}} {states.get(state_name, 0)}'
                    )
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if path == "/api/models":
                from ..models.registry import ModelRegistry

                return self._json(
                    {f: ModelRegistry.metadata(f) for f in ModelRegistry.families()}
                )
            match = re.match(r"^/api/models/([\w-]+)/presets$", path)
            if match:
                # per-family acceleration presets (reference
                # get_acceleration_presets flux/model.py:122-229)
                from ..models.registry import ModelRegistry

                try:
                    cls = ModelRegistry.get(match.group(1))
                except KeyError:
                    return self._json({"error": "unknown model family"}, status=404)
                return self._json(cls.get_acceleration_presets())
            if path == "/api/optimizers":
                from ..training.optimizers import optimizer_names

                return self._json(list(optimizer_names()))
            if path == "/api/training/jobs":
                return self._json(keeper.list_jobs())
            match = re.match(r"^/api/training/status/([\w-]+)$", path)
            if match:
                job = keeper.get_job(match.group(1))
                if job is None:
                    return self._json({"error": "unknown job"}, 404)
                return self._json(job.to_dict())
            match = re.match(r"^/api/training/logs/([\w-]+)$", path)
            if match:
                job = keeper.get_job(match.group(1))
                if job is None:
                    return self._json({"error": "unknown job"}, 404)
                tail = 100
                if "tail=" in self.path:
                    tail = int(self.path.split("tail=")[1].split("&")[0])
                return self._json({"job_id": job.job_id, "logs": list(job.logs)[-tail:]})
            if path == "/api/events":
                return self._sse()
            if path == "/api/fields":
                # canonical config-field schema powering CLI + WebUI forms
                # (reference services/field_registry/registry.py)
                from ..configuration.fields import REGISTRY

                return self._json(
                    [
                        {
                            "name": f.name,
                            "type": f.type.value,
                            "default": f.default,
                            "help": f.help,
                            "section": f.section,
                            "choices": list(f.choices) if f.choices else None,
                        }
                        for f in REGISTRY.fields()
                    ]
                )
            if path == "/api/configs":
                return self._json(configs.list())
            match = re.match(r"^/api/configs/([\w.-]+)/versions$", path)
            if match:
                return self._json(configs.versions(match.group(1)))
            match = re.match(r"^/api/configs/([\w.-]+)$", path)
            if match:
                version = None
                if "version=" in self.path:
                    version = int(self.path.split("version=")[1].split("&")[0])
                entry = configs.get(match.group(1), version)
                if entry is None:
                    return self._json({"error": "unknown config"}, 404)
                return self._json(entry)
            if path == "/api/audit":
                # audit trail with chain verification (reference
                # documentation/experimental/server/AUDIT.md)
                ok, bad = audit.verify()
                return self._json({"verified": ok, "first_bad_seq": bad, "records": audit.records()})
            return self._json({"error": "not found"}, 404)

        def _sse(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            q = sse.subscribe()
            try:
                while True:
                    try:
                        event = q.get(timeout=15.0)
                        payload = f"data: {json.dumps(event)}\n\n"
                    except queue.Empty:
                        payload = ": keepalive\n\n"
                    self.wfile.write(payload.encode())
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass
            finally:
                sse.unsubscribe(q)

        # ---- POST -------------------------------------------------------------------------
        def do_POST(self):
            path = self.path.split("?")[0]
            try:
                body = self._read_body()
            except (ValueError, json.JSONDecodeError):
                return self._json({"error": "invalid json"}, 400)
            user = self._auth()
            if user is None:
                return

            if path == "/api/users":
                # bootstrap: the first user may be created unauthenticated and
                # becomes the admin; afterwards admin-only
                if users.auth_required and user["role"] != "admin":
                    return self._json({"error": "admin only"}, 403)
                try:
                    created = users.create_user(
                        str(body.get("username") or "").strip() or "admin",
                        role=body.get("role") or ("admin" if not users.auth_required else "user"),
                        max_concurrent_jobs=int(body.get("max_concurrent_jobs", 2)),
                        max_total_steps=body.get("max_total_steps"),
                    )
                except ValueError as exc:
                    return self._json({"error": str(exc)}, 422)
                audit.append("user.create", detail={"username": created["username"]})
                return self._json(created, 201)

            if path == "/api/config/validate":
                from ..configuration import TrainingConfig

                try:
                    TrainingConfig(dict(body.get("config") or body))
                    return self._json({"valid": True})
                except Exception as exc:
                    return self._json({"valid": False, "error": str(exc)}, 422)

            if path == "/api/training/start":
                config = body.get("config") or body
                if not config.get("model_family"):
                    return self._json({"error": "config.model_family required"}, 422)
                if users.auth_required:
                    active = sum(
                        1 for j in keeper.jobs.values()
                        if j.state in ("pending", "running")
                        and job_owners.get(j.job_id) == user["username"]
                    )
                    try:
                        users.check_quota(user["username"], config, active)
                    except QuotaExceeded as exc:
                        audit.append("job.quota_denied", detail={"user": user["username"]})
                        return self._json({"error": str(exc)}, 429)
                    users.record_submission(user["username"], config)
                job = keeper.submit_job(config, body.get("job_id"))
                job_owners[job.job_id] = user["username"]
                audit.append("job.submit", detail={"job_id": job.job_id,
                                                   "user": user["username"],
                                                   "model_family": config.get("model_family")})
                return self._json(job.to_dict(), 201)

            match = re.match(r"^/api/training/cancel/([\w-]+)$", path)
            if match:
                ok = keeper.cancel_job(match.group(1))
                if ok:
                    audit.append("job.cancel", detail={"job_id": match.group(1)})
                return self._json({"cancelled": ok}, 200 if ok else 404)

            match = re.match(r"^/api/training/signal/([\w-]+)$", path)
            if match:
                action = (body.get("action") or "").strip()
                if action not in ("validation", "checkpoint", "abort"):
                    return self._json({"error": "action must be validation|checkpoint|abort"}, 422)
                ok = keeper.send_signal(match.group(1), action)
                if ok:
                    audit.append("job.signal", detail={"job_id": match.group(1), "action": action})
                return self._json({"signalled": ok}, 200 if ok else 404)

            if path == "/api/events/callback":
                sse.publish(body)
                return self._json({"received": True})

            match = re.match(r"^/api/configs/([\w.-]+)$", path)
            if match:
                config = body.get("config") or body
                result = configs.save(match.group(1), dict(config))
                audit.append("config.save", detail=result)
                return self._json(result, 201)

            if path == "/api/datasets/plan":
                # parsed dataset plan (reference routes: datasets + dataset
                # blueprints): validates a multidatabackend config and returns
                # the resolved per-dataset summary without touching storage
                from ..configuration.dataloader import load_dataloader_config

                try:
                    datasets = load_dataloader_config(body.get("config") or body.get("datasets") or body)
                except Exception as exc:
                    return self._json({"valid": False, "error": str(exc)}, 422)
                return self._json(
                    {
                        "valid": True,
                        "datasets": [
                            {
                                "id": d.id,
                                "dataset_type": d.dataset_type,
                                "type": d.type,
                                "resolution": getattr(d, "resolution", None),
                                "crop": getattr(d, "crop", None),
                                "caption_strategy": getattr(d, "caption_strategy", None),
                            }
                            for d in datasets
                        ],
                    }
                )

            return self._json({"error": "not found"}, 404)

    server = ThreadingHTTPServer((host, port), Handler)
    server.keeper = keeper  # type: ignore[attr-defined]
    server.sse = sse  # type: ignore[attr-defined]
    server.audit = audit  # type: ignore[attr-defined]
    return server


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    parser = argparse.ArgumentParser("simpletuner-tpu server")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8005)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    server = create_server(args.host, args.port)
    logger.info("training API listening on %s:%d", args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
