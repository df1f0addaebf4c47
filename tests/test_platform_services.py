"""Platform depth: orgs, approvals, fair-share queue, pricing, notifications,
external auth (reference simpletuner_sdk/server routes orgs/approvals/
external_auth + cloud queue/cost services, SURVEY.md §2.7)."""

import http.client
import json
import socket
import threading
import time

import pytest

from simpletuner_tpu.server.app import create_server
from simpletuner_tpu.server.external_auth import (
    ExternalAuthError,
    FileDirectory,
    LDAPDirectory,
    OIDCVerifier,
    make_hs256_token,
)
from simpletuner_tpu.server.jobqueue import FairShareQueue, QueueEntry
from simpletuner_tpu.server.notifications import NotificationCenter
from simpletuner_tpu.server.orgs import OrgStore
from simpletuner_tpu.server.pricing import PricingTable


@pytest.fixture()
def server(tmp_path):
    srv = create_server("127.0.0.1", 0, state_dir=str(tmp_path))
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, port
    srv.run_queue.close()
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


# ---- fair-share queue (unit) ------------------------------------------------------------


class TestFairShareQueue:
    def _make(self, tmp_path, slots=0):
        dispatched = []
        state = {"slots": slots}
        q = FairShareQueue(
            dispatch=lambda e: dispatched.append(e.job_id),
            slots_free=lambda: state["slots"],
            state_dir=str(tmp_path),
            poll_interval=0.02,
        )
        return q, dispatched, state

    def test_priority_order(self, tmp_path):
        q, dispatched, state = self._make(tmp_path)
        q.enqueue(QueueEntry("low", {}, "a", priority=1))
        q.enqueue(QueueEntry("high", {}, "b", priority=9))
        q.enqueue(QueueEntry("mid", {}, "c", priority=5))
        assert [e["job_id"] for e in q.pending()] == ["high", "mid", "low"]
        state["slots"] = 3
        q.kick()
        deadline = time.time() + 5
        while len(dispatched) < 3 and time.time() < deadline:
            time.sleep(0.02)
        assert dispatched == ["high", "mid", "low"]
        q.close()

    def test_fair_share_tiebreak(self, tmp_path):
        q, _, _ = self._make(tmp_path)
        # heavy user consumed an hour of compute; light user none
        q.record_usage("heavy", 3600.0)
        q.enqueue(QueueEntry("h1", {}, "heavy", priority=4))
        q.enqueue(QueueEntry("l1", {}, "light", priority=4))
        assert [e["job_id"] for e in q.pending()] == ["l1", "h1"]
        # FIFO among same owner/priority
        q.enqueue(QueueEntry("l2", {}, "light", priority=4))
        assert [e["job_id"] for e in q.pending()] == ["l1", "l2", "h1"]
        q.close()

    def test_usage_decays(self, tmp_path):
        q, _, _ = self._make(tmp_path)
        q.record_usage("u", 1000.0)
        # pin the recorded timestamp 2 half-lives into the past
        q._usage["u"]["at"] -= 7200.0
        assert q.usage_snapshot()["u"] == pytest.approx(250.0, rel=0.01)
        q.close()

    def test_persistence(self, tmp_path):
        q, _, _ = self._make(tmp_path)
        q.enqueue(QueueEntry("persist-me", {"a": 1}, "u", priority=7))
        q.close()
        q2, _, _ = self._make(tmp_path)
        pending = q2.pending()
        assert pending and pending[0]["job_id"] == "persist-me"
        assert pending[0]["priority"] == 7 and pending[0]["config"] == {"a": 1}
        q2.close()


# ---- orgs + approvals (http) ------------------------------------------------------------


def test_org_lifecycle_and_approval_flow(server):
    srv, port = server
    # bootstrap admin + a member user
    _, admin = _request(port, "POST", "/api/users", {"username": "root"})
    at = admin["token"]
    _, member = _request(port, "POST", "/api/users", {"username": "alice"}, token=at)
    mt = member["token"]

    # create org with approval policy, add member
    status, org = _request(port, "POST", "/api/orgs",
                           {"name": "research", "require_approval": True,
                            "monthly_budget_usd": 100.0}, token=at)
    assert status == 201 and org["require_approval"]
    status, org = _request(port, "POST", "/api/orgs/research/members",
                           {"username": "alice"}, token=at)
    assert status == 201 and "alice" in org["members"]

    # member submission is gated behind approval
    config = {"model_family": "definitely-not-a-model", "max_train_steps": 1}
    status, data = _request(port, "POST", "/api/training/start",
                            {"config": config}, token=mt)
    assert status == 202 and data["state"] == "awaiting_approval"
    approval_id = data["approval_id"]

    # member cannot approve their own job
    status, _ = _request(port, "POST", f"/api/approvals/{approval_id}/approve",
                         {}, token=mt)
    assert status == 403

    # admin sees it pending, approves -> job enters the queue
    status, pending = _request(port, "GET", "/api/approvals?state=pending", token=at)
    assert status == 200 and pending[0]["approval_id"] == approval_id
    status, record = _request(port, "POST", f"/api/approvals/{approval_id}/approve",
                              {}, token=at)
    assert status == 200 and record["state"] == "approved" and record["job_id"]
    job_id = record["job_id"]
    status, info = _request(port, "GET", f"/api/training/status/{job_id}", token=at)
    assert status == 200 and info["owner"] == "alice"
    # double-decide is rejected
    status, _ = _request(port, "POST", f"/api/approvals/{approval_id}/reject", {}, token=at)
    assert status == 409
    # don't burn CPU on the spawned trainer
    _request(port, "POST", f"/api/training/cancel/{job_id}", {}, token=at)

    # alice got an approval notification in her inbox
    status, inbox = _request(port, "GET", "/api/notifications", token=mt)
    assert status == 200 and any(n["kind"] == "job_approved" for n in inbox)

    # rejection path
    status, data = _request(port, "POST", "/api/training/start",
                            {"config": config}, token=mt)
    approval_id = data["approval_id"]
    status, record = _request(port, "POST", f"/api/approvals/{approval_id}/reject",
                              {"reason": "budget"}, token=at)
    assert status == 200 and record["state"] == "rejected"
    status, inbox = _request(port, "GET", "/api/notifications?unread=1", token=mt)
    assert any(n["kind"] == "job_rejected" for n in inbox)
    # mark all read
    status, marked = _request(port, "POST", "/api/notifications/read", {}, token=mt)
    assert marked["marked"] >= 1


def test_org_quota_and_member_management(server):
    srv, port = server
    _, admin = _request(port, "POST", "/api/users", {"username": "root"})
    at = admin["token"]
    _, bob = _request(port, "POST", "/api/users", {"username": "bob"}, token=at)
    status, _ = _request(port, "POST", "/api/orgs",
                         {"name": "capped", "max_total_steps": 5, "owner": "bob"},
                         token=at)
    assert status == 201
    # org step budget blocks a too-large submission
    status, data = _request(port, "POST", "/api/training/start",
                            {"config": {"model_family": "flux", "max_train_steps": 50}},
                            token=bob["token"])
    assert status == 429 and "step budget" in data["error"]
    # removing the last owner is refused
    status, data = _request(port, "DELETE", "/api/orgs/capped/members/bob", token=at)
    assert status == 409
    # org admins (not plain members) manage membership
    status, _ = _request(port, "POST", "/api/orgs/capped/members",
                         {"username": "root", "role": "admin"}, token=at)
    assert status == 201
    status, data = _request(port, "DELETE", "/api/orgs/capped", token=at)
    assert status == 200 and data["deleted"]


# ---- pricing ----------------------------------------------------------------------------


def test_pricing_estimate_and_rates(server, tmp_path):
    srv, port = server
    status, rates = _request(port, "GET", "/api/pricing")
    assert status == 200 and rates["v5e"] == pytest.approx(1.2)
    config = {"model_family": "flux", "max_train_steps": 3600,
              "estimated_step_seconds": 1.0, "num_chips": 8,
              "accelerator_type": "v5e"}
    status, est = _request(port, "POST", "/api/costs/estimate", {"config": config})
    assert status == 200
    assert est["estimated_hours"] == pytest.approx(1.0)
    assert est["estimated_cost_usd"] == pytest.approx(8 * 1.2)
    # unknown accelerator fails loudly, no silent default rate
    status, data = _request(port, "POST", "/api/costs/estimate",
                            {"config": {**config, "accelerator_type": "h100"}})
    assert status == 422 and "h100" in data["error"]
    # rate override persists
    status, rates = _request(port, "POST", "/api/pricing",
                             {"accelerator_type": "v5e", "usd_per_chip_hour": 2.0})
    assert status == 200 and rates["v5e"] == pytest.approx(2.0)
    assert PricingTable(str(tmp_path)).rates()["v5e"] == pytest.approx(2.0)


def test_actual_cost_accounting(tmp_path):
    pricing = PricingTable(str(tmp_path))
    cost = pricing.actual_cost({"accelerator_type": "v5p", "num_chips": 4}, 1800.0)
    assert cost == pytest.approx(0.5 * 4 * 4.20)
    orgs = OrgStore(str(tmp_path))
    orgs.create_org("team", owner="u", monthly_budget_usd=10.0)
    orgs.record_spend("u", 10.5)
    with pytest.raises(Exception, match="budget"):
        orgs.check_quota("u", {"max_train_steps": 1}, 0)


# ---- notifications ----------------------------------------------------------------------


class _FakeSMTP(threading.Thread):
    """Minimal RFC 5321 conversation: enough for smtplib.send_message."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.messages = []

    def run(self):
        conn, _ = self.sock.accept()
        fh = conn.makefile("rb")
        conn.sendall(b"220 fake ESMTP\r\n")
        data_mode, body = False, []
        while True:
            line = fh.readline()
            if not line:
                break
            if data_mode:
                if line.rstrip() == b".":
                    self.messages.append(b"\n".join(body).decode())
                    conn.sendall(b"250 ok\r\n")
                    data_mode, body = False, []
                else:
                    body.append(line.rstrip())
                continue
            cmd = line.decode().strip().upper()
            if cmd.startswith("EHLO") or cmd.startswith("HELO"):
                conn.sendall(b"250-fake\r\n250 ok\r\n")
            elif cmd.startswith("MAIL") or cmd.startswith("RCPT"):
                conn.sendall(b"250 ok\r\n")
            elif cmd.startswith("DATA"):
                conn.sendall(b"354 go\r\n")
                data_mode = True
            elif cmd.startswith("QUIT"):
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 ok\r\n")
        conn.close()


def test_notification_inbox_and_smtp(tmp_path):
    center = NotificationCenter(str(tmp_path))
    # inbox-only when no SMTP configured
    center.notify("u", "job.completed", "done")
    assert center.list("u")[0]["email"] is None
    # with SMTP + address, the email channel engages
    smtp = _FakeSMTP()
    smtp.start()
    center.configure_smtp({"host": "127.0.0.1", "port": smtp.port})
    center.set_address("u", "u@example.com")
    record = center.notify("u", "job.failed", "Job x failed", "details here")
    assert record["email"] == "sent"
    smtp.join(timeout=5)
    assert any("Job x failed" in m for m in smtp.messages)
    # bad address rejected
    with pytest.raises(ValueError):
        center.set_address("u", "not-an-email")
    # smtp failure is recorded, not raised (inbox remains source of truth)
    center.configure_smtp({"host": "127.0.0.1", "port": 1})  # nothing listens
    record = center.notify("u", "job.completed", "ok")
    assert record["email"].startswith("failed")
    assert len(center.list("u")) == 3


def test_job_finished_notification_via_server(server):
    """A finished (failed-fast) job notifies its owner through the keeper
    listener bridge."""
    srv, port = server
    _, admin = _request(port, "POST", "/api/users", {"username": "root"})
    at = admin["token"]
    status, job = _request(port, "POST", "/api/training/start",
                           {"config": {"model_family": "definitely-not-a-model",
                                       "max_train_steps": 1}}, token=at)
    assert status == 201
    deadline = time.time() + 120
    while time.time() < deadline:
        _, info = _request(port, "GET", f"/api/training/status/{job['job_id']}", token=at)
        if info["state"] in ("completed", "failed", "cancelled"):
            break
        time.sleep(0.5)
    assert info["state"] == "failed"
    deadline = time.time() + 10
    inbox = []
    while time.time() < deadline:
        _, inbox = _request(port, "GET", "/api/notifications", token=at)
        if inbox:
            break
        time.sleep(0.2)
    assert any(n["kind"] == "job.failed" for n in inbox)
    # cost accrued on the owner (rate may be 0 duration -> still recorded field)
    _, quota = _request(port, "GET", "/api/quota", token=at)
    assert "spend_usd" in quota["usage"]


# ---- external auth ----------------------------------------------------------------------


def _oidc_config(secret="s3cret"):
    return {"issuer": "https://idp.test", "audience": "simpletuner",
            "hs256_secret": secret, "admin_groups": ["tpu-admins"]}


def test_oidc_hs256_login_flow(server):
    srv, port = server
    _, admin = _request(port, "POST", "/api/users", {"username": "root"})
    at = admin["token"]
    status, _ = _request(port, "POST", "/api/auth/config",
                         {"oidc": _oidc_config()}, token=at)
    assert status == 200
    claims = {"iss": "https://idp.test", "aud": "simpletuner",
              "exp": time.time() + 300, "preferred_username": "carol",
              "email": "carol@example.com", "groups": ["tpu-admins"]}
    token = make_hs256_token(claims, "s3cret")
    status, account = _request(port, "POST", "/api/auth/oidc", {"id_token": token})
    assert status == 200 and account["username"] == "carol"
    assert account["role"] == "admin"  # group mapping
    # the minted bearer works
    status, _ = _request(port, "GET", "/api/models", token=account["token"])
    assert status == 200
    # token reuse: same user keeps the same bearer
    status, again = _request(port, "POST", "/api/auth/oidc", {"id_token": token})
    assert again["token"] == account["token"]
    # expired token rejected
    bad = make_hs256_token({**claims, "exp": time.time() - 10}, "s3cret")
    status, data = _request(port, "POST", "/api/auth/oidc", {"id_token": bad})
    assert status == 401 and "expired" in data["error"]
    # wrong signature rejected
    forged = make_hs256_token(claims, "other-secret")
    status, _ = _request(port, "POST", "/api/auth/oidc", {"id_token": forged})
    assert status == 401


def test_oidc_rs256_roundtrip(tmp_path):
    from cryptography.hazmat.primitives.asymmetric import padding, rsa
    from cryptography.hazmat.primitives import hashes

    from simpletuner_tpu.server.external_auth import _b64url_encode

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    numbers = key.public_key().public_numbers()
    jwks = {"keys": [{
        "kty": "RSA", "kid": "k1",
        "n": _b64url_encode(numbers.n.to_bytes((numbers.n.bit_length() + 7) // 8, "big")),
        "e": _b64url_encode(numbers.e.to_bytes(3, "big")),
    }]}
    jwks_path = tmp_path / "jwks.json"
    jwks_path.write_text(json.dumps(jwks))

    header = _b64url_encode(json.dumps({"alg": "RS256", "kid": "k1"}).encode())
    payload = _b64url_encode(json.dumps({
        "iss": "https://idp.test", "aud": "simpletuner",
        "exp": time.time() + 60, "sub": "dave"}).encode())
    signing_input = f"{header}.{payload}".encode()
    sig = key.sign(signing_input, padding.PKCS1v15(), hashes.SHA256())
    token = f"{header}.{payload}.{_b64url_encode(sig)}"

    verifier = OIDCVerifier({"issuer": "https://idp.test", "audience": "simpletuner",
                             "jwks_path": str(jwks_path)})
    claims = verifier.verify(token)
    assert verifier.identity(claims)["username"] == "dave"
    # flipped signature bit fails
    with pytest.raises(ExternalAuthError, match="signature"):
        verifier.verify(token[:-4] + ("AAAA" if token[-4:] != "AAAA" else "BBBB"))


def test_directory_login_and_ldap_gate(server, tmp_path):
    srv, port = server
    _, admin = _request(port, "POST", "/api/users", {"username": "root"})
    at = admin["token"]
    directory = FileDirectory(str(tmp_path / "directory.json"))
    directory.set_password("erin", "hunter2", groups=["eng"], email="erin@example.com")
    status, _ = _request(port, "POST", "/api/auth/config",
                         {"directory": {"type": "file",
                                        "path": str(tmp_path / "directory.json"),
                                        "admin_groups": ["eng-leads"]}}, token=at)
    assert status == 200
    status, account = _request(port, "POST", "/api/auth/login",
                               {"username": "erin", "password": "hunter2"})
    assert status == 200 and account["username"] == "erin" and account["role"] == "user"
    status, _ = _request(port, "POST", "/api/auth/login",
                         {"username": "erin", "password": "wrong"})
    assert status == 401
    # real LDAP without the lib: honest, named failure — no silent fallback
    with pytest.raises(ExternalAuthError, match="ldap3"):
        LDAPDirectory({"server": "ldap://x", "user_dn_template": "uid={username}"})
