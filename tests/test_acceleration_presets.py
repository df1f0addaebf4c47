"""Per-family acceleration presets (reference get_acceleration_presets
flux/model.py:122-229: declarative VRAM/speed tradeoff presets for the UI).
Our TPU equivalents carry remat policy / int8 base / quantized optimizer /
fsdp overrides; exposed at GET /api/models/<family>/presets."""

import http.client
import json
import threading

import pytest

from simpletuner_tpu.configuration.fields import REGISTRY
from simpletuner_tpu.models.registry import ModelRegistry


def test_every_family_has_presets_with_valid_fields():
    known_fields = set(REGISTRY.names())
    for family in ModelRegistry.families():
        presets = ModelRegistry.get(family).get_acceleration_presets()
        assert presets, family
        names = [p["name"] for p in presets]
        assert len(names) == len(set(names)), f"{family}: duplicate preset names"
        for preset in presets:
            assert preset["description"] and preset["tradeoff"], (family, preset["name"])
            for key in preset["config"]:
                assert key in known_fields, (family, preset["name"], key)


def test_flux_measured_preset_present():
    presets = ModelRegistry.get("flux").get_acceleration_presets()
    by_name = {p["name"]: p for p in presets}
    assert "v5e-16g-12b-lora" in by_name
    assert by_name["v5e-16g-12b-lora"]["config"]["base_model_precision"] == "int8"
    # generic tiers come from the base class
    assert {"speed", "balanced", "memory", "multichip"} <= set(by_name)


@pytest.fixture()
def server(tmp_path):
    from simpletuner_tpu.server.app import create_server

    srv = create_server(port=0, state_dir=str(tmp_path))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_presets_endpoint(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=10)
    conn.request("GET", "/api/models/flux/presets")
    resp = conn.getresponse()
    assert resp.status == 200
    presets = json.loads(resp.read())
    assert any(p["name"] == "v5e-16g-12b-lora" for p in presets)

    conn.request("GET", "/api/models/not-a-family/presets")
    assert conn.getresponse().status == 404
