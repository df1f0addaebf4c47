"""Factory golden-fixture suite (reference tests/fixtures/factory_golden/
configs/ incl. deliberate error configs; VERDICT r2 Weak #8): every fixture
declares its expected outcome — `valid` with the resolved dataset ids /
ordering, or `error` with the exact message substring the parser must raise.
Runs the same `load_dataloader_config` path the trainer, server
`/api/datasets/plan`, and `validate-config` CLI all use."""

import json
import os

import pytest

from simpletuner_tpu.configuration.dataloader import (
    DataloaderConfigError,
    load_dataloader_config,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "factory_golden", "configs"
)
FIXTURES = sorted(f for f in os.listdir(FIXTURE_DIR) if f.endswith(".json"))


def _load(name):
    with open(os.path.join(FIXTURE_DIR, name)) as fh:
        return json.load(fh)


def test_fixture_inventory_covers_error_cases():
    """The suite must keep deliberate error configs (golden-error coverage)."""
    errors = [f for f in FIXTURES if f.startswith("error_")]
    valid = [f for f in FIXTURES if not f.startswith("error_")]
    assert len(errors) >= 8 and len(valid) >= 4


@pytest.mark.parametrize("name", FIXTURES)
def test_golden_fixture(name):
    fixture = _load(name)
    expect = fixture["expect"]
    if expect == "valid":
        datasets = load_dataloader_config(fixture["datasets"])
        ids = [d.id for d in datasets]
        if "expect_ids" in fixture:
            assert sorted(ids) == sorted(fixture["expect_ids"])
        constraint = fixture.get("expect_order_constraint")
        if constraint:
            assert ids.index(constraint["before"]) < ids.index(constraint["after"]), (
                f"dependency sort violated: {ids}"
            )
    elif expect == "error":
        with pytest.raises(DataloaderConfigError) as excinfo:
            load_dataloader_config(fixture["datasets"])
        assert fixture["expect_error"] in str(excinfo.value), (
            f"{name}: expected {fixture['expect_error']!r} in {excinfo.value}"
        )
    else:  # pragma: no cover - malformed fixture
        pytest.fail(f"{name}: unknown expect {expect!r}")


def test_error_messages_name_the_dataset():
    """Every per-dataset validation error is prefixed with the dataset id so
    multi-backend configs remain debuggable (reference factory error style)."""
    bad = [
        {"id": "alpha", "type": "gcs", "dataset_type": "image", "instance_data_dir": "/a"},
        {"id": "embeds", "type": "local", "dataset_type": "text_embeds", "default": True},
    ]
    with pytest.raises(DataloaderConfigError, match="alpha:"):
        load_dataloader_config(bad)


def test_all_errors_reported_at_once():
    """Validation aggregates every problem into one raise, not first-failure."""
    bad = [
        {"id": "a", "type": "gcs", "dataset_type": "image", "instance_data_dir": "/x"},
        {"id": "b", "type": "local", "dataset_type": "image"},
        {"id": "embeds", "type": "local", "dataset_type": "text_embeds", "default": True},
    ]
    with pytest.raises(DataloaderConfigError) as excinfo:
        load_dataloader_config(bad)
    message = str(excinfo.value)
    assert "unknown backend type" in message and "requires instance_data_dir" in message
