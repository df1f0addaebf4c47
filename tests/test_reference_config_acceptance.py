"""Parity check: the reference's example configs must parse/validate through
our TrainingConfig (SURVEY.md §7: 'CLI/config acceptance of the reference's
example configs').  Skipped when the reference checkout is absent."""

import glob
import json
import os

import pytest

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.registry import ModelRegistry

REFERENCE_EXAMPLES = "/root/reference/simpletuner/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_EXAMPLES), reason="reference checkout not mounted"
)


def _example_configs():
    return sorted(glob.glob(os.path.join(REFERENCE_EXAMPLES, "*", "config.json")))


def _implemented(config):
    family = config.get("model_family")
    try:
        ModelRegistry.metadata(family)
        return True
    except KeyError:
        return False


def test_reference_examples_parse():
    configs = _example_configs()
    assert len(configs) > 50
    parsed = 0
    accepted = 0
    failures = []
    for path in configs:
        try:
            with open(path) as handle:
                raw = json.load(handle)
        except json.JSONDecodeError:
            continue  # one upstream example ships broken JSON (trailing comma)
        parsed += 1
        if not _implemented(raw):
            continue
        try:
            TrainingConfig(dict(raw))
            accepted += 1
        except Exception as exc:
            failures.append((os.path.basename(os.path.dirname(path)), str(exc)))
    # every example whose family we implement must be accepted verbatim
    assert not failures, f"rejected reference configs: {failures[:5]}"
    assert accepted >= 25, f"only {accepted} reference configs cover implemented families"


def test_implemented_family_coverage_of_examples():
    families = set()
    for path in _example_configs():
        try:
            with open(path) as handle:
                families.add(json.load(handle).get("model_family"))
        except json.JSONDecodeError:
            continue
    implemented = {f for f in families if f and _implemented(f and {"model_family": f})}
    # we should cover a majority of the families the reference ships examples for
    coverage = len(implemented) / max(len(families), 1)
    assert coverage >= 0.7, f"family coverage {coverage:.0%} ({sorted(implemented)} of {sorted(families)})"
