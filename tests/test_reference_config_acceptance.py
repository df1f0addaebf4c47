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


def test_field_registry_covers_reference_surface():
    """>=95% of the reference's field-registry names must be accepted
    (VERDICT r1 Next #9: 233 -> 424+ gap closed via fields_extended)."""
    import ast
    import pathlib

    from simpletuner_tpu.configuration.fields import REGISTRY

    ref_root = pathlib.Path("/root/reference/simpletuner")
    if not ref_root.exists():
        import pytest

        pytest.skip("reference checkout not available")
    names = set()
    for base in (
        ref_root / "simpletuner_sdk/server/services/field_registry",
        ref_root / "helpers/models/field_registry",
    ):
        for f in base.rglob("*.py"):
            try:
                tree = ast.parse(f.read_text())
            except SyntaxError:
                continue
            for node in ast.walk(tree):
                if isinstance(node, ast.Call) and getattr(
                    node.func, "id", getattr(node.func, "attr", "")
                ) == "ConfigField":
                    for k in node.keywords:
                        if k.arg == "name" and isinstance(k.value, ast.Constant):
                            names.add(k.value.value)
    ours = set(REGISTRY.names())
    accepted = {n for n in names if n in ours or REGISTRY.resolve_name(n) in ours}
    coverage = len(accepted) / max(len(names), 1)
    missing = sorted(names - accepted)
    assert coverage >= 0.95, f"field coverage {coverage:.1%}; missing {missing[:20]}"
