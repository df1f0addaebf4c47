"""Self-enforcing field-wiring ledger: every registry field is either read by
code (by name or alias) or explicitly classified in configuration/wiring.py —
accept-and-ignore fields cannot silently accumulate (VERDICT fail-loud
principle)."""

import logging
import os
import re

from simpletuner_tpu.configuration.fields import REGISTRY
from simpletuner_tpu.configuration.wiring import NOOP_ON_TPU, UNIMPLEMENTED

PKG = os.path.join(os.path.dirname(__file__), "..", "simpletuner_tpu")


def _code_corpus() -> str:
    chunks = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, PKG)
            if rel.startswith("configuration/fields") or rel == "configuration/wiring.py":
                continue
            with open(path, errors="replace") as handle:
                chunks.append(handle.read())
    return "\n".join(chunks)


def test_every_field_wired_or_classified():
    corpus = _code_corpus()
    unaccounted = []
    for field in REGISTRY.fields():
        names = [field.name] + list(getattr(field, "aliases", ()) or ())
        wired = any(name in corpus for name in names)
        classified = field.name in NOOP_ON_TPU or field.name in UNIMPLEMENTED
        if not wired and not classified:
            unaccounted.append(field.name)
    assert not unaccounted, (
        "fields accepted by the registry but neither read in code nor "
        f"classified in configuration/wiring.py: {unaccounted}"
    )


def test_unimplemented_reasons_are_not_stale():
    """Converse enforcement: a field carrying a non-empty UNIMPLEMENTED reason
    must NOT be read anywhere in the package — otherwise the ledger emits a
    false "has NO effect" warning for a knob that actually works (the round-3
    checkpoint_epoch_interval drift). Wired fields keep a "" reason."""
    corpus = _code_corpus()
    stale = [
        name
        for name, reason in UNIMPLEMENTED.items()
        if reason and name in corpus
    ]
    assert not stale, (
        "fields listed UNIMPLEMENTED (non-empty reason) but referenced by name "
        f"in package code — flip the ledger entry to '' (wired): {stale}"
    )


def test_no_field_in_both_tables():
    both = set(NOOP_ON_TPU) & set(UNIMPLEMENTED)
    assert not both, f"fields classified twice: {sorted(both)}"


def test_classified_names_exist_in_registry():
    known = {f.name for f in REGISTRY.fields()}
    for name in list(NOOP_ON_TPU) + list(UNIMPLEMENTED):
        assert name in known, f"wiring ledger names unknown field {name!r}"


def test_unimplemented_field_warns(caplog):
    from simpletuner_tpu.configuration import TrainingConfig

    with caplog.at_level(logging.WARNING):
        TrainingConfig({
            "model_family": "flux", "optimizer": "adamw",
            "learning_rate": 1e-4, "max_train_steps": 1,
            # lr_scale is a permanent redirect (scale learning_rate
            # directly) — unlike round-5-wired knobs it stays unwired
            "lr_scale": 2.0,
        })
    assert any("lr_scale" in rec.message and "NO effect" in rec.message
               for rec in caplog.records), "unwired field set without a warning"


def test_wired_fields_do_not_warn(caplog):
    from simpletuner_tpu.configuration import TrainingConfig

    with caplog.at_level(logging.WARNING):
        TrainingConfig({
            "model_family": "flux", "optimizer": "adamw",
            "learning_rate": 1e-4, "max_train_steps": 1,
            "lora_rank": 8, "noise_offset": 0.05,
        })
    assert not any("NO effect" in rec.message for rec in caplog.records)
