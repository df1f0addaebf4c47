"""Smoke coverage for scripts/full_scale_sanity.py (VERDICT r2 Weak #5):
the full pipeline — synthesize BFL checkpoint at module shapes → production
importer → host int8 quantization → real train steps — at tiny arch.  The
full 11.9B run is operator-invoked (python scripts/full_scale_sanity.py);
this pins the plumbing so the at-scale run can't rot."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sanity_script_tiny(tmp_path):
    env = dict(os.environ)
    env.update(
        FULL_SCALE_ARCH="tiny",
        FULL_SCALE_RES="64",
        FULL_SCALE_SCRATCH=str(tmp_path),
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "full_scale_sanity.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] is True
    assert result["leaves_validated"] > 50
    assert all(abs(x) < 1e4 for x in result["losses"])
    # checkpoint cleaned up unless FULL_SCALE_KEEP
    assert not os.path.exists(tmp_path / "flux1-synth.safetensors")
