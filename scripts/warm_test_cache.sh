#!/usr/bin/env bash
# Pre-populate the persistent XLA compile cache for the e2e test tier
# (tests/conftest.py keys the cache on a CPU-feature fingerprint — run this
# once per machine image before nightly `pytest -m e2e`).
#
# The e2e tier's compile cost is dominated by a handful of distinct tiny-model
# programs (one per family architecture + the trainer step); running one
# representative per family warms every cache entry the sweep needs.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/test_weight_export.py::test_export_import_round_trip -q
python -m pytest "tests/test_weight_export.py::test_full_pipeline_round_trip_all_families[flux]" \
                 "tests/test_weight_export.py::test_full_pipeline_round_trip_all_families[sdxl]" -q
python -m pytest tests/test_crepa.py -q -k "backbone and not e2e"
echo "compile cache warmed: $(du -sh "${JAX_TEST_COMPILE_CACHE:-/tmp/jax_test_compile_cache_*}" 2>/dev/null || true)"
