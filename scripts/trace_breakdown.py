"""Aggregate a jax.profiler xplane trace into a flagship ms breakdown.

Usage:
    BENCH_PROFILE_DIR=/tmp/flagship_profile python bench.py
    python scripts/trace_breakdown.py /tmp/flagship_profile

Parses the TPU device plane with xprof's hlo_stats tool and buckets HLO
self-time two ways:

* by what the op computes (category: MXU fusions, loop fusions, flash-attention
  custom calls, copies, collectives, ...)
* by which phase of the step owns it (the JAX scope in the framework op name:
  forward, backward via transpose(jvp(...)), remat recompute via rematted
  scopes, optimizer update, loss/prepare)

The reference's equivalent is torch.profiler's key_averages table
(SURVEY §5.1); on TPU the xplane is the ground truth.
"""

from __future__ import annotations

import glob
import json
import sys
from collections import defaultdict


def find_xplane(log_dir: str) -> str:
    hits = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {log_dir}")
    return hits[-1]


def category_bucket(category: str, tf_op: str, expr: str) -> str:
    s = f"{category} {tf_op}".lower()
    if "custom-call" in category.lower() or "flash" in s or "pallas" in s:
        return "flash attention (pallas)"
    if "all-reduce" in s or "all-gather" in s or "reduce-scatter" in s:
        return "collectives"
    if "convolution" in category.lower() or "dot" in category.lower() or "matmul" in s:
        # int8 MXU contractions show up as convolution-fusion/dot with s8 operands
        return "matmuls/MXU (s8 in expr)" if " s8[" in expr or "s8[" in expr[:400] else "matmuls/MXU (bf16/f32)"
    if "copy" in category.lower() or "transpose" in category.lower():
        return "copies/layout"
    if "fusion" in category.lower():
        return "elementwise fusions"
    return category or "other"


def phase_bucket(tf_op: str) -> str:
    s = tf_op.lower()
    if "transpose(jvp" in s or "transpose(remat" in s:
        return "backward"
    if "remat" in s:
        return "remat recompute"
    if "adam" in s or "optimizer" in s or "scale_by" in s:
        return "optimizer"
    if "jvp(" in s or "transformer" in s:
        return "forward"
    return "other (prepare/loss/infra)"


def main() -> None:
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_profile"
    xplane = find_xplane(log_dir)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats", {})
    table = json.loads(data.decode() if isinstance(data, bytes) else data)
    col_ids = [c["id"] for c in table["cols"]]
    idx = {name: col_ids.index(name) for name in (
        "category", "hlo_op_name", "hlo_op_expression", "tf_op_name",
        "total_self_time", "occurrences",
    )}

    cats: dict = defaultdict(float)
    phases: dict = defaultdict(float)
    top: list = []
    total = 0.0
    for row in table["rows"]:
        cells = row["c"]

        def val(name):
            cell = cells[idx[name]]
            return cell.get("v") if cell else None

        t = float(val("total_self_time") or 0.0)  # microseconds
        category = str(val("category") or "")
        tf_op = str(val("tf_op_name") or "")
        expr = str(val("hlo_op_expression") or "")[:600]
        cats[category_bucket(category, tf_op, expr)] += t
        phases[phase_bucket(tf_op)] += t
        total += t
        top.append((t, str(val("hlo_op_name") or ""), category, tf_op[:160]))

    top.sort(reverse=True)
    out = {
        "total_device_ms": round(total / 1e3, 1),
        "by_compute_ms": {k: round(v / 1e3, 1) for k, v in sorted(cats.items(), key=lambda kv: -kv[1])},
        "by_compute_pct": {k: round(100 * v / max(total, 1e-9), 1) for k, v in sorted(cats.items(), key=lambda kv: -kv[1])},
        "by_phase_ms": {k: round(v / 1e3, 1) for k, v in sorted(phases.items(), key=lambda kv: -kv[1])},
        "by_phase_pct": {k: round(100 * v / max(total, 1e-9), 1) for k, v in sorted(phases.items(), key=lambda kv: -kv[1])},
    }
    print(json.dumps(out, indent=2))
    print("\ntop 30 self-time ops:", file=sys.stderr)
    for t, name, category, tf_op in top[:30]:
        print(f"  {t/1e3:9.2f} ms  {category:22s} {name[:40]:40s} {tf_op}", file=sys.stderr)


if __name__ == "__main__":
    main()
