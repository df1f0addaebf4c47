"""Aggregate a jax.profiler xplane trace into a flagship ms breakdown.

Usage:
    BENCH_PROFILE_DIR=/tmp/flagship_profile python bench.py
    python scripts/trace_breakdown.py /tmp/flagship_profile

Parses the TPU device plane with tensorboard_plugin_profile's hlo_stats tool
and buckets self-time by what the op computes: flash-attention Pallas kernels,
MXU contractions (the base matmuls incl. the int8 s8xs8 path), dequant /
quantize elementwise fusions, optimizer update fusions, collectives, copies,
and everything else.  The reference's equivalent is torch.profiler's
key_averages table (SURVEY §5.1); on TPU the xplane is the ground truth.
"""

from __future__ import annotations

import csv
import glob
import io
import json
import sys
from collections import defaultdict


def find_xplane(log_dir: str) -> str:
    hits = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {log_dir}")
    return hits[-1]


def bucket_of(name: str, category: str, program: str) -> str:
    s = f"{name} {category} {program}".lower()
    if "flash" in s or "pallas" in s or "custom-call" in category.lower():
        return "attention (pallas flash)"
    if "all-reduce" in s or "all-gather" in s or "reduce-scatter" in s or "collective" in s:
        return "collectives"
    if "convolution" in s or "dot" in s or "matmul" in s:
        return "matmuls (MXU)"
    if "quant" in s or "dequant" in s or "convert" in category.lower():
        return "quant/dequant + converts"
    if "copy" in s or "transpose" in category.lower() or "reshape" in s:
        return "copies/layout"
    if "adam" in s or "optimizer" in s:
        return "optimizer"
    if "fusion" in category.lower() or "fused" in s:
        return "elementwise fusions"
    return "other"


def main() -> None:
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flagship_profile"
    xplane = find_xplane(log_dir)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats^", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        raise SystemExit("hlo_stats produced no rows")

    def col(row, *names, default=""):
        for n in names:
            for key in row:
                if key.lower().replace(" ", "_") == n:
                    return row[key]
        return default

    buckets: dict = defaultdict(float)
    top_ops: list = []
    total = 0.0
    for row in rows:
        t = float(col(row, "total_self_time_(us)", "self_time_(us)", default=0) or 0)
        name = col(row, "hlo_op_name", "op_name")
        category = col(row, "hlo_op_category", "category")
        program = col(row, "hlo_op_expression", "program_id", default="")
        buckets[bucket_of(name, category, program)] += t
        total += t
        top_ops.append((t, name, category, (program or "")[:140]))

    top_ops.sort(reverse=True)
    out = {
        "total_device_us": round(total, 1),
        "buckets_ms": {
            k: round(v / 1e3, 2)
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])
        },
        "buckets_pct": {
            k: round(100 * v / max(total, 1e-9), 1)
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])
        },
    }
    print(json.dumps(out, indent=2))
    print("\ntop 25 self-time ops:", file=sys.stderr)
    for t, name, category, program in top_ops[:25]:
        print(f"  {t/1e3:9.2f} ms  {category:24s} {name[:60]:60s} {program}", file=sys.stderr)


if __name__ == "__main__":
    main()
