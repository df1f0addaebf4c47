#!/usr/bin/env bash
# Flagship bench sweep over the round-3 perf levers (run on a real TPU chip):
#   - BENCH_SKIP_LAST: mixed remat — keep activations on the last N
#     single-stream blocks (0 = remat everything)
#   - BENCH_QMATMUL: int8 MXU matmuls (off | forward | full)
# Writes one JSON line per config to bench_sweep.jsonl; pick the best MFU row
# and bake it into bench.py defaults.
set -u
out="${1:-bench_sweep.jsonl}"
: > "$out"
for qm in off forward full; do
  for skip in 0 2 4 8; do
    echo "=== BENCH_QMATMUL=$qm BENCH_SKIP_LAST=$skip ===" >&2
    BENCH_MODE=flagship_only BENCH_INT4=0 \
    BENCH_QMATMUL="$qm" BENCH_SKIP_LAST="$skip" \
    timeout 1800 python bench.py 2>>"$out.log" | tail -1 | \
      python -c "import json,sys; d=json.loads(sys.stdin.read()); d['qmatmul']='$qm'; d['skip_last']=$skip; print(json.dumps(d))" >> "$out" \
      || echo "{\"qmatmul\": \"$qm\", \"skip_last\": $skip, \"error\": true}" >> "$out"
  done
done
echo "sweep done -> $out" >&2
python - "$out" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
ok = [r for r in rows if not r.get("error")]
ok.sort(key=lambda r: -r.get("mfu", 0))
for r in ok[:5]:
    print(f"mfu={r.get('mfu')}  qmatmul={r['qmatmul']}  skip_last={r['skip_last']}  step_ms={r.get('step_ms')}")
EOF
