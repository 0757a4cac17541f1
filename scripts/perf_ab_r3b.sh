#!/bin/bash
# Round-3b perf A/B matrix: candidate-minor sampler, bf16 geometry /
# robustness dtypes, Adam-loop unroll (always on), scan unroll.
# One TPU process at a time; each row is a fresh process.
# Usage: scripts/perf_ab_r3b.sh [out.jsonl]
set -u
OUT=${1:-/tmp/perf_ab_r3b.jsonl}
cd "$(dirname "$0")/.."
run() {
  local label="$1"; shift
  echo "=== $label ($*)" >&2
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>>/tmp/perf_ab_r3b.err)
  echo "{\"label\": \"$label\", \"bench\": $line}" >> "$OUT"
  echo "$line" >&2
}
: > "$OUT"
run base_cm           BENCH_DUMMY=1
run no_cm             BENCH_NO_CM=1
run geom_bf16         BENCH_GEOM_DTYPE=bfloat16
run rob_bf16          BENCH_ROB_DTYPE=bfloat16
run both_bf16         BENCH_GEOM_DTYPE=bfloat16 BENCH_ROB_DTYPE=bfloat16
run both_bf16_coarse  BENCH_GEOM_DTYPE=bfloat16 BENCH_ROB_DTYPE=bfloat16 BENCH_COARSE_PAIR=1
run both_bf16_unroll3 BENCH_GEOM_DTYPE=bfloat16 BENCH_ROB_DTYPE=bfloat16 BENCH_SCAN_UNROLL=3
# sel_every>1 carries frozen selections across denoise steps (approximate;
# compliance column in the output is the metric-neutrality check).
run both_bf16_sel2    BENCH_GEOM_DTYPE=bfloat16 BENCH_ROB_DTYPE=bfloat16 BENCH_SEL_EVERY=2
run both_bf16_sel4    BENCH_GEOM_DTYPE=bfloat16 BENCH_ROB_DTYPE=bfloat16 BENCH_SEL_EVERY=4
run both_bf16_chunk16 BENCH_GEOM_DTYPE=bfloat16 BENCH_ROB_DTYPE=bfloat16 BENCH_CHUNK=16 BENCH_STEPS=32
run parity_nog        BENCH_MODE=parity_nog
cat "$OUT"
