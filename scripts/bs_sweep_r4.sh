#!/bin/bash
# round-4 batch-scaling sweep: VERDICT r3 item 1.
# Usage: bash scripts/bs_sweep_r4.sh [out.jsonl]
out=${1:-/tmp/bs_sweep_r4.jsonl}
: > "$out"
for gp in 2 3; do
  for bs in 16 32 64 128; do
    echo "=== gp=$gp bs=$bs ===" >&2
    line=$(BENCH_GPALLAS=$gp BENCH_SCENES=$bs BENCH_STEPS=16 \
           timeout 900 python bench.py 2>/dev/null | tail -1)
    echo "{\"gp\": $gp, \"bs\": $bs, \"r\": $line}" >> "$out"
    tail -1 "$out" >&2
  done
done
