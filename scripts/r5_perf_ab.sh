#!/bin/bash
# Round-5 throughput A/B matrix (VERDICT r4 ask #4): the named, unmeasured
# levers — coarse-pair freeze, bf16-MXU cumsums, G=4 lane packing with a
# raised VMEM cap — then a bs sweep and the full three-contract run at the
# winning config.  One row file per config under exps/r5_perf/ (idempotent:
# a config re-runs only if its row file is missing/invalid).
#
# Run AFTER the evidence pipeline frees the chip (single-core container:
# one TPU process at a time).
set -eo pipefail
cd "$(dirname "$0")/.."
mkdir -p exps/r5_perf
LOG=exps/r5_perf/ab.log
touch "$LOG"

row() { # row <name> [ENV=val...]
  local name=$1; shift
  local rowf="exps/r5_perf/$name.json"
  if [ -s "$rowf" ] && python -c "import json; json.load(open('$rowf'))" \
      2>/dev/null; then
    echo "=== skip (done): $name ===" >>"$LOG"; return 0
  fi
  echo "=== $name: $* ===" >>"$LOG"
  env "$@" BENCH_ALL_MODES="${ALL_MODES:-0}" python bench.py \
      >"$rowf.tmp" 2>>"$LOG"
  tail -1 "$rowf.tmp" >"$rowf" && rm -f "$rowf.tmp"
  python -c "import json; json.load(open('$rowf'))"
  cat "$rowf" >>"$LOG"; echo >>"$LOG"
}

# -- lever A/Bs (heavy mode only, quick).  The winning combination
# (coarse+bf16) became the bench DEFAULT after this matrix ran, so every
# row pins both envs explicitly. -------------------------------------------
row base            BENCH_COARSE_PAIR=0 BENCH_BF16_CUMSUM=0
row coarse          BENCH_COARSE_PAIR=1 BENCH_BF16_CUMSUM=0
row bf16            BENCH_COARSE_PAIR=0 BENCH_BF16_CUMSUM=1
row coarse_bf16     BENCH_COARSE_PAIR=1 BENCH_BF16_CUMSUM=1
row gpack4          BENCH_COARSE_PAIR=0 BENCH_BF16_CUMSUM=0 BENCH_GPACK=4
row gpack4_vmem120  BENCH_COARSE_PAIR=0 BENCH_BF16_CUMSUM=0 BENCH_GPACK=4 PSTL_VMEM_MB=120
row gpack2_vmem120  BENCH_COARSE_PAIR=0 BENCH_BF16_CUMSUM=0 PSTL_VMEM_MB=120

# -- bs sweep at the shipped (winning) config: per-chip product scaling ----
row bs64            BENCH_SCENES=64
row bs128           BENCH_SCENES=128

echo "AB DONE" >>"$LOG"
