#!/bin/bash
# Round-4 evidence pipeline: regenerates exps/r4 end-to-end.
#
# Stages (each idempotent — re-running skips completed work):
#   1. data: 768 synthetic scenes WITH low-speed/near-stop coverage
#      (synth_low_speed_frac=0.25 — strict-OOL reversal fix, VERDICT r3 #3)
#      + trajopt augmentation
#   2. e5 DDPM 150 epochs, e7v2 (STL-hinge RefineNet) 25 epochs
#   3. closed-loop Table-II matrix: ours / +guidance x {shielded, STRICT,
#      ref_parity} + backup A/B  -> exps/r4/closed_loop_rows.jsonl
#   4. fast-sampler quality/time rows -> exps/r4/fast_sampler.json
#   5. sampler-temperature entropy sweep -> exps/r4/entropy_sweep.json
set -e
cd "$(dirname "$0")/.."
export E2E_OUT=exps/r4
export E2E_LOW_SPEED=0.25
mkdir -p exps/r4
LOG=exps/r4/pipeline.log
touch "$LOG"

run() { echo "=== $* ===" >>"$LOG"; "$@" >>"$LOG" 2>&1; }

run env E2E_METHODS=e5 E2E_STAGES=data,train python scripts/e2e_pipeline.py
run env E7V2_SKIP_SIM=1 python scripts/e7_v2_retrain.py

ROWS=exps/r4/closed_loop_rows.jsonl
: >"$ROWS"
for flags in "" "--guidance" "--strict" "--guidance --strict" \
             "--ref-parity" "--guidance --ref-parity" "--guidance --backup"; do
  echo "=== closed_loop_eval $flags ===" >>"$LOG"
  # shellcheck disable=SC2086
  python scripts/closed_loop_eval.py exps/r4/models_e7v2 $flags \
      2>>"$LOG" | tee -a "$LOG" | tail -1 >>"$ROWS"
done

run python scripts/fast_sampler_eval.py exps/r4/models_e7v2 exps/r4/fast_sampler.json
run python scripts/entropy_sweep_r4.py exps/r4/models_e7v2
echo "PIPELINE DONE" >>"$LOG"

# ---- flagship continuation (entropy lever, VERDICT r3 #2) ---------------
# Round-2/3 scaling: entropy tracks e5 budget (150 ep -> 1.21, 320 ep ->
# 1.61; reference Table-I best 1.735).  Continue e5 +150 epochs on the
# low-speed cache, rebuild the STL-hinge RefineNet on top (ours_v3 rows),
# then A/B a stronger DPP diversity weight (the r3c sweep that never ran
# to completion).
if [ ! -e exps/r4/models_e5b/LAST ]; then
  run env E5B_EPOCHS=150 python scripts/e5_continue.py
fi
if [ ! -e exps/r4/models_e7v3/LAST ]; then
  run env E7V2_SKIP_SIM=1 E7V2_SRC=models_e5b E7V2_DST=models_e7v3 \
      E7V2_TAG=ours_v3 python scripts/e7_v2_retrain.py
fi
if [ ! -e exps/r4/models_e7v3_dw2/LAST ]; then
  run env E7V2_SKIP_SIM=1 E7V2_SRC=models_e5b E7V2_DST=models_e7v3_dw2 \
      E7V2_TAG=ours_v3_dw2 E7V2_OVERRIDES="diversity_weight=2.0" \
      python scripts/e7_v2_retrain.py
fi
# closed-loop rows for the flagship checkpoint (shielded + STRICT)
ROWS3=exps/r4/closed_loop_rows_v3.jsonl
if [ ! -s "$ROWS3" ]; then
  for flags in "--guidance" "--guidance --strict"; do
    echo "=== closed_loop_eval v3 $flags ===" >>"$LOG"
    # shellcheck disable=SC2086
    python scripts/closed_loop_eval.py exps/r4/models_e7v3 $flags \
        2>>"$LOG" | tee -a "$LOG" | tail -1 >>"$ROWS3"
  done
fi
echo "FLAGSHIP DONE" >>"$LOG"
