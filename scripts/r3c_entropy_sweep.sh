#!/bin/bash
# Round-3c: close the last open-loop gap (entropy 1.61 vs reference 1.735,
# BASELINE.md Table I) by sweeping the DPP diversity strength in the e7
# RefineNet stage.  Compliance has margin (0.5636 vs ref 0.544), so a
# small satisfaction trade for diversity is acceptable.
#
# Each variant trains from the SAME e5 lineage checkpoint in its OWN
# process (host memory leaks across in-process trainings — r3_recover.sh
# finding) and writes openloop_ours_v3_* rows into exps/e2e_r3/results.json.
# Run detached:  setsid nohup bash scripts/r3c_entropy_sweep.sh \
#                  > /tmp/r3c_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export E2E_OUT=exps/e2e_r3
export E7V2_SRC=models_e5
export E7V2_EPOCHS=${SWEEP_EPOCHS:-20}
export E7V2_SKIP_SIM=1

run() {  # run <dst> <tag> <overrides>
  local dst=$1 tag=$2 ovr=$3
  echo "=== variant $tag ($ovr) ==="
  E7V2_DST=$dst E7V2_TAG=$tag E7V2_OVERRIDES=$ovr \
    timeout 7200 python scripts/e7_v2_retrain.py \
    || echo "variant $tag FAILED (exit $?)"
}

run models_e7v3_dw2   ours_v3_dw2   "diversity_weight=2.0"
run models_e7v3_dw4   ours_v3_dw4   "diversity_weight=4.0"
run models_e7v3_ds05  ours_v3_ds05  "diversity_weight=2.0,diversity_scale=0.5"

python - <<'EOF'
import json
r = json.load(open("exps/e2e_r3/results.json"))
print(f"{'row':24s} {'acc':>7s} {'scene':>7s} {'entropy':>8s} {'area':>7s}")
for k, v in sorted(r.items()):
    if k.startswith("openloop_ours_v") and "guidance" in k:
        print(f"{k[9:]:24s} {v['nn_acc']:7.4f} {v['nn_scene_acc']:7.4f} "
              f"{v['nn_ent_ent_s']:8.4f} {v['nn_area']:7.2f}")
EOF
