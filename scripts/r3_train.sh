#!/bin/bash
# Round-3 quality pipeline (VERDICT r2 #3): bigger data + draw-robust
# trajopt oracle (K=4) + longer e5 lineage (warm-started from the round-2
# checkpoint) + STL-hinge RefineNet + full baseline matrix + evals.
# Run detached:  setsid nohup bash scripts/r3_train.sh > /tmp/r3_train.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/pstl_tpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export E2E_OUT=exps/e2e_r3

# 1) data + trajopt (K=4 robust draws is the Config default now) + e5/e7
#    + baselines + open/closed-loop rows for the ref-exact recipes
E2E_SCENES=1024 E2E_T_SAMPLES=3 E2E_TJ_ITERS=2000 \
E2E_EPOCHS_E5=320 E2E_EPOCHS_E7=30 E2E_EPOCHS_BASE=80 \
E2E_E5_INIT=checkpoints/e7_round2 \
python scripts/e2e_pipeline.py

# 2) STL-hinge RefineNet recipe (round-2's winning recipe) -> ours_v2 rows
E7V2_EPOCHS=30 python scripts/e7_v2_retrain.py

# 3) closed-loop rows for the hinge recipe (+guidance sweep best config)
python scripts/closed_loop_eval.py exps/e2e_r3/models_e7v2
python scripts/closed_loop_eval.py exps/e2e_r3/models_e7v2 --guidance

# 4) strict reference-semantics rows (VERDICT r2 #4)
python scripts/closed_loop_eval.py exps/e2e_r3/models_e7v2 --strict
python scripts/closed_loop_eval.py exps/e2e_r3/models_e7v2 --guidance --strict

python scripts/fast_sampler_eval.py exps/e2e_r3/models_e7v2
echo "R3_TRAIN_DONE"
