#!/bin/bash
# Round-3 recovery: scripts/e2e_pipeline.py was OOM-killed (RSS ~96 GB)
# mid-e4 after finishing e5/e7/e2/e3 — host memory accumulates across
# sequential in-process trainings, so each remaining stage runs in its OWN
# process here (results.json accumulates incrementally on disk).
# Run detached:  setsid nohup bash scripts/r3_recover.sh > /tmp/r3_recover.log 2>&1 &
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/pstl_tpu_jax_cache
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=-1
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export E2E_OUT=exps/e2e_r3
export E2E_SCENES=1024 E2E_T_SAMPLES=3 E2E_EPOCHS_BASE=80

# the two OOM-lost baseline trainings
E2E_STAGES=train E2E_METHODS=e4 python scripts/e2e_pipeline.py
E2E_STAGES=train E2E_METHODS=e6 python scripts/e2e_pipeline.py
# bench-checkpoint save (e7 training exists -> skipped, then saved)
E2E_STAGES=train E2E_METHODS=e7 python scripts/e2e_pipeline.py

# open-loop Table-I rows, grouped to bound RSS
E2E_STAGES=eval E2E_METHODS=e2,e3 python scripts/e2e_pipeline.py
E2E_STAGES=eval E2E_METHODS=e4,e6 python scripts/e2e_pipeline.py
E2E_STAGES=eval E2E_METHODS=e5 python scripts/e2e_pipeline.py
E2E_STAGES=eval E2E_METHODS=e7 python scripts/e2e_pipeline.py

# closed-loop Table-II rows
E2E_STAGES=sim E2E_METHODS=e3,e5 python scripts/e2e_pipeline.py
E2E_STAGES=sim E2E_METHODS=e6 python scripts/e2e_pipeline.py
E2E_STAGES=sim E2E_METHODS=e7 python scripts/e2e_pipeline.py
echo "R3_RECOVER_DONE"
