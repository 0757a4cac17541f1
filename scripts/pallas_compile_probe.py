"""Mosaic compile probe for the repo's Pallas kernels.

Attempts a REAL (non-interpret) compile+run of each kernel on the TPU
with a per-kernel time budget, and prints one JSON line per kernel:
    {"kernel": ..., "status": "ok"|"timeout"|"error", "seconds": ...}

Round-2/3 status (docs/PERF.md "Pallas status"): Mosaic never finishes
compiling even the small clearance kernel in this container (45-min
probe).  This script is the one-command re-probe for when the toolchain
changes; budget via PROBE_BUDGET_S (default 600).

The compile runs in a SUBPROCESS so a hung Mosaic compile can be killed
without taking down the probe (SIGKILL after the budget).
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET = int(os.environ.get("PROBE_BUDGET_S", "600"))

_CLEARANCE = r"""
import jax, jax.numpy as jnp
from pstl_tpu.ops import pallas_kernels as pk
x = jnp.zeros((256, 20, 3)); n = jnp.zeros((256, 4, 20, 7))
out = pk.min_clearance(x, n, 4.0, 1.7, 4, 256, False)
jax.block_until_ready(out)
print("clearance OK", out.shape)
"""

_GUIDANCE = r"""
import jax, jax.numpy as jnp, numpy as np
from pstl_tpu import specs
from pstl_tpu.config import Config
from pstl_tpu.ops import pallas_guidance as pg
# production-like shapes: bs=2 scenes, M=64 -> R=192, T=20, K=8
cfg = Config(diffusion=True, n_randoms=64, n_neighbors=8, nt=20, flex=True,
             guidance=True, guidance_niters=3,
             guidance_reuse_selection=True).finalize()
rng = np.random.RandomState(0)
bs, k, T, S = 2, cfg.n_neighbors, cfg.nt, cfg.n_segs
batch = {
    "neighbor_trajs_aug": jnp.asarray(rng.randn(bs, k, T, 7).astype(np.float32) * 5),
    "currlane_wpts": jnp.asarray(rng.randn(bs, S, 3).astype(np.float32) * 3),
    "leftlane_wpts": jnp.asarray(rng.randn(bs, S, 3).astype(np.float32) * 3),
    "rightlane_wpts": jnp.asarray(rng.randn(bs, S, 3).astype(np.float32) * 3),
    "curr_id": jnp.ones((bs, 1)), "left_id": jnp.ones((bs, 1)),
    "right_id": jnp.ones((bs, 1)),
    "gt_high_level": jnp.zeros((bs, 1)),
}
gt_stlp = jnp.asarray(np.tile([0.5, 8.0, -2.0, 2.0, 0.5, 0.3], (bs, 1)).astype(np.float32))
dense = specs.densify_batch(batch, gt_stlp, cfg, key=jax.random.PRNGKey(0))
states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
valid = dense["valids_dense"].reshape(-1)
fused = specs.make_guidance_loss(batch, dense, cfg, states, valid)
mu = jnp.asarray(rng.randn(bs * 64 * 3, cfg.nt * 2).astype(np.float32))
mu_cm = fused._to_cand_minor(mu)
frozen = fused.freeze_cm(mu_cm)
import os
if os.environ.get("PROBE_FUSE_FREEZE"):
    out = pg.guidance_adam_cm(fused, None, mu_cm, jnp.float32(0.02), 100.0,
                              cfg, interpret=False, fuse_freeze=True)
else:
    out = pg.guidance_adam_cm(fused, frozen, mu_cm, jnp.float32(0.02),
                              100.0, cfg, interpret=False)
jax.block_until_ready(out)
print("guidance OK", out.shape)
"""


def probe(name, code, env_extra=None):
    t0 = time.time()
    env = dict(os.environ, **(env_extra or {}))
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=HERE, env=env,
                           capture_output=True, text=True, timeout=BUDGET)
        dt = time.time() - t0
        status = "ok" if r.returncode == 0 else "error"
        detail = (r.stdout + r.stderr).strip().splitlines()[-1:] or [""]
        return {"kernel": name, "status": status,
                "seconds": round(dt, 1), "detail": detail[0][:200]}
    except subprocess.TimeoutExpired:
        return {"kernel": name, "status": "timeout",
                "seconds": BUDGET,
                "detail": f"Mosaic compile exceeded {BUDGET}s budget"}


if __name__ == "__main__":
    for name, code, env in (
            ("min_clearance", _CLEARANCE, None),
            ("guidance_adam_cm", _GUIDANCE, None),
            ("guidance_adam_cm_fuse_freeze", _GUIDANCE,
             {"PROBE_FUSE_FREEZE": "1"})):
        print(json.dumps(probe(name, code, env)), flush=True)
