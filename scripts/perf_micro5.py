"""Frozen-selection guidance microbench (round 3).

Times the production guidance inner loop (diffusion._guidance_step over
specs.CandMinorGuidanceLoss) exact vs with cfg.guidance_reuse_selection:
the discrete argmin searches (nearest lane segment (bs,T,S,R); nearest
disc pair (bs,K,T,nLe,nLn,R)) run ONCE per denoise step instead of inside
every Adam iteration's forward+backward.

Usage: JAX_PLATFORMS=... python scripts/perf_micro5.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pstl_tpu import diffusion, specs
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic

BS = int(os.environ.get("P_BS", "16"))
NITERS = int(os.environ.get("P_NITERS", "3"))
cfg = Config(diffusion=True, rect_head=True, guidance=True, flex=True,
             n_randoms=64, guidance_niters=NITERS).finalize()
M = cfg.n_randoms
N = BS * M * 3

data = synthetic.generate_dataset(0, BS, cfg, scene_len=None)
batch = {k: jnp.asarray(v) for k, v in data.items()
         if not k.startswith(("scene_", "traj_i", "ti"))}
batch["neighbor_trajs_aug"] = batch["neighbors_traj"]
gt_stlp = jnp.broadcast_to(jnp.asarray([1., 9., -3., 2., .1, .2]), (BS, 6))
dense = specs.densify_batch(batch, gt_stlp, cfg, key=jax.random.PRNGKey(0),
                            stlp_dense=jnp.broadcast_to(
                                jnp.asarray([1., 9., -3., 2., .1, .2]),
                                (N, 1, 6)))
valid = dense["valids_dense"].reshape(-1)
states = batch["ego_traj"][:, 0, :4]
states_flat = jnp.broadcast_to(states[:, None, None],
                               (BS, M, 3, 4)).reshape(N, 4)
mu0 = jax.random.normal(jax.random.PRNGKey(1), (N, cfg.nt * 2))
beta_t = jnp.float32(0.01)

fused = specs.make_guidance_loss(batch, dense, cfg, states, valid)
sr = specs.make_score_rows(batch, dense, cfg, None)
ctx = diffusion.make_guidance_ctx(sr, valid, states_flat, fused)


def timeit(fn, *args, iters=30, reps=5):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    cs = time.time() - t0
    batch_ms = []
    for _ in range(reps):
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        batch_ms.append((time.time() - t0) / iters * 1e3)
    return sorted(batch_ms)[len(batch_ms) // 2], cs


exact = jax.jit(lambda m: diffusion._guidance_step(m, beta_t, ctx, cfg,
                                                   True))
froz = jax.jit(lambda m: diffusion._guidance_step(
    m, beta_t, ctx, cfg.with_(guidance_reuse_selection=True), True))
freeze_only = jax.jit(fused.freeze)

ms, cs = timeit(exact, mu0)
print(f"exact   {NITERS}-iter guidance step: {ms:8.3f} ms  (compile {cs:.0f}s)")
ms2, cs2 = timeit(froz, mu0)
print(f"frozen  {NITERS}-iter guidance step: {ms2:8.3f} ms  (compile {cs2:.0f}s)")
ms3, cs3 = timeit(freeze_only, mu0)
print(f"freeze() alone:                 {ms3:8.3f} ms")
print(f"speedup: {ms / ms2:.2f}x")

# numerics: plan-level drift between the two paths
d = jnp.abs(exact(mu0) - froz(mu0))
print(f"mu drift after one step: max {float(d.max()):.2e} "
      f"mean {float(d.mean()):.2e}")
