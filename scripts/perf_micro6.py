"""Pallas guidance mega-kernel microbench: freeze-vs-Adam cost split.

The round-3 full-step trace puts the fuse_freeze kernel at ~0.225 ms per
denoise step (22.25 of the 26.2 ms reverse scan, bs=16) — it IS the bench
now.  This sweeps guidance_niters over the isolated kernel to split the
per-call cost into the in-VMEM freeze (+ fixed DMA) intercept and the
per-Adam-iteration slope, and A/Bs the kernel variants at bench shapes.

Usage: python scripts/perf_micro6.py            # on the TPU
       P_BS=16 P_VARIANTS=ff,fz python scripts/perf_micro6.py
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

from pstl_tpu import specs
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu.ops import pallas_guidance as pg

BS = int(os.environ.get("P_BS", "16"))
VARIANTS = os.environ.get("P_VARIANTS", "ff").split(",")
NITER_SWEEP = [int(s) for s in
               os.environ.get("P_NITERS", "1,2,3").split(",")]

base = Config(diffusion=True, rect_head=True, guidance=True, flex=True,
              n_randoms=64, guidance_niters=3, guidance_pallas=True,
              guidance_pallas_fuse_freeze=True).finalize()
M = base.n_randoms
N = BS * M * 3

data = synthetic.generate_dataset(0, BS, base, scene_len=None)
batch = {k: jnp.asarray(v) for k, v in data.items()
         if not k.startswith(("scene_", "traj_i", "ti"))}
batch["neighbor_trajs_aug"] = batch["neighbors_traj"]
gt_stlp = jnp.broadcast_to(jnp.asarray([1., 9., -3., 2., .1, .2]), (BS, 6))
dense = specs.densify_batch(batch, gt_stlp, base, key=jax.random.PRNGKey(0),
                            stlp_dense=jnp.broadcast_to(
                                jnp.asarray([1., 9., -3., 2., .1, .2]),
                                (N, 1, 6)))
valid = dense["valids_dense"].reshape(-1)
states = batch["ego_traj"][:, 0, :4]
fused = specs.make_guidance_loss(batch, dense, base, states, valid)
mu_cm = jax.random.normal(jax.random.PRNGKey(1), (BS, base.nt, 2, fused.R))
beta_t = jnp.float32(0.01)


def timeit(fn, *args, iters=50, reps=5):
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


def run(tag, cfg, fuse_freeze):
    def f(m):
        frozen = None if fuse_freeze else fused.freeze_cm(m)
        return pg.guidance_adam_cm(fused, frozen, m, beta_t, 100.0, cfg,
                                   fuse_freeze=fuse_freeze)
    ms, cs = timeit(jax.jit(f), mu_cm)
    print(f"{tag:34s} {ms:8.4f} ms/call  (compile {cs:.0f}s)", flush=True)
    return ms


rows = {}
for v in VARIANTS:
    fold = v.endswith("f") and v != "ff"
    fuse = v.startswith("ff") or v.startswith("fz") is False
    fuse = not v.startswith("fz")
    for ni in NITER_SWEEP:
        cfg = base.with_(guidance_niters=ni, guidance_pallas_fold=fold,
                         guidance_pallas_fuse_freeze=fuse)
        rows[(v, ni)] = run(f"{v} niters={ni}", cfg, fuse)
    if len(NITER_SWEEP) >= 2:
        n0, n1 = NITER_SWEEP[0], NITER_SWEEP[-1]
        slope = (rows[(v, n1)] - rows[(v, n0)]) / (n1 - n0)
        icept = rows[(v, n0)] - slope * n0
        print(f"{v}: per-iter {slope*1e3:.1f} us, "
              f"freeze+fixed {icept*1e3:.1f} us")
