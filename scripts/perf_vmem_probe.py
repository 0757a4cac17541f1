"""Probe: can per-jit compiler_options deliver the scoped-VMEM knob the
axon client's XLA_FLAGS parser rejects?

The round-3 trace (docs/PERF.md) shows the denoise scan's tail is
per-iteration `copy-start` streaming of loop-invariant constants; a larger
scoped-VMEM budget would let XLA pin them.  XLA_FLAGS rejects
--xla_tpu_scoped_vmem_limit_kib here, so try the AOT compile path:
jit(f).lower(x).compile(compiler_options={...}).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pstl_tpu import diffusion, specs
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic

KIB = os.environ.get("P_VMEM_KIB", "65536")

cfg = Config(diffusion=True, rect_head=True, guidance=True, flex=True,
             n_randoms=64, guidance_reuse_selection=True).finalize()
BS, M = 16, cfg.n_randoms
N = BS * M * 3
data = synthetic.generate_dataset(0, BS, cfg, scene_len=None)
batch = {k: jnp.asarray(v) for k, v in data.items()
         if not k.startswith(("scene_", "traj_i", "ti"))}
batch["neighbor_trajs_aug"] = batch["neighbors_traj"]
stlp = jnp.broadcast_to(jnp.asarray([1., 9., -3., 2., .1, .2]), (BS, 6))
dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0),
                            stlp_dense=jnp.broadcast_to(
                                jnp.asarray([1., 9., -3., 2., .1, .2]),
                                (N, 1, 6)))
valid = dense["valids_dense"].reshape(-1)
states = batch["ego_traj"][:, 0, :4]
sf = jnp.broadcast_to(states[:, None, None], (BS, M, 3, 4)).reshape(N, 4)
fused = specs.make_guidance_loss(batch, dense, cfg, states, valid)
sr = specs.make_score_rows(batch, dense, cfg, None)
ctx = diffusion.make_guidance_ctx(sr, valid, sf, fused)
mu0 = jax.random.normal(jax.random.PRNGKey(1), (N, cfg.nt * 2))
beta = jnp.float32(0.01)


def gstep(m):
    # 10-step mini-scan so timing is in-scan, not dispatch-floor
    def body(mm, _):
        return diffusion._guidance_step(mm, beta, ctx, cfg, True), None
    out, _ = jax.lax.scan(body, m, None, length=10)
    return out


def timeit(fn, x, iters=20, reps=5):
    out = jax.block_until_ready(fn(x))
    ms = []
    for _ in range(reps):
        jax.block_until_ready(fn(x))
        t0 = time.time()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out)
        ms.append((time.time() - t0) / iters * 1e3)
    return sorted(ms)[len(ms) // 2]


base = jax.jit(gstep)
print(f"default compile: {timeit(base, mu0):.3f} ms / 10-step scan")

for kib in KIB.split(","):
    try:
        lowered = jax.jit(gstep).lower(mu0)
        compiled = lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": kib})
        print(f"scoped-vmem {kib} KiB accepted; "
              f"{timeit(compiled, mu0):.3f} ms / 10-step scan")
    except Exception as e:  # noqa: BLE001
        print(f"scoped-vmem {kib}: REJECTED: {type(e).__name__}: {e}")
