"""TiledScorer guidance-loop benchmark vs the round-1 path."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pstl_tpu import diffusion, specs
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu.ops import dynamics as dyn

BS = int(os.environ.get("P_BS", "16"))
cfg = Config(diffusion=True, rect_head=True, guidance=True, flex=True,
             n_randoms=64).finalize()
M = cfg.n_randoms
N = BS * M * 3
T = cfg.nt

data = synthetic.generate_dataset(0, BS, cfg, scene_len=None)
batch = {k: jnp.asarray(v) for k, v in data.items()
         if not k.startswith(("scene_", "traj_i", "ti"))}
batch["neighbor_trajs_aug"] = batch["neighbors_traj"]
batch["neighbors"] = batch["neighbors_traj"][:, :, 0, :]
gt_stlp = jnp.broadcast_to(jnp.asarray([1., 9., -3., 2., .1, .2]), (BS, 6))
dense = specs.densify_batch(batch, gt_stlp, cfg, key=jax.random.PRNGKey(0),
                            stlp_dense=jnp.broadcast_to(
                                jnp.asarray([1., 9., -3., 2., .1, .2]),
                                (N, 1, 6)))
valid = dense["valids_dense"].reshape(-1)
states = batch["ego_traj"][:, 0, :4]
states_flat = jnp.broadcast_to(states[:, None, None],
                               (BS, M, 3, 4)).reshape(N, 4)
formulas = specs.build_scorer(cfg)
mu0 = jax.random.normal(jax.random.PRNGKey(1), (N, T * 2))
beta_t = jnp.float32(0.01)


def timeit(fn, *args, iters=30):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    cs = time.time() - t0
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3, cs


def make_loss(tiled):
    sr = specs.make_score_rows(batch, dense, cfg.with_(tiled_scorer=tiled),
                               formulas)

    def loss(mu):
        u = diffusion.denormalize_controls(mu, cfg, clip=False)
        trajs = dyn.rollout(states_flat, u, cfg.dt)
        return specs.mask_mean(jax.nn.relu(100.0 - sr(trajs[:, :-1])), valid)

    return loss


def adam3(loss_fn):
    ctx = diffusion.make_guidance_ctx(None, valid, states_flat)

    def run(mu):
        # reuse the production guidance step
        score_rows = loss_fn.__closure__  # not used; direct call below
        return mu

    grad_fn = jax.grad(loss_fn)

    def body(mu):
        mu_init = mu
        m = jnp.zeros_like(mu)
        v = jnp.zeros_like(mu)

        def it_body(it, carry):
            mu_opt, m, v = carry
            g = grad_fn(mu_opt)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1 - 0.9 ** (it + 1))
            vh = v / (1 - 0.999 ** (it + 1))
            mu_opt = mu_opt - 0.01 * mh / (jnp.sqrt(vh) + 1e-8)
            delta = jnp.clip(mu_opt - mu_init, -beta_t, beta_t)
            return (mu_init + delta, m, v)

        out, _, _ = jax.lax.fori_loop(0, 3, it_body, (mu, m, v))
        return out

    return body


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  N={N}")
    l_old = make_loss(False)
    l_new = make_loss(True)
    v1 = float(jax.jit(l_old)(mu0))
    v2 = float(jax.jit(l_new)(mu0))
    print(f"loss parity: clausebank={v1:.6f} tiled={v2:.6f}")
    for name, fn in [
        ("grad clausebank ", jax.jit(jax.grad(l_old))),
        ("grad tiled      ", jax.jit(jax.grad(l_new))),
        ("3xAdam clausebank", jax.jit(adam3(l_old))),
        ("3xAdam tiled     ", jax.jit(adam3(l_new))),
    ]:
        ms, cs = timeit(fn, mu0)
        print(f"{name}: {ms:8.3f} ms  (compile {cs:.1f}s)")
