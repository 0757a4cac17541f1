"""Full guidance-loss gradient benchmark: current path vs optimized variants.

The real hot unit: grad through denorm -> rollout -> signals -> ClauseBank
-> mask_mean at n = bs*M*3 = 3072 rows, evaluated 99 x niters times per plan.
Also times a 3-iteration Adam ascent (fori_loop vs unrolled) to expose
loop-carried fusion differences.
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
import numpy as np

from pstl_tpu import diffusion, specs
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu.ops import dynamics as dyn
from pstl_tpu.ops import stl

BS = int(os.environ.get("P_BS", "16"))
cfg = Config(diffusion=True, rect_head=True, guidance=True, flex=True,
             n_randoms=64).finalize()
M = cfg.n_randoms
N = BS * M * 3
T = cfg.nt


def setup():
    data = synthetic.generate_dataset(0, BS, cfg, scene_len=None)
    batch = {k: jnp.asarray(v) for k, v in data.items()
             if not k.startswith(("scene_", "traj_i", "ti"))}
    batch["neighbor_trajs_aug"] = batch["neighbors_traj"]
    batch["neighbors"] = batch["neighbors_traj"][:, :, 0, :]
    gt_stlp = jnp.broadcast_to(jnp.asarray([1., 9., -3., 2., .1, .2]), (BS, 6))
    dense = specs.densify_batch(batch, gt_stlp, cfg,
                                key=jax.random.PRNGKey(0),
                                stlp_dense=jnp.broadcast_to(
                                    jnp.asarray([1., 9., -3., 2., .1, .2]),
                                    (N, 1, 6)))
    signal_base = specs.dense_signal_input(dense)
    signal_base_fused = specs.dense_signal_input(dense, cfg=cfg)
    highlevel = dense["highlevel_dense"]
    valid = dense["valids_dense"].reshape(-1)
    states = batch["ego_traj"][:, 0, :4]
    states_flat = jnp.broadcast_to(states[:, None, None],
                                   (BS, M, 3, 4)).reshape(N, 4)
    return signal_base, signal_base_fused, highlevel, valid, states_flat


signal_base, signal_base_fused, highlevel, valid, states_flat = setup()
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


# ---------------------------------------------------------------- current
def loss_current(mu):
    u = diffusion.denormalize_controls(mu, cfg, clip=False)
    trajs = dyn.rollout(states_flat, u, cfg.dt)
    sig = dict(signal_base)
    sig["ego_traj"] = trajs[:, :-1]
    _, scores, _ = specs.compute_scores(sig, formulas, highlevel, valid, cfg)
    return specs.mask_mean(jax.nn.relu(100.0 - scores), valid)


# ------------------------------------------------------- hoisted + d2 min
def make_loss_hoisted():
    nei = signal_base["neighbors"]          # (N, K, T, 7)
    NL = cfg.refined_nL
    valid_nei = nei[..., 0]
    nx0, ny0, nth = nei[..., 1], nei[..., 2], nei[..., 3]
    Ln, Wn = nei[..., 5], nei[..., 6]
    rn = Wn / 2
    alpha = jnp.linspace(0.0, 1.0, NL)
    axn = ((-Ln / 2 + rn)[..., None] * (1 - alpha)
           + (Ln / 2 - rn)[..., None] * alpha)
    nx = nx0[..., None] + axn * jnp.cos(nth)[..., None]     # (N,K,T,NL)
    ny = ny0[..., None] + axn * jnp.sin(nth)[..., None]
    re = cfg.ego_W / 2
    axe = jnp.linspace(-cfg.ego_L / 2 + re, cfg.ego_L / 2 - re, NL)
    stlp = signal_base["stlp"]

    lanes = {k: signal_base[f"{k}lane_wpts"] for k in ("curr", "left",
                                                       "right")}

    def loss(mu):
        u = diffusion.denormalize_controls(mu, cfg, clip=False)
        trajs = dyn.rollout(states_flat, u, cfg.dt)
        ego = trajs[:, :-1]                                  # (N, T, 4)
        sig = {"stlp": stlp}
        from pstl_tpu.ops import geometry as geom
        for k, lane in lanes.items():
            d, th = geom.point_to_polyline(ego[..., :3], lane,
                                           clip=cfg.clip_dist,
                                           with_angle=True, inline=cfg.inline)
            sig[f"x2{k}_d"] = d
            sig[f"x2{k}_th"] = th
        x, y, thh = ego[..., 0], ego[..., 1], ego[..., 2]
        ex = x[..., None] + axe * jnp.cos(thh)[..., None]    # (N,T,NL)
        ey = y[..., None] + axe * jnp.sin(thh)[..., None]
        dx = ex[:, None, :, :, None] - nx[:, :, :, None, :]  # (N,K,T,NL,NL)
        dy = ey[:, None, :, :, None] - ny[:, :, :, None, :]
        d2 = jnp.min(dx * dx + dy * dy, axis=(-2, -1))
        per = jnp.sqrt(d2 + 1e-12) - re - rn
        masked = (jnp.clip(per, -5, 20) * valid_nei
                  + (1 - valid_nei) * 100.0)
        sig["min_nei_d"] = jnp.min(masked, axis=1)
        sig["ego_traj"] = ego
        scores_list = formulas.scores(sig, cfg.smoothing_factor, False)
        scores_list = scores_list + [scores_list[-1] * 0 + 1.0]
        scores = specs.select_scores(scores_list, highlevel.reshape(-1))
        return specs.mask_mean(jax.nn.relu(100.0 - scores), valid)

    return loss


def loss_fused(mu):
    """Production path: hoisted nei_discs + custom-VJP clearance."""
    u = diffusion.denormalize_controls(mu, cfg, clip=False)
    trajs = dyn.rollout(states_flat, u, cfg.dt)
    sig = dict(signal_base_fused)
    sig["ego_traj"] = trajs[:, :-1]
    _, scores, _ = specs.compute_scores(sig, formulas, highlevel, valid, cfg)
    return specs.mask_mean(jax.nn.relu(100.0 - scores), valid)


# ---------------------------------------------------------- Adam loops
def adam_fori(loss_fn):
    grad_fn = jax.grad(loss_fn)

    def run(mu):
        mu_init = mu

        def body(it, carry):
            mu_opt, m, v = carry
            g = grad_fn(mu_opt)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            step = it + 1
            mh = m / (1 - 0.9 ** step)
            vh = v / (1 - 0.999 ** step)
            mu_opt = mu_opt - 0.01 * mh / (jnp.sqrt(vh) + 1e-8)
            delta = jnp.clip(mu_opt - mu_init, -beta_t, beta_t)
            return (mu_init + delta, m, v)

        out, _, _ = jax.lax.fori_loop(0, 3, body,
                                      (mu, jnp.zeros_like(mu),
                                       jnp.zeros_like(mu)))
        return out

    return run


def adam_unrolled(loss_fn):
    grad_fn = jax.grad(loss_fn)

    def run(mu):
        mu_init = mu
        mu_opt = mu
        m = jnp.zeros_like(mu)
        v = jnp.zeros_like(mu)
        for it in range(3):
            g = grad_fn(mu_opt)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1 - 0.9 ** (it + 1))
            vh = v / (1 - 0.999 ** (it + 1))
            mu_opt = mu_opt - 0.01 * mh / (jnp.sqrt(vh) + 1e-8)
            delta = jnp.clip(mu_opt - mu_init, -beta_t, beta_t)
            mu_opt = mu_init + delta
        return mu_opt

    return run


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}  N={N}")
    loss_h = make_loss_hoisted()
    # sanity: same loss value
    l1 = float(jax.jit(loss_current)(mu0))
    l2 = float(jax.jit(loss_h)(mu0))
    l3 = float(jax.jit(loss_fused)(mu0))
    print(f"loss parity: current={l1:.6f} hoisted={l2:.6f} fused={l3:.6f}")

    for name, fn in [
        ("grad current      ", jax.jit(jax.grad(loss_current))),
        ("grad hoisted+d2   ", jax.jit(jax.grad(loss_h))),
        ("3xAdam fori cur   ", jax.jit(adam_fori(loss_current))),
        ("3xAdam fori hoist ", jax.jit(adam_fori(loss_h))),
        ("grad fused-vjp    ", jax.jit(jax.grad(loss_fused))),
        ("3xAdam fori fused ", jax.jit(adam_fori(loss_fused))),
    ]:
        ms, cs = timeit(fn, mu0)
        print(f"{name}: {ms:8.3f} ms  (compile {cs:.1f}s)")


def cost_analysis():
    fn = jax.jit(adam_fori(make_loss_hoisted()))
    c = fn.lower(mu0).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0)
    bytes_ = ca.get("bytes accessed", 0)
    print(f"N={N} flops={flops/1e9:.3f} GF  bytes={bytes_/1e6:.1f} MB  "
          f"flop_time@1.9T={flops/1.9e12*1e3:.3f} ms  "
          f"mem_time@819GBps={bytes_/819e9*1e3:.3f} ms")
    for k in sorted(ca):
        if "utilization" not in k and ca[k] > 1e6:
            print(f"  {k}: {ca[k]:.3e}")
