"""Candidate-minor layout prototype for the guidance inner loop.

Hypothesis (round 3): every hot fusion in the guidance loss runs on tensors
whose MINOR dims are tiny (T=20, S=15, nL*nL=16), wasting ~85% of the VPU's
(8, 128) vector tiles.  Restructuring so the large candidate axis R = 3*M
(=192) is minor should recover most of the gap to the speed-of-light table
in docs/PERF.md.

Variants:
  tiled      — production TiledScorer path (row-major, T minor)
  candminor  — same math, (bs, T, R) / (bs, K, T, nLe, nLn, R) layouts,
               j-major candidate index r = j*M + m
  candminor-bf16 — robustness reductions in bf16
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

BS = int(os.environ.get("P_BS", "16"))
cfg = Config(diffusion=True, rect_head=True, guidance=True, flex=True,
             n_randoms=64).finalize()
M = cfg.n_randoms
R = M * 3
N = BS * R
T = cfg.nt
S = cfg.n_segs
NL = cfg.refined_nL
TAU = cfg.smoothing_factor

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
mu0 = jax.random.normal(jax.random.PRNGKey(1), (N, T * 2))
beta_t = jnp.float32(0.01)


def timeit(fn, *args, iters=30, reps=3):
    """Pipelined timing: queue ``iters`` async dispatches, block once —
    measures device time, not the tunnel's per-dispatch latency (which is
    ~28 ms and noisy).  Median of ``reps`` batches."""
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


# ---------------------------------------------------------------- baseline
def make_loss_tiled():
    sr = specs.make_score_rows(batch, dense, cfg, None)

    def loss(mu):
        u = diffusion.denormalize_controls(mu, cfg, clip=False)
        trajs = dyn.rollout(states_flat, u, cfg.dt)
        return specs.mask_mean(jax.nn.relu(100.0 - sr(trajs[:, :-1])), valid)

    return loss


# --------------------------------------------------- candidate-minor layout
def m2j(x, feat_shape=()):
    """(N, *feat) m-major -> (bs, *feat, R) j-major."""
    x = x.reshape((BS, M, 3) + feat_shape)
    perm = (0,) + tuple(range(3, 3 + len(feat_shape))) + (2, 1)
    x = jnp.transpose(x, perm)
    return x.reshape((BS,) + feat_shape + (R,))


def j2m(x, feat_shape=()):
    """(bs, *feat, R) j-major -> (N, *feat) m-major."""
    x = x.reshape((BS,) + feat_shape + (3, M))
    nf = len(feat_shape)
    perm = (0, nf + 2, nf + 1) + tuple(range(1, 1 + nf))
    return jnp.transpose(x, perm).reshape((N,) + feat_shape)


def make_loss_candminor(rdtype=jnp.float32):
    # ----- hoisted constants (built once per plan) -----
    lanes = jnp.stack([batch["currlane_wpts"], batch["leftlane_wpts"],
                       batch["rightlane_wpts"]], axis=1)      # (bs, 3, S, 3)
    lane_r = jnp.repeat(lanes, M, axis=1)                     # (bs, R, S, 3)
    lane_r = jnp.moveaxis(lane_r, 1, -1)                      # (bs, S, 3, R)
    lxr, lyr, lthr = lane_r[:, :, 0], lane_r[:, :, 1], lane_r[:, :, 2]

    nei = batch["neighbor_trajs_aug"]                          # (bs, K, T, 7)
    nvalid = nei[..., 0]
    nx0, ny0, nth = nei[..., 1], nei[..., 2], nei[..., 3]
    Ln, Wn = nei[..., 5], nei[..., 6]
    rn = Wn / 2.0
    alpha = jnp.linspace(0.0, 1.0, NL)
    axn = ((-Ln / 2 + rn)[..., None] * (1 - alpha)
           + (Ln / 2 - rn)[..., None] * alpha)                 # (bs,K,T,NL)
    nx = nx0[..., None] + axn * jnp.cos(nth)[..., None]
    ny = ny0[..., None] + axn * jnp.sin(nth)[..., None]
    re = cfg.ego_W / 2.0
    axe = jnp.linspace(-cfg.ego_L / 2 + re, cfg.ego_L / 2 - re, NL)

    stlp_r = m2j(dense["stlp_dense"][:, 0, :], (6,))           # (bs, 6, R)
    P = lambda i: stlp_r[:, i][:, None, :]                     # (bs, 1, R)
    Ps = lambda i, sl: stlp_r[:, i, sl][:, None, :]

    valid_r = m2j(valid)                                       # (bs, R)

    s0 = states                                                # (bs, 4)
    x0 = s0[:, 0][:, None, None]
    y0 = s0[:, 1][:, None, None]
    th0 = s0[:, 2][:, None, None]
    v0 = s0[:, 3][:, None, None]

    nt2 = T // 2

    def alw(g, axis=1):
        g = g.astype(rdtype)
        return -jax.scipy.special.logsumexp(-g * TAU, axis=axis) / TAU

    def ev_alw(g):
        # suffix soft-min over T (axis 1) then soft-max over first nt2
        g = g.astype(rdtype)
        from pstl_tpu.ops import stl
        suffix = -stl.logcumsumexp(-g * TAU, axis=1, reverse=True) / TAU
        return jax.scipy.special.logsumexp(
            suffix[:, :nt2] * TAU, axis=1) / TAU

    def loss(muT):
        # muT: (bs, T, 2, R) j-major
        w = muT[:, :, 0, :] * cfg.mul_w_max                    # (bs, T, R)
        a = muT[:, :, 1, :] * cfg.mul_a_max
        th_in = th0 + cfg.dt * jnp.cumsum(w, axis=1)           # theta_{1..T}
        v_in = v0 + cfg.dt * jnp.cumsum(a, axis=1)
        th_s = jnp.concatenate(
            [jnp.broadcast_to(th0, (BS, 1, R)), th_in[:, :-1]], axis=1)
        v_s = jnp.concatenate(
            [jnp.broadcast_to(v0, (BS, 1, R)), v_in[:, :-1]], axis=1)
        cth, sth = jnp.cos(th_s), jnp.sin(th_s)
        dx = v_s * cth * cfg.dt
        dy = v_s * sth * cfg.dt
        zer = jnp.zeros((BS, 1, R))
        x_s = x0 + jnp.concatenate([zer, jnp.cumsum(dx, axis=1)[:, :-1]],
                                   axis=1)
        y_s = y0 + jnp.concatenate([zer, jnp.cumsum(dy, axis=1)[:, :-1]],
                                   axis=1)

        # ---- lane distance (per-row lane already baked into lane_r) ----
        pdx = x_s[:, :, None, :] - lxr[:, None]                # (bs,T,S,R)
        pdy = y_s[:, :, None, :] - lyr[:, None]
        pd = jnp.sqrt(pdx * pdx + pdy * pdy)
        segc = pd[:, :, :-1] + pd[:, :, 1:]                    # (bs,T,S-1,R)
        mi = jnp.argmin(segc, axis=2)                          # (bs,T,R)
        sel = (jnp.arange(S - 1)[None, None, :, None]
               == mi[:, :, None, :]).astype(jnp.float32)       # (bs,T,S-1,R)
        sel = jax.lax.stop_gradient(sel)
        x2 = jnp.einsum("btsr,bsr->btr", sel, lxr[:, :-1])
        y2 = jnp.einsum("btsr,bsr->btr", sel, lyr[:, :-1])
        th2 = jnp.einsum("btsr,bsr->btr", sel, lthr[:, :-1])
        x3 = jnp.einsum("btsr,bsr->btr", sel, lxr[:, 1:])
        y3 = jnp.einsum("btsr,bsr->btr", sel, lyr[:, 1:])
        area = (x_s * (y2 - y3) + x2 * (y3 - y_s) + x3 * (y_s - y2))
        bottom = jnp.sqrt((x2 - x3) ** 2 + (y2 - y3) ** 2)
        l2d = jnp.sqrt(jnp.clip((x_s - x2) ** 2 + (y_s - y2) ** 2, 1e-3))
        normal = (bottom != 0).astype(jnp.float32)
        d_all = (normal * area / jnp.clip(bottom, 1e-7)
                 + (1 - normal) * l2d)                         # (bs,T,R)
        if cfg.clip_dist:
            d_all = jnp.clip(d_all, -5.0, 5.0)
        th_all = 1.0 - jnp.cos(th2 - th_s)

        # ---- neighbor clearance ----
        exd = x_s[:, :, None, :] + axe[None, None, :, None] * cth[:, :, None, :]
        eyd = y_s[:, :, None, :] + axe[None, None, :, None] * sth[:, :, None, :]
        dxp = (exd[:, None, :, :, None, :]
               - nx[:, :, :, None, :, None])       # (bs,K,T,nLe,nLn,R)
        dyp = eyd[:, None, :, :, None, :] - ny[:, :, :, None, :, None]
        d2 = jnp.min(dxp * dxp + dyp * dyp, axis=(3, 4))       # (bs,K,T,R)
        per = jnp.sqrt(d2 + 1e-12) - re - rn[..., None]
        vk = nvalid[..., None]
        masked = jnp.clip(per, -5.0, 20.0) * vk + (1.0 - vk) * 100.0
        mnd = jnp.min(masked, axis=1)                          # (bs,T,R)

        # ---- clauses ----
        alw_vmin = alw(v_s - P(0))                             # (bs, R)
        alw_vmax = alw(-v_s + P(1))
        alw_safe = alw(mnd - P(4))

        kM = slice(0, M)
        cM = slice(M, R)
        thk = Ps(5, kM)
        g_keep = jnp.stack([
            d_all[..., kM] - Ps(2, kM)[:, :, :],
            -d_all[..., kM] + Ps(3, kM),
            (thk - th_all[..., kM]) / thk,
        ], axis=1)                                             # (bs,3,T,M)
        alw_keep = alw(g_keep, axis=2)                         # (bs,3,M)
        s_keep = -jax.scipy.special.logsumexp(jnp.stack([
            -alw_vmin[:, kM], -alw_vmax[:, kM], -alw_keep[:, 0],
            -alw_keep[:, 1], -alw_keep[:, 2], -alw_safe[:, kM]],
            axis=1).astype(rdtype) * TAU, axis=1) / TAU        # (bs, M)

        d_c = d_all[..., cM]                                   # (bs,T,2M)
        band = -jax.scipy.special.logsumexp(jnp.stack([
            -(d_c - Ps(2, cM)), -(-d_c + Ps(3, cM))],
            axis=1).astype(rdtype) * TAU, axis=1) / TAU        # (bs,T,2M)
        ev_d = ev_alw(band)                                    # (bs, 2M)
        thc = Ps(5, cM)
        ev_th = ev_alw((thc - th_all[..., cM]) / thc)
        s_change = -jax.scipy.special.logsumexp(jnp.stack([
            -alw_vmin[:, cM], -alw_vmax[:, cM], -ev_d, -ev_th,
            -alw_safe[:, cM]], axis=1).astype(rdtype) * TAU,
            axis=1) / TAU                                      # (bs, 2M)

        scores = jnp.concatenate([s_keep, s_change], axis=1)   # (bs, R)
        scores = scores.astype(jnp.float32)
        return specs.mask_mean(jax.nn.relu(100.0 - scores), valid_r)

    return loss


def adam3(loss_fn):
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
    l_tiled = make_loss_tiled()
    l_cm = make_loss_candminor()
    l_cm16 = make_loss_candminor(jnp.bfloat16)
    muT0 = m2j(mu0.reshape(N, T, 2), (T, 2))                  # (bs,T,2,R)
    v1 = float(jax.jit(l_tiled)(mu0))
    v2 = float(jax.jit(l_cm)(muT0))
    v3 = float(jax.jit(l_cm16)(muT0))
    print(f"loss parity: tiled={v1:.6f} candminor={v2:.6f} cm-bf16={v3:.6f}")
    g1 = jax.jit(jax.grad(l_tiled))(mu0)
    g2 = j2m(jax.jit(jax.grad(l_cm))(muT0), (T, 2)).reshape(N, T * 2)
    diff = jnp.abs(g1 - g2)
    frac = float(jnp.mean((diff > 1e-4).astype(jnp.float32)))
    print(f"grad maxdiff: {float(jnp.max(diff)):.3e} "
          f"(scale {float(jnp.max(jnp.abs(g1))):.3e}, "
          f"frac>1e-4: {frac:.5f})")
    # remat(nothing_saveable): grad recomputes the forward INSIDE the
    # backward fusion — no residual tensors in HBM, ~2x FLOPs.  The
    # guidance loop is ~4:1 HBM-bound (docs/PERF.md), so trading flops for
    # bytes should win if XLA fuses the recompute.
    ns = jax.checkpoint_policies.nothing_saveable
    l_tiled_r = jax.checkpoint(l_tiled, policy=ns)
    l_cm_r = jax.checkpoint(l_cm, policy=ns)
    for name, fn, arg in [
        ("grad tiled        ", jax.jit(jax.grad(l_tiled)), mu0),
        ("grad tiled+remat  ", jax.jit(jax.grad(l_tiled_r)), mu0),
        ("grad candmin+remat", jax.jit(jax.grad(l_cm_r)), muT0),
        ("3xAdam tiled      ", jax.jit(adam3(l_tiled)), mu0),
        ("3xAdam tiled+rem  ", jax.jit(adam3(l_tiled_r)), mu0),
        ("3xAdam candmin+rem", jax.jit(adam3(l_cm_r)), muT0),
        ("3xAdam cm-bf16+rem",
         jax.jit(adam3(jax.checkpoint(l_cm16, policy=ns))), muT0),
    ]:
        ms, cs = timeit(fn, arg)
        print(f"{name}: {ms:8.3f} ms  (compile {cs:.1f}s)")
