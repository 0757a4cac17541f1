"""Microbenchmarks for the guidance hot loop on the real TPU.

Hypotheses to verify (round-2 perf work):
  H1: (n, T)-trailing layouts waste VPU lanes (T=20 << 128); transposing the
      hot math to (..., n)-trailing is a large win.
  H2: neighbor anchor points / norm factors are loop-invariant and should be
      hoisted out of the guidance Adam iterations.
  H3: min-over-squared-distances (sqrt after the reduce) beats norm-then-min.
  H4: the Pallas min-clearance kernel compiles in reasonable time on this
      toolchain and beats the XLA path.

Run:  python scripts/perf_micro.py [case ...]
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

from pstl_tpu.config import Config
from pstl_tpu.ops import geometry as geom

N, K, T, NL = 3072, 8, 20, 4
EGO_L, EGO_W = 4.084, 1.730


def timeit(fn, *args, iters=30):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    # warm
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3, compile_s


def data(n=N):
    rng = np.random.RandomState(0)
    ego = jnp.asarray(rng.randn(n, T, 4).astype(np.float32))
    nei = jnp.asarray(rng.randn(n, K, T, 7).astype(np.float32) * 5)
    nei = nei.at[..., 0].set((nei[..., 0] > 0).astype(jnp.float32))
    nei = nei.at[..., 5].set(4.0).at[..., 6].set(1.7)
    u = jnp.asarray(rng.randn(n, T, 2).astype(np.float32) * 0.1)
    s0 = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    lanes = jnp.asarray(rng.randn(n, 15, 3).astype(np.float32) * 3)
    return ego, nei, u, s0, lanes


def case_clearance_xla(n=N):
    """Current XLA path: norm -> clip -> mask -> min (n,K,T,4,4)."""
    ego, nei, *_ = data(n)

    def loss(ego_traj):
        d = geom.min_neighbor_distance(ego_traj, nei[..., 1:7], nei[..., 0],
                                       EGO_L, EGO_W, NL, 1)
        return jnp.sum(d)

    g = jax.jit(jax.grad(loss))
    ms, cs = timeit(g, ego)
    print(f"clearance_xla        n={n}: {ms:8.3f} ms  (compile {cs:.1f}s)")


def case_clearance_d2(n=N):
    """d2-min then sqrt, same (n,...) layout."""
    ego, nei, *_ = data(n)
    # precompute neighbor anchors (hoisted)
    nx0, ny0, nth = nei[..., 1], nei[..., 2], nei[..., 3]
    Ln, Wn = nei[..., 5], nei[..., 6]
    rn = Wn / 2
    alpha = jnp.linspace(0.0, 1.0, NL)
    axn = ((-Ln / 2 + rn)[..., None] * (1 - alpha)
           + (Ln / 2 - rn)[..., None] * alpha)          # (n,K,T,NL)
    nx = nx0[..., None] + axn * jnp.cos(nth)[..., None]
    ny = ny0[..., None] + axn * jnp.sin(nth)[..., None]
    valid = nei[..., 0]
    re = EGO_W / 2
    axe = jnp.linspace(-EGO_L / 2 + re, EGO_L / 2 - re, NL)

    def loss(ego_traj):
        x, y, th = ego_traj[..., 0], ego_traj[..., 1], ego_traj[..., 2]
        ex = x[..., None] + axe * jnp.cos(th)[..., None]   # (n,T,NL)
        ey = y[..., None] + axe * jnp.sin(th)[..., None]
        dx = ex[:, None, :, :, None] - nx[:, :, :, None, :]  # (n,K,T,NL,NL)
        dy = ey[:, None, :, :, None] - ny[:, :, :, None, :]
        d2 = jnp.min(dx * dx + dy * dy, axis=(-2, -1))       # (n,K,T)
        per = jnp.sqrt(d2 + 1e-12) - re - rn
        masked = jnp.clip(per, -5, 20) * valid + (1 - valid) * 100.0
        return jnp.sum(jnp.min(masked, axis=1))

    g = jax.jit(jax.grad(loss))
    ms, cs = timeit(g, ego)
    print(f"clearance_d2_hoist   n={n}: {ms:8.3f} ms  (compile {cs:.1f}s)")


def case_clearance_T(n=N):
    """Transposed layout: everything (..., T, n) with n in lanes."""
    ego, nei, *_ = data(n)
    egoT = jnp.transpose(ego, (2, 1, 0))                  # (4, T, n)
    neiT = jnp.transpose(nei, (3, 1, 2, 0))               # (7, K, T, n)
    nx0, ny0, nth = neiT[1], neiT[2], neiT[3]
    Ln, Wn = neiT[5], neiT[6]
    rn = Wn / 2
    alpha = jnp.linspace(0.0, 1.0, NL).reshape(NL, 1, 1, 1)
    axn = (-Ln / 2 + rn) * (1 - alpha) + (Ln / 2 - rn) * alpha  # (NL,K,T,n)
    nx = nx0 + axn * jnp.cos(nth)
    ny = ny0 + axn * jnp.sin(nth)
    valid = neiT[0]                                        # (K, T, n)
    re = EGO_W / 2
    axe = jnp.linspace(-EGO_L / 2 + re, EGO_L / 2 - re, NL)

    def loss(ego_traj):                                    # (4, T, n)
        x, y, th = ego_traj[0], ego_traj[1], ego_traj[2]
        cth, sth = jnp.cos(th), jnp.sin(th)
        d2 = None
        for i in range(NL):
            exi = x + axe[i] * cth                         # (T, n)
            eyi = y + axe[i] * sth
            dx = exi - nx                                  # (NL, K, T, n)
            dy = eyi - ny
            d2i = jnp.min(dx * dx + dy * dy, axis=0)       # (K, T, n)
            d2 = d2i if d2 is None else jnp.minimum(d2, d2i)
        per = jnp.sqrt(d2 + 1e-12) - re - rn
        masked = jnp.clip(per, -5, 20) * valid + (1 - valid) * 100.0
        return jnp.sum(jnp.min(masked, axis=0))

    g = jax.jit(jax.grad(loss))
    ms, cs = timeit(g, egoT)
    print(f"clearance_T_lanes    n={n}: {ms:8.3f} ms  (compile {cs:.1f}s)")


def case_stl_layouts(n=N):
    """logsumexp reductions: (n, T) vs (T, n)."""
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randn(n, T).astype(np.float32))
    aT = a.T

    def loss_nT(x):
        return jnp.sum(jax.scipy.special.logsumexp(x * 100.0, axis=-1))

    def loss_Tn(x):
        return jnp.sum(jax.scipy.special.logsumexp(x * 100.0, axis=0))

    g1 = jax.jit(jax.grad(loss_nT))
    g2 = jax.jit(jax.grad(loss_Tn))
    ms1, _ = timeit(g1, a, iters=100)
    ms2, _ = timeit(g2, aT, iters=100)
    print(f"stl logsumexp grad   (n,T): {ms1:8.3f} ms   (T,n): {ms2:8.3f} ms")


def case_rollout_layouts(n=N):
    from pstl_tpu.ops import dynamics as dyn
    _, _, u, s0, _ = data(n)

    def loss(us):
        return jnp.sum(dyn.rollout(s0, us, 0.5))

    g = jax.jit(jax.grad(loss))
    ms, _ = timeit(g, u, iters=100)

    uT = jnp.transpose(u, (2, 1, 0))   # (2, T, n)
    s0T = s0.T                          # (4, n)

    def rolloutT(s0T, usT, dt):
        w, a = usT[0], usT[1]          # (T, n)
        th = s0T[2] + dt * jnp.cumsum(w, axis=0)
        v = s0T[3] + dt * jnp.cumsum(a, axis=0)
        th_full = jnp.concatenate([s0T[2][None], th], axis=0)
        v_full = jnp.concatenate([s0T[3][None], v], axis=0)
        dx = v_full[:-1] * jnp.cos(th_full[:-1]) * dt
        dy = v_full[:-1] * jnp.sin(th_full[:-1]) * dt
        x = s0T[0] + jnp.cumsum(dx, axis=0)
        y = s0T[1] + jnp.cumsum(dy, axis=0)
        return jnp.stack([x, y, th, v])

    def lossT(usT):
        return jnp.sum(rolloutT(s0T, usT, 0.5))

    gT = jax.jit(jax.grad(lossT))
    msT, _ = timeit(gT, uT, iters=100)
    print(f"rollout grad         (n,T): {ms:8.3f} ms   (T,n): {msT:8.3f} ms")


def case_lanes_layouts(n=N):
    ego, _, _, _, lanes = data(n)

    def loss(pts):
        d, th = geom.point_to_polyline(pts, lanes, with_angle=True)
        return jnp.sum(d) + jnp.sum(th)

    g = jax.jit(jax.grad(loss))
    ms, _ = timeit(g, ego[..., :3], iters=100)

    ptsT = jnp.transpose(ego[..., :3], (2, 1, 0))   # (3, T, n)
    lanesT = jnp.transpose(lanes, (2, 1, 0))        # (3, S, n)

    def lossT(ptsT):
        S = lanesT.shape[1]
        px, py, pth = ptsT[0], ptsT[1], ptsT[2]             # (T, n)
        lx, ly = lanesT[0][:, None], lanesT[1][:, None]     # (S, 1, n)
        pd = jnp.sqrt((px - lx) ** 2 + (py - ly) ** 2)      # (S, T, n)
        min_idx = jnp.argmin(pd[:-1] + pd[1:], axis=0)      # (T, n)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (S - 1, T, n), 0)
               == min_idx)                                   # (S-1, T, n)
        selF = sel.astype(jnp.float32)
        x2 = jnp.sum(selF * lx[:-1], axis=0)
        y2 = jnp.sum(selF * ly[:-1], axis=0)
        th2 = jnp.sum(selF * lanesT[2][:-1, None], axis=0)
        x3 = jnp.sum(selF * lx[1:], axis=0)
        y3 = jnp.sum(selF * ly[1:], axis=0)
        area = px * (y2 - y3) + x2 * (y3 - py) + x3 * (py - y2)
        bl = jnp.sqrt((x2 - x3) ** 2 + (y2 - y3) ** 2)
        d = area / jnp.clip(bl, 1e-7)
        ad = 1 - jnp.cos(th2 - pth)
        return jnp.sum(d) + jnp.sum(ad)

    gT = jax.jit(jax.grad(lossT))
    msT, _ = timeit(gT, ptsT, iters=100)
    print(f"lanes grad           (n,T): {ms:8.3f} ms   (T,n): {msT:8.3f} ms")


def case_pallas(n=N):
    ego, nei, *_ = data(n)
    from pstl_tpu.ops import pallas_kernels as pk

    def loss(ego_traj):
        d = pk.min_neighbor_distance_fused(ego_traj, nei[..., 1:7],
                                           nei[..., 0], EGO_L, EGO_W, NL)
        return jnp.sum(d)

    g = jax.jit(jax.grad(loss))
    ms, cs = timeit(g, ego)
    print(f"clearance_pallas     n={n}: {ms:8.3f} ms  (compile {cs:.1f}s)")


CASES = {
    "xla": case_clearance_xla,
    "d2": case_clearance_d2,
    "T": case_clearance_T,
    "stl": case_stl_layouts,
    "rollout": case_rollout_layouts,
    "lanes": case_lanes_layouts,
    "pallas": case_pallas,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["xla", "d2", "T", "stl", "rollout", "lanes"]
    print(f"device: {jax.devices()[0]}")
    for nm in names:
        CASES[nm]()
