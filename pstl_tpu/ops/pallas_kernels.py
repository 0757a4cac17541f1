"""Pallas TPU kernels for the hot guidance-loop ops.

``min_clearance``: fused anchor-disc minimum clearance between the ego box
and K neighbor boxes per timestep — the dominant geometry op inside the STL
guidance gradient (evaluated 99 x guidance_niters times per plan step).  The
XLA path (``geometry.min_neighbor_distance``) materializes the
(n, K, T, nL, nL) pairwise tensors in HBM for the forward AND the transpose;
this kernel keeps everything in VMEM per block and exposes a hand-written
VJP (recompute-in-backward, no residuals), so one guidance evaluation does a
single HBM read of the inputs.

Semantics match ``nusc_train.py:142-148`` / ``utils.py:465-526`` with
nW = 1 (the reference default): per-neighbor clearance = min over disc pairs
of (center distance − r_ego − r_nei), clipped to [−5, 20], invalid neighbors
replaced by 100, min over K.  With nW = 1 the disc radius reduces to W/2
exactly (r = min(max(L/(2 nL), W/2), W/2) = W/2).

Falls back to the jnp implementation when Pallas is unavailable or nW != 1.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pstl_tpu.ops import geometry as geom

Array = jax.Array

try:
    from jax.experimental import pallas as pl
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _disc_geometry(ego_xyth, nei, ego_L, ego_W, nL):
    """Shared forward math on one block (pure jnp, runs inside the kernel).

    ego_xyth: (B, T, 3); nei: (B, K, T, 7).
    Returns (masked (B, K, T), diff terms needed by bwd).
    """
    x, y, th = ego_xyth[..., 0], ego_xyth[..., 1], ego_xyth[..., 2]
    re = ego_W / 2.0

    def linspace01(shape, dim):
        # linspace(0,1,nL) from an integer iota at full rank: float iota,
        # captured constants, and 1-D vectors are all rejected by Mosaic
        return (jax.lax.broadcasted_iota(jnp.int32, shape, dim)
                .astype(jnp.float32) / max(nL - 1, 1))

    alpha3 = linspace01((1, 1, nL), 2)               # for (B, T, nL)
    ax3 = ((-ego_L / 2 + re) * (1 - alpha3)
           + (ego_L / 2 - re) * alpha3)              # (1, 1, nL)
    cth, sth = jnp.cos(th), jnp.sin(th)
    ex = x[..., None] + ax3 * cth[..., None]         # (B, T, nL)
    ey = y[..., None] + ax3 * sth[..., None]

    # neighbor tensors rearranged to (B, T, K, ...) so every reduction is
    # over a TRAILING axis (Mosaic cannot lower middle-dim multi_reductions)
    neiT = jnp.swapaxes(nei, 1, 2)                    # (B, T, K, 7)
    valid = neiT[..., 0]                              # (B, T, K)
    nx0, ny0, nth = neiT[..., 1], neiT[..., 2], neiT[..., 3]
    Ln, Wn = neiT[..., 5], neiT[..., 6]
    rn = Wn / 2.0
    half0 = -Ln / 2 + rn
    half1 = Ln / 2 - rn
    alpha4 = linspace01((1, 1, 1, nL), 3)
    axn = half0[..., None] * (1 - alpha4) + half1[..., None] * alpha4
    ncth, nsth = jnp.cos(nth), jnp.sin(nth)
    nx = nx0[..., None] + axn * ncth[..., None]       # (B, T, K, nL)
    ny = ny0[..., None] + axn * nsth[..., None]

    # pairwise min distance via a static unrolled loop over the nL ego
    # discs — Mosaic supports neither middle-axis reductions nor trailing
    # reshapes, so every jnp.min here runs over the trailing (nL) axis, and
    # the sqrt happens after the min (monotone)
    B, T, K = valid.shape
    d2min = None
    for i in range(nL):
        exi = jax.lax.slice_in_dim(ex, i, i + 1, axis=-1)[:, :, None, :]
        eyi = jax.lax.slice_in_dim(ey, i, i + 1, axis=-1)[:, :, None, :]
        dxi = exi - nx                                   # (B, T, K, nL)
        dyi = eyi - ny
        d2i = jnp.min(dxi * dxi + dyi * dyi, axis=-1)    # (B, T, K)
        d2min = d2i if d2min is None else jnp.minimum(d2min, d2i)
    dist_min = jnp.sqrt(d2min + 1e-12)
    per_nei = dist_min - re - rn                         # (B, T, K)
    clipped = jnp.clip(per_nei, -5.0, 20.0)
    masked = clipped * valid + (1 - valid) * 100.0
    return masked, (ex, ey, nx, ny, d2min, dist_min, per_nei, valid, ax3,
                    cth, sth)


def _fwd_block(ego_xyth, nei, ego_L, ego_W, nL):
    masked, _ = _disc_geometry(ego_xyth, nei, ego_L, ego_W, nL)
    return jnp.min(masked, axis=-1)                   # min over K -> (B, T)


def _bwd_block(ego_xyth, nei, g, ego_L, ego_W, nL):
    """Cotangent routing (recompute): g (B, T) -> d ego_xyth (B, T, 3)."""
    masked, (ex, ey, nx, ny, d2min, dist_min, per_nei, valid, ax3, cth,
             sth) = _disc_geometry(ego_xyth, nei, ego_L, ego_W, nL)
    out = jnp.min(masked, axis=-1, keepdims=True)     # (B, T, 1)
    # tie-splitting min VJP over K (matches jnp.min)
    eqK = (masked == out).astype(g.dtype)
    wK = eqK / jnp.maximum(jnp.sum(eqK, axis=-1, keepdims=True), 1.0)
    gate = ((per_nei > -5.0) & (per_nei < 20.0)).astype(g.dtype) * valid
    gK = g[..., None] * wK * gate                     # (B, T, K)
    # pair ties: count eq pairs across the static ego-disc loop, then route
    cnt = None
    eq_i = []
    for i in range(nL):
        exi = jax.lax.slice_in_dim(ex, i, i + 1, axis=-1)[:, :, None, :]
        eyi = jax.lax.slice_in_dim(ey, i, i + 1, axis=-1)[:, :, None, :]
        dxi = exi - nx                                   # (B, T, K, nL)
        dyi = eyi - ny
        e = ((dxi * dxi + dyi * dyi) == d2min[..., None]).astype(g.dtype)
        eq_i.append(e)
        s = jnp.sum(e, axis=-1)                       # (B, T, K)
        cnt = s if cnt is None else cnt + s
    gKn = gK / jnp.maximum(cnt, 1.0) / dist_min       # d/d d2 chain: *0.5*2
    g_ex_list, g_ey_list = [], []
    for i in range(nL):
        exi = jax.lax.slice_in_dim(ex, i, i + 1, axis=-1)[:, :, None, :]
        eyi = jax.lax.slice_in_dim(ey, i, i + 1, axis=-1)[:, :, None, :]
        dxi = exi - nx
        dyi = eyi - ny
        gdx = jnp.sum(eq_i[i] * dxi, axis=-1) * gKn   # (B, T, K)
        gdy = jnp.sum(eq_i[i] * dyi, axis=-1) * gKn
        g_ex_list.append(jnp.sum(gdx, axis=-1))       # (B, T)
        g_ey_list.append(jnp.sum(gdy, axis=-1))
    g_ex = jnp.stack(g_ex_list, axis=-1)              # (B, T, nL)
    g_ey = jnp.stack(g_ey_list, axis=-1)
    gx = jnp.sum(g_ex, axis=-1)
    gy = jnp.sum(g_ey, axis=-1)
    gth = jnp.sum(g_ex * (-(ax3) * sth[..., None])
                  + g_ey * (ax3 * cth[..., None]), axis=-1)
    return jnp.stack([gx, gy, gth], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def min_clearance(ego_xyth: Array, nei: Array, ego_L: float, ego_W: float,
                  num_L: int = 4, block_n: int = 256,
                  interpret: bool = False) -> Array:
    """Fused masked min neighbor clearance.

    ego_xyth: (n, T, 3); nei: (n, K, T, 7).  Returns (n, T).
    Neighbors are constants of the guidance problem — no VJP w.r.t. them.
    """
    return _min_clearance_fwd(ego_xyth, nei, ego_L, ego_W, num_L, block_n,
                              interpret)[0]


def _pad_to_block(x, block_n):
    n = x.shape[0]
    pad = (-n) % block_n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


def _min_clearance_fwd(ego_xyth, nei, ego_L, ego_W, num_L, block_n,
                       interpret):
    ego_p, n = _pad_to_block(ego_xyth.astype(jnp.float32), block_n)
    nei_p, _ = _pad_to_block(nei.astype(jnp.float32), block_n)
    T = ego_p.shape[1]
    K = nei_p.shape[1]

    def kernel(ego_ref, nei_ref, out_ref):
        out_ref[...] = _fwd_block(ego_ref[...], nei_ref[...], ego_L, ego_W,
                                  num_L)

    call = pl.pallas_call(
        kernel,
        grid=(ego_p.shape[0] // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, T, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_n, K, T, 7), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, T), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ego_p.shape[0], T), jnp.float32),
        interpret=interpret,
    )
    out = call(ego_p, nei_p)[:n]
    return out, (ego_xyth, nei)


def _min_clearance_bwd(ego_L, ego_W, num_L, block_n, interpret, res, g):
    ego_xyth, nei = res
    ego_p, n = _pad_to_block(ego_xyth.astype(jnp.float32), block_n)
    nei_p, _ = _pad_to_block(nei.astype(jnp.float32), block_n)
    g_p, _ = _pad_to_block(g.astype(jnp.float32), block_n)
    T = ego_p.shape[1]
    K = nei_p.shape[1]

    def kernel(ego_ref, nei_ref, g_ref, out_ref):
        out_ref[...] = _bwd_block(ego_ref[...], nei_ref[...], g_ref[...],
                                  ego_L, ego_W, num_L)

    call = pl.pallas_call(
        kernel,
        grid=(ego_p.shape[0] // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, T, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_n, K, T, 7), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((block_n, T), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, T, 3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ego_p.shape[0], T, 3), jnp.float32),
        interpret=interpret,
    )
    d_ego = call(ego_p, nei_p, g_p)[:n].astype(ego_xyth.dtype)
    return d_ego, None


min_clearance.defvjp(_min_clearance_fwd, _min_clearance_bwd)


def min_neighbor_distance_fused(ego_traj: Array, nei_traj: Array,
                                nei_valid: Array, ego_L: float, ego_W: float,
                                num_L: int = 4, num_W: int = 1,
                                block_n: int = 256,
                                interpret: bool = False) -> Array:
    """Drop-in for ``geometry.min_neighbor_distance`` (non-full variant).

    ego_traj: (n, T, >=3); nei_traj: (n, K, T, >=6) rows (x,y,th,...,L,W);
    nei_valid: (n, K, T).
    """
    if not HAVE_PALLAS or num_W != 1:
        return geom.min_neighbor_distance(ego_traj, nei_traj, nei_valid,
                                          ego_L, ego_W, num_L, num_W)
    nei7 = jnp.concatenate(
        [nei_valid[..., None], nei_traj[..., 0:3],
         jnp.zeros_like(nei_traj[..., 0:1]),
         nei_traj[..., -2:-1], nei_traj[..., -1:]], axis=-1)
    return min_clearance(ego_traj[..., :3], jax.lax.stop_gradient(nei7),
                         ego_L, ego_W, num_L, block_n, interpret)
