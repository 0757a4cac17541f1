"""Training losses.

Parity target: ``compute_policy_loss`` and friends (nusc_train.py:370-526),
decomposed into small pure functions the train engine composes (instead of
the reference's single branchy function):

- STL hinge loss                      (nusc_train.py:411)
- diffusion epsilon-MSE, optionally masked to STL-satisfying augmented
  samples (``--stl_bc_mask``)          (nusc_train.py:435-439)
- DPP diversity loss over candidate shards (nusc_train.py:442-465)
- RefineNet regularization            (nusc_train.py:466-478)
- VAE recon + KL                      (nusc_train.py:482-493)
- BC MSE                              (nusc_train.py:495-505)
- TrafficSim collision loss           (nusc_train.py:416-421)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pstl_tpu.config import Config
from pstl_tpu.specs import mask_mean

Array = jax.Array


def stl_hinge(scores: Array, valid: Array, thres: float,
              weight: float = 1.0) -> Array:
    """mask_mean(relu(thres - scores), valid) * weight."""
    return mask_mean(jax.nn.relu(thres - scores), valid) * weight


def diffusion_eps_mse(noise: Array, eps_hat: Array, dense_scores: Array,
                      dense_valids: Array, cfg: Config) -> Array:
    """epsilon-prediction MSE; with ``stl_bc_mask`` only STL-satisfying
    augmented samples contribute (nusc_train.py:435-439)."""
    if cfg.stl_bc_mask:
        m = (dense_scores.reshape(-1) * dense_valids.reshape(-1) > 0)
        m = m.astype(noise.dtype)[:, None]
        return mask_mean(jnp.square(noise - eps_hat), m)
    return jnp.mean(jnp.square(noise - eps_hat))


def dpp_diversity(rect_controls: Array, scores: Array, cfg: Config) -> Array:
    """Expected-cardinality DPP diversity loss (nusc_train.py:442-465).

    rect_controls: (bs*n_randoms*3, nt, 2); scores: (bs*n_randoms*3,).
    Candidates are grouped per (scene, maneuver, shard); similarity is an RBF
    kernel over normalized control vectors; quality weights gate on score>0.
    Returns the loss (negative mean expected cardinality) * diversity_weight.
    """
    NS = cfg.n_shards
    M = cfg.n_randoms
    bs = rect_controls.shape[0] // (M * 3)
    g = M // NS
    samples = rect_controls.reshape(bs, M, 3, cfg.nt * 2)
    samples = jnp.transpose(samples, (0, 2, 1, 3)).reshape(
        bs * 3 * NS, g, cfg.nt, 2)
    normal = jnp.asarray([cfg.mul_w_max, cfg.mul_a_max],
                         dtype=samples.dtype)
    samples = (samples / normal).reshape(bs * 3 * NS, g, cfg.nt * 2)
    quality = scores.reshape(bs, M, 3)
    quality = jnp.transpose(quality, (0, 2, 1)).reshape(bs * 3 * NS, g)

    diff = samples[:, :, None] - samples[:, None, :]
    # safe norm: plain jnp.linalg.norm has a NaN gradient at the zero
    # diagonal; the +eps keeps d(dist)/d(samples) finite (and 0) there
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    sim = jnp.exp(-cfg.diversity_scale * dist)
    if cfg.diverse_detach:
        q = jax.lax.stop_gradient((quality > 0).astype(sim.dtype))
    else:
        q = jnp.exp(quality) * (quality > 0).astype(sim.dtype)
    # L = Q S Q with Q diagonal
    L = sim * q[:, :, None] * q[:, None, :]
    eye = jnp.eye(g, dtype=L.dtype)
    inv = jnp.linalg.inv(L + eye)
    diversity = jnp.trace(eye[None] - inv, axis1=-2, axis2=-1)
    return -jnp.mean(diversity) * cfg.diversity_weight


def rect_reg(rect_controls: Array, nn_controls: Array, scores: Array,
             cfg: Config) -> Tuple[Array, Array]:
    """RefineNet stay-close regularizer (nusc_train.py:466-478).

    With diverse_loss: L2 to the pre-rectified controls masked to
    already-satisfying samples.  Otherwise: normalized L2 plus an optional
    out-of-bounds penalty.  Returns (loss_reg, extra_loss_reg).
    """
    base = jax.lax.stop_gradient(nn_controls)
    if cfg.diverse_loss:
        m = (scores[:, None, None] >= 0).astype(rect_controls.dtype)
        return mask_mean(jnp.square(rect_controls - base), m), jnp.zeros(())
    reg = (jnp.mean(jnp.square((rect_controls[..., 0] - base[..., 0])
                               / cfg.mul_w_max))
           + jnp.mean(jnp.square((rect_controls[..., 1] - base[..., 1])
                                 / cfg.mul_a_max)))
    reg = reg * cfg.rect_reg_loss
    if cfg.extra_rect_reg is not None:
        extra = (jnp.mean(jax.nn.relu(
                     (rect_controls[..., 0] / cfg.mul_w_max) ** 2 - 1))
                 + jnp.mean(jax.nn.relu(
                     (rect_controls[..., 1] / cfg.mul_a_max) ** 2 - 1)))
        extra = extra * cfg.extra_rect_reg
    else:
        extra = jnp.zeros(())
    return reg, extra


def vae_losses(nn_controls: Array, dense_controls: Array,
               latent_stats, dense_scores: Array, dense_valids: Array,
               cfg: Config) -> Tuple[Array, Array]:
    """(recon, KL) — nusc_train.py:482-493."""
    mean, logstd, std = latent_stats
    nnf = nn_controls.reshape(-1, cfg.nt, 2)
    dcf = dense_controls.reshape(-1, cfg.nt, 2)
    sq = jnp.square(nnf[:, :-1, :2] - dcf[:, :-1, :2])
    if cfg.stl_bc_mask:
        m = (dense_scores.reshape(-1) * dense_valids.reshape(-1) > 0)
        m = m.astype(sq.dtype)[:, None, None]
        recon = mask_mean(sq, m) * cfg.weight_vae_bc
    else:
        recon = jnp.mean(sq) * cfg.weight_vae_bc
    recon = recon * cfg.bc_weight
    kl = (-0.5 * jnp.mean(1 + 2 * logstd - mean * mean - std * std)
          ) * cfg.weight_vae_kl
    return recon, kl


def bc_mse(nn_controls: Array, dense_controls: Array, dense_scores: Array,
           dense_valids: Array, cfg: Config) -> Array:
    """nusc_train.py:495-505."""
    nnf = nn_controls.reshape(-1, cfg.nt, 2)
    dcf = dense_controls.reshape(-1, cfg.nt, 2)
    sq = jnp.square(nnf[:, :-1, :2] - dcf[:, :-1, :2])
    if cfg.stl_bc_mask:
        m = (dense_scores.reshape(-1) * dense_valids.reshape(-1) > 0)
        m = m.astype(sq.dtype)[:, None, None]
        loss = mask_mean(sq, m)
    else:
        loss = jnp.mean(sq)
    return loss * cfg.bc_weight


def collision(min_centroid_d: Array, radius_sum: Array, cfg: Config) -> Array:
    """TrafficSim-style collision loss (nusc_train.py:416-421)."""
    coll = jax.nn.relu(1 - min_centroid_d / jnp.clip(radius_sum, 1e-1))
    return (jnp.mean(jnp.clip(jnp.sum(coll, axis=-1), a_max=1.0))
            * (cfg.collision_loss or 0.0))
