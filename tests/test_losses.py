"""Loss functions vs. oracles and sanity properties."""

import numpy as np
import jax
import jax.numpy as jnp

from pstl_tpu import losses
from pstl_tpu.config import Config


def cfg_(**kw):
    kw.setdefault("n_randoms", 8)
    kw.setdefault("n_shards", 4)
    return Config(**kw)


def test_stl_hinge():
    scores = jnp.asarray([-1.0, 0.5, 2.0])
    valid = jnp.asarray([1.0, 1.0, 0.0])
    # relu(0.0005 - s) = [1.0005, 0, big-but-masked]
    got = float(losses.stl_hinge(scores, valid, 0.0005))
    want = (1.0005 + 0.0) / 3 / (2 / 3)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_diffusion_mse_masking():
    cfg = cfg_(stl_bc_mask=True)
    n = 6
    noise = jnp.zeros((n, 4))
    eps = jnp.ones((n, 4))
    scores = jnp.asarray([1.0, -1, 1, -1, 1, -1])
    valid = jnp.ones((n,))
    got = float(losses.diffusion_eps_mse(noise, eps, scores, valid, cfg))
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)   # only satisfying rows
    # unmasked variant
    cfg2 = cfg_(stl_bc_mask=False)
    got2 = float(losses.diffusion_eps_mse(noise, eps, scores, valid, cfg2))
    np.testing.assert_allclose(got2, 1.0, rtol=1e-5)


def test_dpp_diversity_prefers_diverse():
    """Diverse satisfying candidates => higher expected cardinality =>
    lower (more negative) loss than identical candidates."""
    cfg = cfg_(diverse_loss=True, diverse_detach=True)
    bs, M = 2, cfg.n_randoms
    n = bs * M * 3
    rng = np.random.RandomState(0)
    diverse = jnp.asarray(rng.randn(n, cfg.nt, 2).astype(np.float32))
    identical = jnp.broadcast_to(diverse[:1], diverse.shape)
    scores = jnp.ones((n,))
    l_div = float(losses.dpp_diversity(diverse, scores, cfg))
    l_same = float(losses.dpp_diversity(identical, scores, cfg))
    assert l_div < l_same


def test_dpp_quality_gates():
    """All-violating candidates contribute no cardinality -> loss ~ 0."""
    cfg = cfg_(diverse_loss=True, diverse_detach=True)
    bs, M = 1, cfg.n_randoms
    n = bs * M * 3
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, cfg.nt, 2).astype(np.float32))
    l = float(losses.dpp_diversity(x, -jnp.ones((n,)), cfg))
    np.testing.assert_allclose(l, 0.0, atol=1e-6)


def test_dpp_differentiable():
    cfg = cfg_(diverse_loss=True, diverse_detach=False)
    n = 1 * cfg.n_randoms * 3
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, cfg.nt, 2).astype(np.float32))

    def f(x):
        return losses.dpp_diversity(x, jnp.ones((n,)) * 0.5, cfg)

    g = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_vae_losses():
    cfg = cfg_(vae=True, stl_bc_mask=False, bc_weight=1.0)
    n = 12
    nn_c = jnp.zeros((n, cfg.nt, 2))
    dc = jnp.ones((n, cfg.nt, 2))
    mean = jnp.zeros((n, 4))
    logstd = jnp.zeros((n, 4))
    std = jnp.exp(logstd)
    recon, kl = losses.vae_losses(nn_c, dc, (mean, logstd, std),
                                  jnp.ones((n,)), jnp.ones((n,)), cfg)
    np.testing.assert_allclose(float(recon), 1.0, rtol=1e-5)
    # KL of standard normal vs itself = 0
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-6)


def test_collision_loss():
    cfg = cfg_(collision_loss=2.0)
    # overlapping (centroid dist < radius sum) -> positive loss
    d = jnp.ones((4, 2, 20)) * 0.5
    r = jnp.ones((4, 2, 20)) * 1.0
    loss = float(losses.collision(d, r, cfg))
    assert loss > 0
    # far apart -> 0
    d2 = jnp.ones((4, 2, 20)) * 100.0
    np.testing.assert_allclose(float(losses.collision(d2, r, cfg)), 0.0,
                               atol=1e-6)
