"""Fused min-clearance kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu.ops import geometry as geom
from pstl_tpu.ops import pallas_kernels as pk

pytestmark = pytest.mark.skipif(not pk.HAVE_PALLAS,
                                reason="pallas unavailable")


def make_inputs(seed=0, n=37, K=8, T=20):
    rng = np.random.RandomState(seed)
    ego = np.stack([rng.uniform(-20, 20, (n, T)),
                    rng.uniform(-20, 20, (n, T)),
                    rng.uniform(-np.pi, np.pi, (n, T))], -1).astype(np.float32)
    nei = np.zeros((n, K, T, 7), np.float32)
    nei[..., 0] = (rng.rand(n, K, 1) > 0.3).astype(np.float32)
    nei[..., 1] = rng.uniform(-25, 25, (n, K, T))
    nei[..., 2] = rng.uniform(-25, 25, (n, K, T))
    nei[..., 3] = rng.uniform(-np.pi, np.pi, (n, K, T))
    nei[..., 5] = rng.uniform(3.5, 5.5, (n, K, T))
    nei[..., 6] = rng.uniform(1.5, 2.2, (n, K, T))
    return jnp.asarray(ego), jnp.asarray(nei)


def jnp_reference(ego, nei, L=4.084, W=1.73):
    ego4 = jnp.concatenate([ego, jnp.zeros_like(ego[..., :1])], -1)
    return geom.min_neighbor_distance(ego4, nei[..., 1:7], nei[..., 0],
                                      ego_L=L, ego_W=W, num_L=4, num_W=1)


def test_forward_matches_reference():
    ego, nei = make_inputs()
    want = jnp_reference(ego, nei)
    got = pk.min_clearance(ego, nei, 4.084, 1.73, 4, block_n=16,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_gradient_matches_reference():
    ego, nei = make_inputs(seed=1, n=13)

    def loss_ref(e):
        return jnp.sum(jnp.tanh(jnp_reference(e, nei)))

    def loss_pk(e):
        return jnp.sum(jnp.tanh(pk.min_clearance(e, nei, 4.084, 1.73, 4,
                                                 block_n=16,
                                                 interpret=True)))

    g_ref = jax.grad(loss_ref)(ego)
    g_pk = jax.grad(loss_pk)(ego)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_all_invalid_neighbors():
    ego, nei = make_inputs(seed=2, n=5)
    nei = nei.at[..., 0].set(0.0)
    got = pk.min_clearance(ego, nei, 4.084, 1.73, 4, block_n=8,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), 100.0)
    g = jax.grad(lambda e: jnp.sum(pk.min_clearance(
        e, nei, 4.084, 1.73, 4, block_n=8, interpret=True)))(ego)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_padding_path():
    # n not divisible by block_n exercises the pad/slice path
    ego, nei = make_inputs(seed=3, n=9)
    want = jnp_reference(ego, nei)
    got = pk.min_clearance(ego, nei, 4.084, 1.73, 4, block_n=8,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_dropin_wrapper():
    ego, nei = make_inputs(seed=4, n=8)
    ego4 = jnp.concatenate([ego, jnp.zeros_like(ego[..., :1])], -1)
    want = geom.min_neighbor_distance(ego4, nei[..., 1:7], nei[..., 0],
                                      4.084, 1.73, 4, 1)
    got = pk.min_neighbor_distance_fused(ego4, nei[..., 1:7], nei[..., 0],
                                         4.084, 1.73, 4, 1, block_n=8,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)
