"""Rollout vs. explicit numpy Euler oracle + closed-form checks."""

import numpy as np
import jax
import jax.numpy as jnp

from pstl_tpu.ops import dynamics as dyn


def np_rollout(s0, us, dt):
    n = s0.shape[0]
    T = us.shape[1]
    traj = np.zeros((n, T + 1, 4))
    traj[:, 0] = s0
    for t in range(T):
        x, y, th, v = traj[:, t].T
        w, a = us[:, t].T
        traj[:, t + 1, 0] = x + v * np.cos(th) * dt
        traj[:, t + 1, 1] = y + v * np.sin(th) * dt
        traj[:, t + 1, 2] = th + w * dt
        traj[:, t + 1, 3] = v + a * dt
    return traj


def test_parallel_rollout_matches_scan():
    """The cumsum formulation must match the sequential scan exactly."""
    rng = np.random.RandomState(3)
    s0 = jnp.asarray(rng.randn(6, 4).astype(np.float32))
    us = jnp.asarray((rng.randn(6, 20, 2)
                      * np.array([0.4, 3.0])).astype(np.float32))
    a = dyn.rollout(s0, us, 0.5)
    b = dyn.rollout_scan(s0, us, 0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-4)


def test_rollout_matches_oracle():
    rng = np.random.RandomState(0)
    s0 = rng.randn(5, 4).astype(np.float32)
    us = (rng.randn(5, 20, 2) * np.array([0.3, 2.0])).astype(np.float32)
    got = dyn.rollout(jnp.asarray(s0), jnp.asarray(us), 0.5)
    np.testing.assert_allclose(got, np_rollout(s0, us, 0.5), rtol=1e-4,
                               atol=1e-4)


def test_rollout_straight_line_closed_form():
    """Zero controls: x advances v*dt per step, everything else constant."""
    s0 = jnp.asarray([[0.0, 0.0, 0.0, 2.0]])
    us = jnp.zeros((1, 10, 2))
    traj = dyn.rollout(s0, us, 0.5)
    np.testing.assert_allclose(traj[0, :, 0], np.arange(11) * 1.0, atol=1e-5)
    np.testing.assert_allclose(traj[0, :, 3], 2.0, atol=1e-6)


def test_rollout_batch_dims():
    s0 = jnp.zeros((2, 3, 4))
    us = jnp.zeros((2, 3, 20, 2))
    assert dyn.rollout(s0, us, 0.5).shape == (2, 3, 21, 4)


def test_rollout_differentiable():
    s0 = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    us = jnp.zeros((1, 20, 2))

    def final_x(us):
        return dyn.rollout(s0, us, 0.5)[0, -1, 0]

    g = jax.grad(final_x)(us)
    assert np.all(np.isfinite(np.asarray(g)))
    # accel at t=0 increases final x through 19 subsequent position updates
    assert float(g[0, 0, 1]) > 0


def test_neighbor_rollout():
    # one valid neighbor moving at v=2 along +x, one invalid slot
    nei = jnp.asarray([[[1.0, 0.0, 0.0, 0.0, 2.0, 4.0, 1.7],
                        [0.0, 0.0, 0.0, 0.0, 0.0, 4.0, 1.7]]])
    out = dyn.neighbor_rollout(nei, nt=5, dt=0.5, full=True)
    assert out.shape == (1, 2, 5, 7)
    np.testing.assert_allclose(out[0, 0, :, 0], 1.0)     # valid flag
    np.testing.assert_allclose(out[0, 0, :, 1], np.arange(5) * 1.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 0, :, 5], 4.0)     # L carried through
