"""STL robustness semantics vs. independent numpy brute-force oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu.ops import stl


def np_softmax(x, tau, axis=-1):
    """Oracle soft max: logsumexp(x*tau)/tau with max-subtraction."""
    x = np.asarray(x, np.float64)
    m = np.max(x, axis=axis, keepdims=True)
    return (np.log(np.sum(np.exp((x - m) * tau), axis=axis)) / tau
            + np.squeeze(m, axis=axis))


def np_softmin(x, tau, axis=-1):
    return -np_softmax(-np.asarray(x), tau, axis=axis)


def np_window_reduce(s, ts, te, tau, kind):
    """Oracle: per-t reduce over clipped window [t+ts, t+te)."""
    n, T = s.shape
    out = np.zeros_like(s, dtype=np.float64)
    for t in range(T):
        lo, hi = np.clip(t + ts, 0, T), np.clip(t + te, 0, T)
        win = s[:, lo:hi]
        if win.shape[1] == 0:
            # reference: softmax(empty) = -inf, softmin(empty) = -softmax(empty)
            # = +inf (vacuous Always is true) — stl_d_lib.py:7-8,15-19
            out[:, t] = -np.inf if kind == "max" else np.inf
        elif kind == "max":
            out[:, t] = np_softmax(win, tau)
        else:
            out[:, t] = np_softmin(win, tau)
    return out


@pytest.fixture
def sig():
    rng = np.random.RandomState(0)
    return rng.randn(7, 20).astype(np.float32) * 2.0


def test_soft_max_matches_oracle(sig):
    for tau in [1.0, 10.0, 100.0]:
        got = stl.soft_max(jnp.asarray(sig), tau, axis=-1)
        want = np_softmax(sig, tau)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_hard_mode_is_exact_max(sig):
    got = stl.soft_max(jnp.asarray(sig), 100.0, axis=-1, hard=True)
    np.testing.assert_allclose(got, sig.max(-1), rtol=1e-6)


def test_soft_converges_to_hard(sig):
    got = stl.soft_max(jnp.asarray(sig), 1e4, axis=-1)
    np.testing.assert_allclose(got, sig.max(-1), atol=1e-2)


@pytest.mark.parametrize("ts,te", [(0, 20), (0, 10), (3, 8), (-5, 0), (15, 40)])
def test_window_ops_match_oracle(sig, ts, te):
    for tau in [10.0, 100.0]:
        got = stl.window_soft_max(jnp.asarray(sig), ts, te, tau)
        want = np_window_reduce(sig, ts, te, tau, "max")
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        got = stl.window_soft_min(jnp.asarray(sig), ts, te, tau)
        want = np_window_reduce(sig, ts, te, tau, "min")
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_always_eventually_formulas(sig):
    f_alw = stl.Always(0, 20, stl.AP(lambda s: s["x"]))
    f_evt = stl.Eventually(0, 10, stl.AP(lambda s: s["x"]))
    signals = {"x": jnp.asarray(sig)}
    np.testing.assert_allclose(f_alw(signals, 100.0),
                               np_window_reduce(sig, 0, 20, 100.0, "min"),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(f_evt(signals, 100.0),
                               np_window_reduce(sig, 0, 10, 100.0, "max"),
                               rtol=2e-4, atol=2e-4)


def test_nested_eventually_always(sig):
    """♢[0:10] ◻[0:20] x — the structure of the lane-change clauses."""
    f = stl.Eventually(0, 10, stl.Always(0, 20, stl.AP(lambda s: s["x"])))
    inner = np_window_reduce(sig, 0, 20, 100.0, "min")
    want = np_window_reduce(inner, 0, 10, 100.0, "max")
    got = f({"x": jnp.asarray(sig)}, 100.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_and_or_not_imply(sig):
    a = stl.AP(lambda s: s["a"])
    b = stl.AP(lambda s: s["b"])
    rng = np.random.RandomState(1)
    sb = rng.randn(7, 20).astype(np.float32)
    signals = {"a": jnp.asarray(sig), "b": jnp.asarray(sb)}
    tau = 100.0
    np.testing.assert_allclose(
        stl.And(a, b)(signals, tau),
        np_softmin(np.stack([sig, sb], -1), tau), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        stl.Or(a, b)(signals, tau),
        np_softmax(np.stack([sig, sb], -1), tau), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(stl.Not(a)(signals, tau), -sig, rtol=1e-6)
    np.testing.assert_allclose(
        stl.Imply(a, b)(signals, tau),
        np_softmax(np.stack([-sig, sb], -1), tau), rtol=2e-4, atol=2e-4)


def test_listand_full(sig):
    rng = np.random.RandomState(2)
    sb = rng.randn(7, 20).astype(np.float32)
    f = stl.ListAnd([stl.AP(lambda s: s["a"]), stl.AP(lambda s: s["b"])])
    signals = {"a": jnp.asarray(sig), "b": jnp.asarray(sb)}
    s, v = f(signals, 100.0, full=True)
    assert v.shape == (7, 2, 20)
    np.testing.assert_allclose(
        s, np_softmin(np.stack([sig, sb], 1), 100.0, axis=1),
        rtol=2e-4, atol=2e-4)


def test_untimed_until_oracle(sig):
    """Soft until vs direct nested-loop oracle."""
    rng = np.random.RandomState(3)
    rs = rng.randn(7, 20).astype(np.float32)
    ls = sig
    tau = 10.0

    # oracle: scores[t] = softmax_{t'>=t} softmin(rs[t'], softmin_{s in [0, t']} ls[s])
    # (reference uses full-prefix cumulative min, stl_d_lib.py:189)
    n, T = ls.shape
    want = np.zeros((n, T))
    for t in range(T):
        vals = []
        for t2 in range(t, T):
            prefix_min = np_softmin(ls[:, : t2 + 1], tau)
            vals.append(np_softmin(np.stack([rs[:, t2], prefix_min], -1), tau))
        want[:, t] = np_softmax(np.stack(vals, -1), tau)

    # the associative-scan implementation computes suffix-from-t of the
    # *global* prefix mins — identical to the torch logcumsumexp formulation
    f = stl.UntimedUntil(stl.AP(lambda s: s["l"]), stl.AP(lambda s: s["r"]))
    got = f({"l": jnp.asarray(ls), "r": jnp.asarray(rs)}, tau)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_untimed_until_hard(sig):
    rng = np.random.RandomState(4)
    rs = rng.randn(7, 20).astype(np.float32)
    ls = sig
    n, T = ls.shape
    want = np.zeros((n, T))
    for t in range(T):
        vals = [np.minimum(rs[:, t2], ls[:, : t2 + 1].min(-1))
                for t2 in range(t, T)]
        want[:, t] = np.stack(vals, -1).max(-1)
    f = stl.UntimedUntil(stl.AP(lambda s: s["l"]), stl.AP(lambda s: s["r"]))
    got = f({"l": jnp.asarray(ls), "r": jnp.asarray(rs)}, 10.0, hard=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gradients_flow(sig):
    f = stl.Eventually(0, 10, stl.Always(0, 20, stl.AP(lambda s: s["x"])))

    def loss(x):
        return jnp.sum(f({"x": x}, 100.0)[:, 0])

    g = jax.grad(loss)(jnp.asarray(sig))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0


def test_formula_is_jittable(sig):
    f = stl.Always(0, 20, stl.AP(lambda s: s["x"]))
    jf = jax.jit(lambda x: f({"x": x}, 100.0))
    np.testing.assert_allclose(jf(jnp.asarray(sig)), f({"x": jnp.asarray(sig)}, 100.0),
                               rtol=1e-6)


def test_large_tau_stability():
    """tau=100 with O(100) magnitudes must not overflow in fp32."""
    x = jnp.asarray(np.array([[50.0, -80.0, 99.0]], np.float32))
    got = stl.soft_max(x, 100.0, axis=-1)
    assert np.isfinite(float(got[0]))
    np.testing.assert_allclose(got, 99.0, atol=1e-3)
