"""Metrics vs. numpy/scipy oracles (incl. Qhull for hull areas)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu import metrics


def test_masked_std_matches_numpy_ma():
    rng = np.random.RandomState(0)
    x = rng.randn(5, 8, 3).astype(np.float32)
    mask = (rng.rand(5, 8, 3) > 0.4).astype(np.float32)
    got = np.asarray(metrics.masked_std(jnp.asarray(x), jnp.asarray(mask),
                                        axis=1))
    ma = np.ma.masked_array(x, mask=1 - mask)
    want = np.ma.std(ma, axis=1).filled(0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hull_area_square():
    pts = jnp.asarray([[[0.0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]]])
    mask = jnp.ones((1, 5))
    np.testing.assert_allclose(float(metrics.hull_area(pts, mask)[0]), 1.0,
                               atol=1e-5)


def test_hull_area_masked_point_excluded():
    # far-away point masked out -> area stays the unit square
    pts = jnp.asarray([[[0.0, 0], [1, 0], [1, 1], [0, 1], [100.0, 100.0]]])
    mask = jnp.asarray([[1.0, 1, 1, 1, 0]])
    np.testing.assert_allclose(float(metrics.hull_area(pts, mask)[0]), 1.0,
                               atol=1e-5)


def test_hull_area_degenerate():
    # <3 points or collinear -> 0
    pts = jnp.asarray([[[0.0, 0], [1, 1], [2, 2], [3, 3], [0, 0]]])
    mask = jnp.asarray([[1.0, 1, 1, 1, 0]])
    assert float(metrics.hull_area(pts, mask)[0]) <= 1e-5
    mask2 = jnp.asarray([[1.0, 1, 0, 0, 0]])
    assert float(metrics.hull_area(pts, mask2)[0]) <= 1e-5


@pytest.mark.slow
def test_hull_area_matches_qhull_random():
    from scipy.spatial import ConvexHull
    rng = np.random.RandomState(3)
    for trial in range(10):
        m = rng.randint(4, 30)
        pts = rng.randn(m, 2) * rng.uniform(0.5, 5)
        want = ConvexHull(pts).volume     # 2-D "volume" = area
        got = float(metrics.hull_area(jnp.asarray(pts[None]),
                                      jnp.ones((1, m)))[0])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hull_area_large_m_host_fallback():
    """m > HULL_EXACT_MAX_M routes through the monotone-chain host callback
    (the O(m^3) all-pairs path would allocate (m, m, m)); matches Qhull and
    respects the mask."""
    from scipy.spatial import ConvexHull
    rng = np.random.RandomState(7)
    m = 256
    assert m > metrics.HULL_EXACT_MAX_M
    pts = rng.randn(2, m, 2) * 3.0
    mask = np.ones((2, m))
    mask[1, m // 2:] = 0.0            # half the points masked out
    got = np.asarray(metrics.hull_area(jnp.asarray(pts), jnp.asarray(mask)))
    want0 = ConvexHull(pts[0]).volume
    want1 = ConvexHull(pts[1, :m // 2]).volume
    np.testing.assert_allclose(got, [want0, want1], rtol=1e-4)
    # jit + measure_diversity at sampling_size=256 shapes (the eval path)
    trajs = jnp.asarray(rng.randn(2, m, 3, 10 * 2).astype(np.float32))
    scores = jnp.ones((2, m, 3))
    valids = jnp.ones((2, m, 3))
    out = jax.jit(lambda t, s, v: metrics.measure_diversity(t, s, v, 10))(
        trajs, scores, valids)
    assert np.isfinite(float(out["ma_vol"]))


def test_entropy_uniform_vs_concentrated():
    # all mass in one bin -> 0 bits; spread across bins -> higher
    x_conc = jnp.ones((1, 16)) * 0.5
    x_unif = jnp.asarray(np.linspace(0, 1, 16)[None])
    mask = jnp.ones((1, 16))
    e_conc = float(metrics.entropy(x_conc, mask, x_min=0.0, x_max=1.0)[0])
    e_unif = float(metrics.entropy(x_unif, mask, x_min=0.0, x_max=1.0)[0])
    assert e_conc < 0.1
    assert e_unif > 2.5


def test_entropy_mask_excludes():
    x = jnp.asarray([[0.05, 0.95, 0.5, 0.5]])
    m_all = jnp.ones((1, 4))
    m_half = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    e_all = float(metrics.entropy(x, m_all, x_min=0.0, x_max=1.0)[0])
    e_half = float(metrics.entropy(x, m_half, x_min=0.0, x_max=1.0)[0])
    assert e_half < e_all


def test_occupancy_area_scales_with_spread():
    rng = np.random.RandomState(0)
    R, m, nt = 3, 8, 20
    x_small = rng.randn(R, m, nt) * 0.1
    y_small = rng.randn(R, m, nt) * 0.1
    th = np.zeros((R, m, nt))
    val = np.ones((R, m, nt))
    a_small = float(metrics.occupancy_area(jnp.asarray(x_small),
                                           jnp.asarray(y_small),
                                           jnp.asarray(th),
                                           jnp.asarray(val)))
    a_big = float(metrics.occupancy_area(jnp.asarray(x_small * 10),
                                         jnp.asarray(y_small * 10),
                                         jnp.asarray(th), jnp.asarray(val)))
    assert a_big > a_small * 10


def test_ade_fde():
    bs, nt, k = 2, 20, 4
    gt = jnp.zeros((bs, nt, k))
    est = jnp.zeros((bs, 3, 3, nt, k))
    # candidate 0 offset by 1 everywhere, candidate 1 exact, rest offset 2
    est = est.at[:, :, :, :, 0].set(2.0)
    est = est.at[:, 1, 1].set(0.0)
    mask = jnp.ones((bs, 9))
    ade, fde = metrics.ade_fde(gt, est, mask)
    np.testing.assert_allclose(float(ade), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(fde), 0.0, atol=1e-6)


def test_measure_diversity_shapes():
    rng = np.random.RandomState(1)
    bs, m, nt = 2, 6, 20
    trajs = jnp.asarray(rng.randn(bs, m, 3, nt * 2).astype(np.float32))
    scores = jnp.asarray(rng.randn(bs, m, 3).astype(np.float32))
    valids = jnp.ones((bs, m, 3))
    out = metrics.measure_diversity(trajs, scores, valids, nt)
    assert np.isfinite(float(out["ma_std"]))
    assert float(out["ma_vol"]) >= 0
    assert out["std_per_mode"].shape == (bs, 3)


def test_measure_extra_diversity_bundle():
    rng = np.random.RandomState(2)
    bs, m, nt = 2, 6, 20
    trajs = jnp.asarray(rng.randn(bs, m, 3, nt * 4).astype(np.float32))
    scores = jnp.asarray(rng.randn(bs, m, 3).astype(np.float32))
    valids = jnp.ones((bs, m, 3))
    controls = jnp.asarray(rng.randn(bs, m, 3, nt * 2).astype(np.float32))
    out = metrics.measure_extra_diversity(trajs, scores, valids, nt,
                                          controls, -0.5, 0.5, -5, 5)
    for k in ("ent_s", "ent_w", "ent_a", "ent_wa", "area"):
        assert np.isfinite(float(out[k])), k


def test_label_score_breakdown():
    # bs=2, M=2: scene0 label=0, scene1 label=3 (excluded)
    scores = jnp.asarray(np.array([
        [[1.0, -1.0, 1.0], [1.0, -1.0, -1.0]],   # scene 0
        [[1.0, 1.0, 1.0], [1.0, 1.0, 1.0]],      # scene 1 (outlier)
    ], np.float32))
    valids = jnp.ones((2, 2, 3))
    labels = jnp.asarray([0.0, 3.0])
    out = metrics.label_score_breakdown(scores, labels, valids)
    # in-label: scene0 mode0 -> both satisfy -> 1.0
    np.testing.assert_allclose(float(out["in_label_acc"]), 1.0)
    # out-label: scene0 modes 1,2 -> sat [F, T], [F, F] -> 1/4
    np.testing.assert_allclose(float(out["out_label_acc"]), 0.25)
    np.testing.assert_allclose(float(out["in_label_curr_acc"]), 1.0)
    np.testing.assert_allclose(float(out["out_label_left_acc"]), 0.0)
    np.testing.assert_allclose(float(out["out_label_right_acc"]), 0.5)
