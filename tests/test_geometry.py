"""Geometry kernels vs. numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from pstl_tpu.ops import geometry as geom


def np_point_to_polyline(points, lanes):
    """Oracle signed distance (triangle-area formula, nearest segment)."""
    n, T, _ = points.shape
    n_segs = lanes.shape[1]
    dist = np.zeros((n, T))
    ang = np.zeros((n, T))
    for i in range(n):
        for t in range(T):
            p = points[i, t]
            pd = np.linalg.norm(p[:2] - lanes[i, :, :2], axis=-1)
            k = np.argmin(pd[:-1] + pd[1:])
            p2, p3 = lanes[i, k], lanes[i, k + 1]
            area = (p[0] * (p2[1] - p3[1]) + p2[0] * (p3[1] - p[1])
                    + p3[0] * (p[1] - p2[1]))
            bl = np.linalg.norm(p2[:2] - p3[:2])
            if bl != 0:
                dist[i, t] = area / max(bl, 1e-7)
            else:
                dist[i, t] = np.sqrt(max((p[0] - p2[0]) ** 2
                                         + (p[1] - p2[1]) ** 2, 1e-3))
            ang[i, t] = 1 - np.cos(p2[2] - p[2])
    return dist, ang


def make_scene(seed=0, n=4, T=10, n_segs=15):
    rng = np.random.RandomState(seed)
    # lanes: roughly straight polylines with noise
    xs = np.linspace(0, 30, n_segs)
    lanes = np.stack([
        np.tile(xs, (n, 1)),
        rng.randn(n, 1) * 2 + np.cumsum(rng.randn(n, n_segs) * 0.1, -1),
        rng.randn(n, n_segs) * 0.05,
    ], axis=-1).astype(np.float32)
    points = np.stack([
        rng.uniform(2, 28, (n, T)),
        rng.randn(n, T) * 3,
        rng.randn(n, T) * 0.3,
    ], axis=-1).astype(np.float32)
    return points, lanes


def test_point_to_polyline_matches_oracle():
    points, lanes = make_scene()
    want_d, want_a = np_point_to_polyline(points, lanes)
    got_d, got_a = geom.point_to_polyline(jnp.asarray(points),
                                          jnp.asarray(lanes), with_angle=True)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_a, want_a, rtol=1e-4, atol=1e-4)


def test_point_to_polyline_sign():
    """Point left of an eastbound lane has positive signed distance."""
    lanes = np.stack([np.linspace(0, 10, 15), np.zeros(15), np.zeros(15)],
                     -1)[None].astype(np.float32)
    left = np.array([[[5.0, 2.0, 0.0]]], np.float32)
    right = np.array([[[5.0, -2.0, 0.0]]], np.float32)
    d_left = geom.point_to_polyline(jnp.asarray(left), jnp.asarray(lanes))
    d_right = geom.point_to_polyline(jnp.asarray(right), jnp.asarray(lanes))
    assert float(d_left[0, 0]) > 1.9
    assert float(d_right[0, 0]) < -1.9


def test_clip_flag():
    lanes = np.stack([np.linspace(0, 10, 15), np.zeros(15), np.zeros(15)],
                     -1)[None].astype(np.float32)
    far = np.array([[[5.0, 50.0, 0.0]]], np.float32)
    d = geom.point_to_polyline(jnp.asarray(far), jnp.asarray(lanes), clip=True)
    assert float(d[0, 0]) == 5.0


def test_anchor_points_count_and_radius():
    x = jnp.asarray([0.0])
    th = jnp.asarray([0.0])
    centers, r = geom.anchor_points(x, x, th, jnp.asarray([4.0]),
                                    jnp.asarray([2.0]), 4, 1)
    assert centers.shape == (1, 4, 2)
    # r = min(max(L/nL/2, W/nW/2), W/2) = min(max(0.5, 1.0), 1.0) = 1.0
    np.testing.assert_allclose(r, 1.0)
    # centers along x-axis, y=0
    np.testing.assert_allclose(centers[0, :, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(centers[0, 0, 0], -1.0, atol=1e-6)
    np.testing.assert_allclose(centers[0, -1, 0], 1.0, atol=1e-6)


def test_car_clearance_head_on():
    """Two identical cars 10 m apart facing each other along x."""
    a = jnp.asarray([[0.0, 0.0, 0.0]])
    b = jnp.asarray([[10.0, 0.0, np.pi]])
    d = geom.car_clearance(a, 4.0, 2.0, b, 4.0, 2.0, 4, 1)
    # nearest discs: (1,0) r=1 and (9,0) r=1 -> clearance = 8 - 2 = 6
    np.testing.assert_allclose(d, 6.0, atol=1e-5)


def test_car_clearance_overlap_negative():
    a = jnp.asarray([[0.0, 0.0, 0.0]])
    b = jnp.asarray([[1.0, 0.0, 0.0]])
    d = geom.car_clearance(a, 4.0, 2.0, b, 4.0, 2.0, 4, 1)
    assert float(d[0]) < 0


def test_min_neighbor_distance_masking():
    ego = jnp.zeros((1, 3, 4))                           # (n, T, 4)
    nei = jnp.tile(jnp.asarray([100.0, 100.0, 0.0, 0.0, 4.0, 2.0]),
                   (1, 2, 3, 1))                         # far away
    valid = jnp.asarray(np.zeros((1, 2, 3), np.float32))
    d = geom.min_neighbor_distance(ego, nei, valid, 4.0, 2.0)
    np.testing.assert_allclose(d, 100.0)                 # all invalid -> 100
    valid = valid.at[0, 0].set(1.0)
    d = geom.min_neighbor_distance(ego, nei, valid, 4.0, 2.0)
    np.testing.assert_allclose(d, 20.0)                  # clipped to 20


def test_bbox_corners():
    corners = geom.bbox_corners(jnp.asarray(1.0), jnp.asarray(2.0),
                                jnp.asarray(0.0), jnp.asarray(4.0),
                                jnp.asarray(2.0))
    assert corners.shape == (4, 2)
    np.testing.assert_allclose(np.sort(np.asarray(corners[:, 0])),
                               [-1.0, -1.0, 3.0, 3.0], atol=1e-6)


class TestFusedClearance:
    """min_clearance_pre (hoisted discs + d2-min + recompute VJP) must match
    min_neighbor_distance in value and ego-gradient."""

    def _data(self, n=6, K=5, T=7, seed=0):
        rng = np.random.RandomState(seed)
        ego = rng.randn(n, T, 3).astype(np.float32) * 5
        nei = rng.randn(n, K, T, 6).astype(np.float32) * 5
        nei[..., -2] = rng.uniform(3.5, 5.2, (n, K, T))
        nei[..., -1] = rng.uniform(1.5, 2.1, (n, K, T))
        valid = (rng.rand(n, K, T) > 0.3).astype(np.float32)
        return jnp.asarray(ego), jnp.asarray(nei), jnp.asarray(valid)

    def test_forward_matches(self):
        ego, nei, valid = self._data()
        ref = geom.min_neighbor_distance(ego, nei, valid, 4.084, 1.73,
                                             num_L=4, num_W=1)
        discs = geom.precompute_neighbor_discs(nei, valid, 4)
        out = geom.min_clearance_pre(ego, discs, 4.084, 1.73, 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradient_matches(self):
        ego, nei, valid = self._data(seed=3)
        discs = geom.precompute_neighbor_discs(nei, valid, 4)

        def loss_ref(e):
            return jnp.sum(jnp.sin(geom.min_neighbor_distance(
                e, nei, valid, 4.084, 1.73, num_L=4, num_W=1)))

        def loss_new(e):
            return jnp.sum(jnp.sin(geom.min_clearance_pre(
                e, discs, 4.084, 1.73, 4)))

        g_ref = jax.grad(loss_ref)(ego)
        g_new = jax.grad(loss_new)(ego)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_gradient_matches_4col_ego(self):
        # ego rows often carry (x, y, th, v); v must get zero grad
        ego, nei, valid = self._data(seed=5)
        ego4 = jnp.concatenate([ego, jnp.ones(ego.shape[:-1] + (1,))], -1)
        discs = geom.precompute_neighbor_discs(nei, valid, 4)
        g = jax.grad(lambda e: jnp.sum(geom.min_clearance_pre(
            e[..., :3], discs, 4.084, 1.73, 4)))(ego4)
        assert np.all(np.asarray(g[..., 3]) == 0)
