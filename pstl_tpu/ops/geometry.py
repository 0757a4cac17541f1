"""Differentiable geometry kernels.

Parity targets:
- signed point-to-polyline distance & heading distance
  (``nusc_api.py:685-813``, efficient branch)
- anchor-disc car-car clearance (``utils.py:465-526``) and its batched
  masked wrapper (``nusc_train.py:142-148``)
- oriented bounding-box corners (``utils.py:443-462``)

All kernels are pure jnp, broadcast over arbitrary leading batch dims, and
are evaluated in float32 (they feed the stiff tau=100 STL robustness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# point-to-polyline signed distance
# ---------------------------------------------------------------------------

def point_to_polyline(points: Array, lanes: Array, clip: bool = False,
                      with_angle: bool = False, inline: bool = False):
    """Signed distance from trajectory points to a lane centerline.

    points: (n, T, 2) or (n, T, 3) with heading when with_angle.
    lanes:  (n, n_segs, 3) waypoints (x, y, heading).

    Selects the segment minimizing d(p, w_i) + d(p, w_{i+1}), then returns the
    signed triangle-area distance to that segment (left of travel positive).
    ``inline=True`` replaces the projection with the endpoint distance when
    the point lies beyond the first/last segment (nusc_api.py:716-724).
    Returns dist (n, T) [and angle_dist (n, T) = 1 - cos(dtheta)].
    """
    points = points.astype(jnp.float32)
    lanes = lanes.astype(jnp.float32)
    n_segs = lanes.shape[-2]

    # (n, T, n_segs) distances to each waypoint
    pd = jnp.linalg.norm(points[..., None, :2] - lanes[..., None, :, :2],
                         axis=-1)
    min_idx = jnp.argmin(pd[..., :-1] + pd[..., 1:], axis=-1)     # (n, T)
    # segment-endpoint selection as a one-hot matmul: generic gathers lower
    # to pathologically slow loops on TPU, while this is a tiny MXU contract
    sel = jax.nn.one_hot(min_idx, n_segs - 1, dtype=points.dtype)  # (n,T,S)
    p2 = jnp.einsum("...ts,...sd->...td", sel, lanes[..., :-1, :])
    p3 = jnp.einsum("...ts,...sd->...td", sel, lanes[..., 1:, :])

    x1, y1 = points[..., 0], points[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    x3, y3 = p3[..., 0], p3[..., 1]

    area = x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2)
    bottom_l = jnp.linalg.norm((p2 - p3)[..., :2], axis=-1)
    l2_dist = jnp.sqrt(jnp.clip((x1 - x2) ** 2 + (y1 - y2) ** 2, 1e-3))
    normal_case = (bottom_l != 0).astype(jnp.float32)
    dist_to_lane = (normal_case * area / jnp.clip(bottom_l, 1e-7)
                    + (1 - normal_case) * l2_dist)

    if inline:
        l2_dist1 = jnp.sqrt(jnp.clip((x1 - x3) ** 2 + (y1 - y3) ** 2, 1e-3))
        behind = ((x1 - x2) * (x3 - x2) + (y1 - y2) * (y3 - y2)) <= 0
        ahead = ((x1 - x3) * (x2 - x3) + (y1 - y3) * (y2 - y3)) <= 0
        behind_all = (min_idx == 0) & behind
        ahead_all = (min_idx == n_segs - 2) & ahead
        normal = ~(behind_all | ahead_all)
        sign = jnp.sign(dist_to_lane)
        dist = (normal * dist_to_lane + behind_all * l2_dist * sign
                + ahead_all * l2_dist1 * sign)
    else:
        dist = dist_to_lane

    if clip:
        dist = jnp.clip(dist, -5.0, 5.0)

    if with_angle:
        angle_dist = 1.0 - jnp.cos(p2[..., 2] - points[..., 2])
        return dist, angle_dist
    return dist


# ---------------------------------------------------------------------------
# anchor-disc car clearance
# ---------------------------------------------------------------------------

def anchor_points(x: Array, y: Array, th: Array, L: Array, W: Array,
                  num_L: int, num_W: int):
    """Cover an oriented box with num_L x num_W discs (utils.py:465-497).

    x, y, th, L, W broadcast together to shape (...,).
    Returns centers (..., num_L*num_W, 2) and radius r (...,).
    """
    r = jnp.minimum(jnp.maximum(L / num_L / 2.0, W / num_W / 2.0), W / 2.0)
    alpha = jnp.linspace(0.0, 1.0, num_L)
    beta = jnp.linspace(0.0, 1.0, num_W)
    # local-frame centers spanning the box interior minus the radius
    xs = ((-L / 2 + r)[..., None] * (1 - alpha) + (L / 2 - r)[..., None] * alpha)
    ys = ((-W / 2 + r)[..., None] * (1 - beta) + (W / 2 - r)[..., None] * beta)
    xs = jnp.broadcast_to(xs[..., :, None], xs.shape + (num_W,))
    ys = jnp.broadcast_to(ys[..., None, :], ys.shape[:-1] + (num_L, num_W))
    xs = xs.reshape(xs.shape[:-2] + (num_L * num_W,))
    ys = ys.reshape(ys.shape[:-2] + (num_L * num_W,))
    c, s = jnp.cos(th)[..., None], jnp.sin(th)[..., None]
    gx = xs * c - ys * s + x[..., None]
    gy = xs * s + ys * c + y[..., None]
    return jnp.stack([gx, gy], axis=-1), r


def car_clearance(xyth_a: Array, L_a, W_a, xyth_b: Array, L_b, W_b,
                  num_L: int = 4, num_W: int = 1, full: bool = False):
    """Min disc-to-disc clearance between two oriented boxes.

    xyth_*: (..., 3); L/W broadcastable to (...,). Leading dims of a and b
    must broadcast (the caller places ego at (..., 1, T) vs (..., K, T)).
    Returns clearance (...,); with full=True also the raw min center distance
    and the radius sum (utils.py:499-510).
    """
    ones = jnp.ones_like(xyth_a[..., 0])
    xys1, r1 = anchor_points(xyth_a[..., 0], xyth_a[..., 1], xyth_a[..., 2],
                             L_a * ones, W_a * ones, num_L, num_W)
    onesb = jnp.ones_like(xyth_b[..., 0])
    xys2, r2 = anchor_points(xyth_b[..., 0], xyth_b[..., 1], xyth_b[..., 2],
                             L_b * onesb, W_b * onesb, num_L, num_W)
    diff = xys1[..., :, None, :] - xys2[..., None, :, :]    # (..., k, k, 2)
    d = jnp.linalg.norm(diff, axis=-1)
    min_dist = jnp.min(d, axis=(-2, -1))
    clearance = min_dist - r1 - r2
    if full:
        return clearance, min_dist, r1 + r2
    return clearance


def min_neighbor_distance(ego_traj: Array, nei_traj: Array, nei_valid: Array,
                          ego_L: float, ego_W: float, num_L: int = 4,
                          num_W: int = 1, full: bool = False):
    """Masked min clearance to any neighbor per timestep.

    Parity: ``compute_shortest_dist_refined`` (nusc_train.py:142-148) —
    clearance clipped to [-5, 20], invalid neighbors replaced by 100, min
    over the K axis.

    ego_traj: (n, T, >=3); nei_traj: (n, K, T, >=6) with (x,y,th,...,L,W);
    nei_valid: (n, K, T).
    Returns min_d (n, T); with full=True also masked min-center-dist (n,K,T)
    and radius sums (n,K,T) for the TrafficSim collision loss
    (nusc_train.py:416-421).
    """
    res = car_clearance(ego_traj[..., None, :, :3], ego_L, ego_W,
                        nei_traj[..., :3], nei_traj[..., -2], nei_traj[..., -1],
                        num_L, num_W, full=full)
    if full:
        car_dist, min_dist, r_sum = res
    else:
        car_dist = res
    masked = (jnp.clip(car_dist, -5.0, 20.0) * nei_valid
              + (1 - nei_valid) * 100.0)
    min_d = jnp.min(masked, axis=-2)
    if full:
        masked_center = min_dist * nei_valid + (1 - nei_valid) * 100.0
        return min_d, masked_center, r_sum
    return min_d


def bbox_corners(x, y, theta, L, W) -> Array:
    """Oriented box corners (4, 2) per element (utils.py:443-462)."""
    lx = jnp.stack([L / 2, L / 2, -L / 2, -L / 2], axis=-1)
    ly = jnp.stack([W / 2, -W / 2, -W / 2, W / 2], axis=-1)
    c, s = jnp.cos(theta)[..., None], jnp.sin(theta)[..., None]
    gx = lx * c - ly * s + x[..., None]
    gy = lx * s + ly * c + y[..., None]
    return jnp.stack([gx, gy], axis=-1)
