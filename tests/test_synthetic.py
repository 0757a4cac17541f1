"""Synthetic scene generator: schema, feasibility, calibration compliance."""

import numpy as np
import jax.numpy as jnp
import pytest

from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu import specs


@pytest.fixture(scope="module")
def cfg():
    return Config(diffusion=True, n_randoms=4, n_neighbors=4)


@pytest.fixture(scope="module")
def data(cfg):
    return synthetic.generate_dataset(0, 24, cfg)


def test_schema(cfg, data):
    n = 24
    assert data["ego_traj"].shape == (n, cfg.nt, 6)
    assert data["neighbors"].shape == (n, cfg.n_neighbors, 7)
    assert data["neighbors_traj"].shape == (n, cfg.n_neighbors, cfg.nt, 7)
    for k in ("curr", "left", "right"):
        assert data[f"{k}lane_wpts"].shape == (n, cfg.n_segs, 3)
        assert data[f"{k}_id" if k != "curr" else "curr_id"].shape == (n, 1)
    assert set(np.unique(data["gt_high_level"])) <= {0.0, 1.0, 2.0, 3.0}
    assert np.all(np.isfinite(data["ego_traj"]))


def test_ego_traj_is_dynamically_feasible(cfg, data):
    """Finite-difference controls recovered from GT must respect bounds
    (the GT comes from the same unicycle integrator)."""
    traj = data["ego_traj"]
    dth = (traj[:, 1:, 2] - traj[:, :-1, 2]) / cfg.dt
    dv = (traj[:, 1:, 3] - traj[:, :-1, 3]) / cfg.dt
    assert np.abs(dth).max() <= cfg.mul_w_max + 1e-4
    assert np.abs(dv).max() <= cfg.mul_a_max + 1e-4


def test_gt_mostly_satisfies_calibrated_spec(cfg, data):
    """The --check_stl_params golden property on synthetic data: GT scores
    >= 0 under its own calibrated spec for nearly all scenes."""
    batch = {k: jnp.asarray(v) for k, v in data.items()
             if isinstance(v, np.ndarray)}
    batch["neighbor_trajs_aug"] = batch["neighbors_traj"]
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    formulas = specs.build_formulas(cfg)
    signals = {
        "ego_traj": gt,
        "neighbors": batch["neighbor_trajs_aug"],
        "currlane_wpts": batch["currlane_wpts"],
        "leftlane_wpts": batch["leftlane_wpts"],
        "rightlane_wpts": batch["rightlane_wpts"],
        "stlp": stlp[:, None, :],
    }
    hl = batch["gt_high_level"][:, 0]
    mask = (hl != 3).astype(jnp.float32)
    _, scores, acc = specs.compute_scores(signals, formulas, hl, mask, cfg)
    assert float(acc) >= 0.9, (np.asarray(scores), np.asarray(hl))


def test_lane_change_labels_consistent(cfg):
    """Scenes labeled 'left change' end up near the left lane."""
    rng = np.random.RandomState(7)
    found = 0
    for _ in range(200):
        s = synthetic.generate_scene(rng, cfg)
        if s["gt_high_level"][0] == 1.0 and s["left_id"][0] == 1.0:
            found += 1
            end = s["ego_traj"][-1, :2]
            d_left = np.min(np.linalg.norm(
                s["leftlane_wpts"][:, :2] - end, axis=-1))
            d_curr = np.min(np.linalg.norm(
                s["currlane_wpts"][:, :2] - end, axis=-1))
            assert d_left < d_curr, (d_left, d_curr)
        if found >= 3:
            break
    assert found >= 1, "no left-change scenes generated in 200 draws"


def test_scene_level_tensors(cfg):
    data = synthetic.generate_dataset(1, 2, cfg, scene_len=30)
    assert data["scene_ego_full"].shape == (2, 30 + cfg.nt + 2, 4)
    assert data["scene_nei_full"].shape == (2, cfg.n_neighbors,
                                            30 + cfg.nt + 2, 7)
    assert data["scene_lanes_t"].shape == (2, 30, 3, cfg.n_segs, 3)
    assert data["scene_center_dense"].shape[2] == 3


def test_determinism(cfg):
    a = synthetic.generate_dataset(5, 3, cfg)
    b = synthetic.generate_dataset(5, 3, cfg)
    np.testing.assert_array_equal(a["ego_traj"], b["ego_traj"])
