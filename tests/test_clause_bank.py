"""ClauseBank (fused scorer) vs the formula-tree path: identical numerics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu import specs
from pstl_tpu.config import Config
from tests.test_specs import make_batch


@pytest.mark.parametrize("norm_stl", [False, True])
@pytest.mark.parametrize("hard", [False, True])
@pytest.mark.slow
def test_bank_matches_formulas(norm_stl, hard):
    cfg = Config(diffusion=True, n_randoms=4, n_neighbors=2,
                 norm_stl=norm_stl)
    batch = make_batch(cfg, bs=3)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    # perturb trajectories so scores span satisfied and violated
    rng = np.random.RandomState(0)
    traj = gt + jnp.asarray(rng.randn(*gt.shape).astype(np.float32)) * 0.5
    signals = specs.prep_signals({
        "ego_traj": traj,
        "neighbors": batch["neighbor_trajs_aug"],
        "currlane_wpts": batch["currlane_wpts"],
        "leftlane_wpts": batch["leftlane_wpts"],
        "rightlane_wpts": batch["rightlane_wpts"],
        "stlp": stlp[:, None, :],
    }, cfg)
    formulas = specs.build_formulas(cfg)
    bank = specs.build_scorer(cfg)
    tau = cfg.smoothing_factor
    want = [f(signals, tau, hard)[:, 0] for f in formulas]
    got = bank.scores(signals, tau, hard)
    for i, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4,
                                   atol=2e-4, err_msg=f"formula {i}")


@pytest.mark.slow
def test_bank_gradients_match():
    cfg = Config(diffusion=True, n_randoms=4, n_neighbors=2)
    batch = make_batch(cfg, bs=2)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    base = {
        "neighbors": batch["neighbor_trajs_aug"],
        "currlane_wpts": batch["currlane_wpts"],
        "leftlane_wpts": batch["leftlane_wpts"],
        "rightlane_wpts": batch["rightlane_wpts"],
        "stlp": stlp[:, None, :],
    }
    formulas = specs.build_formulas(cfg)
    bank = specs.build_scorer(cfg)
    hl = batch["gt_high_level"][:, 0]
    mask = jnp.ones((2,))

    def loss(traj, scorer):
        sig = dict(base)
        sig["ego_traj"] = traj
        _, s, _ = specs.compute_scores(sig, scorer, hl, mask, cfg)
        return jnp.mean(jax.nn.relu(0.01 - s))

    g_f = jax.grad(lambda t: loss(t, formulas))(gt)
    g_b = jax.grad(lambda t: loss(t, bank))(gt)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_f), rtol=1e-3,
                               atol=1e-5)


def test_clause_breakdown_consistent_with_scores():
    cfg = Config(diffusion=True, n_randoms=4, n_neighbors=2)
    batch = make_batch(cfg, bs=3)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    bank = specs.build_scorer(cfg)
    signals = specs.prep_signals({
        "ego_traj": gt,
        "neighbors": batch["neighbor_trajs_aug"],
        "currlane_wpts": batch["currlane_wpts"],
        "leftlane_wpts": batch["leftlane_wpts"],
        "rightlane_wpts": batch["rightlane_wpts"],
        "stlp": stlp[:, None, :],
    }, cfg)
    tau = cfg.smoothing_factor
    br = bank.clause_breakdown(signals, tau, hard=True)
    assert set(br) == {"alw_vmin", "alw_vmax", "alw_dmin", "alw_dmax",
                       "alw_th", "alw_safe", "reach_left_d", "reach_left_th",
                       "reach_right_d", "reach_right_th"}
    # hard conjunction of the keep clauses == hard score of formula 0
    s = bank.scores(signals, tau, hard=True)
    keep = np.min(np.stack([np.asarray(br[k]) for k in
                            ("alw_vmin", "alw_vmax", "alw_dmin", "alw_dmax",
                             "alw_th", "alw_safe")]), axis=0)
    np.testing.assert_allclose(keep, np.asarray(s[0]), rtol=1e-5)


def test_compute_scores_with_bank_outlier_and_acc():
    cfg = Config(diffusion=True, n_randoms=4, n_neighbors=2)
    batch = make_batch(cfg, bs=3)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    bank = specs.build_scorer(cfg)
    signals = {
        "ego_traj": gt,
        "neighbors": batch["neighbor_trajs_aug"],
        "currlane_wpts": batch["currlane_wpts"],
        "leftlane_wpts": batch["leftlane_wpts"],
        "rightlane_wpts": batch["rightlane_wpts"],
        "stlp": stlp[:, None, :],
    }
    hl = jnp.full((3,), 3.0)
    _, scores, acc = specs.compute_scores(signals, bank, hl, jnp.ones((3,)),
                                          cfg)
    np.testing.assert_allclose(np.asarray(scores), 1.0)   # outlier class
