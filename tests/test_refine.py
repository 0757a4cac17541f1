"""Test-time refinement: convex combination, raw residual, backup controller."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu import diffusion, refine, specs
from pstl_tpu.config import Config
from pstl_tpu.ops import dynamics as dyn
from tests.test_specs import make_batch


@pytest.fixture(scope="module")
def setup():
    cfg = Config(diffusion=True, n_randoms=4, n_neighbors=2,
                 diffusion_steps=100, compute_dtype="float32",
                 flex=True).finalize().with_(epochs=1)
    bs = 2
    batch = make_batch(cfg, bs=bs)
    batch["neighbors_traj"] = batch["neighbor_trajs_aug"]
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    signal_base = specs.dense_signal_input(dense)
    formulas = specs.build_formulas(cfg)
    n = bs * cfg.n_randoms * 3
    states_flat = jnp.broadcast_to(gt[:, 0][:, None, None],
                                   (bs, cfg.n_randoms, 3, 4)).reshape(n, 4)
    score_rows = specs.make_score_rows(batch, dense, cfg)
    valid = dense["valids_dense"].reshape(-1)
    return cfg, dense, signal_base, formulas, states_flat, n, score_rows, \
        valid


def mean_score(cfg, signal_base, formulas, dense, states_flat, u):
    valid = signal_base["dense_valids"].reshape(-1)
    trajs = dyn.rollout(states_flat, u, cfg.dt)
    sig = dict(signal_base)
    sig["ego_traj"] = trajs[:, :-1]
    _, s, acc = specs.compute_scores(sig, formulas, dense["highlevel_dense"],
                                     valid, cfg)
    return float(specs.mask_mean(s, valid)), float(acc)


@pytest.mark.slow
def test_raw_refinement_improves(setup):
    cfg, dense, signal_base, formulas, states_flat, n, score_rows, valid = setup
    rng = np.random.RandomState(0)
    u0 = jnp.asarray(rng.randn(n, cfg.nt, 2).astype(np.float32)
                     * np.array([0.1, 1.0], np.float32))
    s_before, _ = mean_score(cfg, signal_base, formulas, dense, states_flat,
                             u0)
    u1 = refine.raw_refinement(u0, states_flat, score_rows, valid, cfg,
                               n_iters=30, lr=0.05)
    s_after, _ = mean_score(cfg, signal_base, formulas, dense, states_flat,
                            u1)
    assert s_after > s_before, (s_before, s_after)


def test_convex_refinement_runs_and_not_worse(setup):
    cfg, dense, signal_base, formulas, states_flat, n, score_rows, valid = setup
    rng = np.random.RandomState(1)
    # fake cached denoise steps (40, n, nt, 2) — the property (refined
    # score never worse) is independent of the cache depth; the full
    # T=100 depth runs in the pipeline evals
    all_steps = jnp.asarray(rng.randn(40, n, cfg.nt, 2).astype(np.float32)
                            * np.array([0.1, 1.0], np.float32))
    u0 = all_steps[-1]
    s_before, _ = mean_score(cfg, signal_base, formulas, dense, states_flat,
                             u0)
    u1 = refine.convex_refinement(u0, all_steps, states_flat, score_rows,
                                  valid, cfg, K=6, n_iters=12)
    s_after, _ = mean_score(cfg, signal_base, formulas, dense, states_flat,
                            u1)
    assert np.isfinite(s_after)
    assert s_after >= s_before - 1e-3


def test_backup_controller_restores_clearance(setup):
    cfg, *_ = setup
    # ego heading straight at a stopped car 6 m ahead at 5 m/s
    ego_traj = jnp.asarray([[[0.0, 0, 0, 5.0], [2.5, 0, 0, 5.0],
                             [5.0, 0, 0, 5.0]]])
    ego_ctrls = jnp.zeros((1, 3, 2))
    nei = jnp.asarray([[[1.0, 6.0, 0.0, 0.0, 0.0, 4.0, 2.0]] * 3])
    from pstl_tpu.ops import geometry as geom

    def min_clear(u_res):
        traj = dyn.rollout(ego_traj[:, 0, :4], ego_ctrls[:, 0:2]
                           + u_res[None], cfg.dt)
        c = geom.car_clearance(traj[:, 1:3, :3], cfg.ego_L, cfg.ego_W,
                               nei[:, 1:3, 1:4], nei[:, 1:3, 5],
                               nei[:, 1:3, 6], cfg.refined_nL, cfg.refined_nW)
        return float(c.min())

    before = min_clear(jnp.zeros((2, 2)))
    u_res = refine.solve_backup(ego_traj, ego_ctrls, nei, cfg, n_iters=200)
    after = min_clear(u_res)
    assert after > before, (before, after)
    # residual should brake (negative accel at step 0)
    assert float(u_res[0, 1]) < 0
