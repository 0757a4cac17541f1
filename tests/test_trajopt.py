"""Trajopt augmentation: optimization actually raises STL satisfaction."""

import numpy as np
import jax
import jax.numpy as jnp

from pstl_tpu import specs, trajopt
from pstl_tpu.config import Config
from pstl_tpu.data.dataset import SceneDataset
from tests.test_specs import make_batch


def test_trajopt_improves_scores():
    cfg = Config(diffusion=True, n_randoms=4, n_neighbors=2,
                 flex=True).finalize().with_(epochs=1)
    bs = 2
    batch = make_batch(cfg, bs=bs)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    signal_base = specs.dense_signal_input(dense)
    formulas = specs.build_formulas(cfg)
    states = gt[:, 0]
    rng = np.random.RandomState(0)
    p0 = jnp.asarray(np.stack([
        rng.uniform(-cfg.mul_w_max, cfg.mul_w_max,
                    (bs, cfg.n_randoms, 3, cfg.nt)) * 0.1,
        rng.uniform(-cfg.mul_a_max, cfg.mul_a_max,
                    (bs, cfg.n_randoms, 3, cfg.nt)),
    ], axis=-1).astype(np.float32))

    p_opt, scores, aux = trajopt.optimize(p0, states, signal_base,
                                          dense["highlevel_dense"], formulas,
                                          cfg, iters=400)
    # score the initial params for comparison
    n = bs * cfg.n_randoms * 3
    from pstl_tpu.ops import dynamics as dyn
    states_flat = jnp.broadcast_to(states[:, None, None],
                                   (bs, cfg.n_randoms, 3, 4)).reshape(n, 4)
    _, aux0 = trajopt.trajopt_loss(p0.reshape(n, cfg.nt, 2), states_flat,
                                   signal_base, dense["highlevel_dense"],
                                   formulas, cfg)
    valid = dense["valids_dense"].reshape(-1)
    acc0 = float(specs.mask_mean((aux0["scores"] > 0).astype(jnp.float32),
                                 valid))
    acc1 = float(specs.mask_mean(
        (scores.reshape(-1) > 0).astype(jnp.float32), valid))
    assert acc1 > acc0, (acc0, acc1)
    # calibrated flex bands are tight (+-0.3 m lane offset); 400 iters from
    # random seeds reaches partial satisfaction (reference runs 2000; the
    # full-budget quality bar lives in the slow-tier/pipeline trajopt runs)
    assert acc1 >= 0.15, acc1
    # optimized controls respect bounds (within penalty slack)
    assert float(jnp.abs(p_opt[..., 0]).max()) < cfg.mul_w_max * 1.5
    assert float(jnp.abs(p_opt[..., 1]).max()) < cfg.mul_a_max * 1.5


def test_trajopt_loss_robust_draws_consistent():
    """stlp_draws with a single draw equals the plain path (the K-draw
    expected hinge reduces to the single-draw hinge at K=1), and K>1
    averages draw hinges."""
    cfg = Config(diffusion=True, n_randoms=2, n_neighbors=2,
                 flex=True).finalize().with_(epochs=1)
    bs = 2
    batch = make_batch(cfg, bs=bs)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    signal_base = specs.dense_signal_input(dense)
    formulas = specs.build_formulas(cfg)
    n = bs * cfg.n_randoms * 3
    states_flat = jnp.broadcast_to(gt[:, 0][:, None, None],
                                   (bs, cfg.n_randoms, 3, 4)).reshape(n, 4)
    rng = np.random.RandomState(1)
    p = jnp.asarray(rng.uniform(-0.3, 0.3, (n, cfg.nt, 2)).astype(np.float32))
    hl = dense["highlevel_dense"]
    l_plain, _ = trajopt.trajopt_loss(p, states_flat, signal_base, hl,
                                      formulas, cfg)
    draws1 = dense["stlp_dense"][None]
    l_k1, aux1 = trajopt.trajopt_loss(p, states_flat, signal_base, hl,
                                      formulas, cfg, stlp_draws=draws1)
    np.testing.assert_allclose(float(l_k1), float(l_plain), rtol=1e-5)
    # K=2 with a second (different) draw: loss is the mean of the two
    # single-draw losses
    d2 = specs.get_dense_stlp(jax.random.PRNGKey(7), batch["gt_high_level"],
                              stlp, cfg)
    sb2 = dict(signal_base)
    sb2["stlp"] = d2
    l_d2, _ = trajopt.trajopt_loss(p, states_flat, sb2, hl, formulas, cfg)
    l_k2, aux2 = trajopt.trajopt_loss(
        p, states_flat, signal_base, hl, formulas, cfg,
        stlp_draws=jnp.stack([dense["stlp_dense"], d2]))
    # reg term identical across variants; dense parts average
    reg = float(trajopt.trajopt_loss(p, states_flat, signal_base, hl,
                                     formulas, cfg)[1]["reg_loss"])
    np.testing.assert_allclose(float(l_k2) - reg,
                               ((float(l_plain) - reg)
                                + (float(l_d2) - reg)) / 2, rtol=1e-4)
    # reported scores come from the canonical draw 0
    np.testing.assert_allclose(np.asarray(aux2["scores"]),
                               np.asarray(aux1["scores"]), rtol=1e-5)


def test_augment_dataset_attaches_columns():
    # trajopt_robust_draws=1: the K-draw hinge quadruples the loss graph
    # (and its compile time); K-consistency is pinned by the dedicated
    # test above, this one only checks column attachment/shapes
    cfg = Config(diffusion=True, n_randoms=2, n_neighbors=2,
                 n_synth_scenes=4, flex=True,
                 trajopt_robust_draws=1).finalize().with_(epochs=1)
    ds = SceneDataset.from_synthetic(cfg, n_scenes=4)
    formulas = specs.build_formulas(cfg)
    trajopt.augment_dataset(ds, cfg, formulas, batch_size=4, iters=20,
                            verbose=False)
    assert ds.has("params") and ds.has("tj_scores_prior") and ds.has("pre_stlp")
    assert ds.data["params"].shape == (4, 2, 3, cfg.nt, 2)
    assert ds.data["tj_scores_prior"].shape == (4, 2, 3)
    assert ds.data["pre_stlp"].shape == (4, 2, 3, 1, 6)
    assert np.all(np.isfinite(ds.data["params"]))
