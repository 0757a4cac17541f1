"""DDIM fast sampler: shapes, determinism at eta=0, sampler dispatch."""

import numpy as np
import jax
import jax.numpy as jnp

from pstl_tpu import diffusion
from tests.test_diffusion import small_cfg, make_sampler_setup


def test_ddim_shapes_and_determinism():
    cfg = small_cfg(sampler="ddim", ddim_steps=5, diff_full=True)
    (apply_fn, dense, feature, states_flat, coeffs, formulas, signal_base,
     ctx, n) = make_sampler_setup(cfg)
    c, all_steps = diffusion.reverse_sample_ddim(
        jax.random.PRNGKey(0), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg, coeffs, n)
    assert c.shape == (n, cfg.nt, 2)
    assert all_steps.shape == (5 + 1, n, cfg.nt, 2)
    np.testing.assert_allclose(np.asarray(all_steps[-1]), np.asarray(c),
                               atol=1e-6)
    # eta=0: fully deterministic given the init key-noise — two different
    # loop keys with the same init produce the same sample
    c2, _ = diffusion.reverse_sample_ddim(
        jax.random.PRNGKey(0), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg, coeffs, n)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c))


def test_ddim_eta_adds_noise():
    cfg = small_cfg(sampler="ddim", ddim_steps=5, ddim_eta=1.0)
    (apply_fn, dense, feature, states_flat, coeffs, formulas, signal_base,
     ctx, n) = make_sampler_setup(cfg)
    c1, _ = diffusion.reverse_sample_ddim(
        jax.random.PRNGKey(1), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg, coeffs, n)
    c2, _ = diffusion.reverse_sample_ddim(
        jax.random.PRNGKey(2), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg, coeffs, n)
    assert np.abs(np.asarray(c1) - np.asarray(c2)).max() > 1e-4
    assert np.all(np.isfinite(np.asarray(c1)))


def test_dpmpp_shapes_determinism_and_quality():
    """DPM-Solver++(2M): shapes, determinism, and the 2nd-order update
    stays bounded/finite; dispatch via cfg.sampler="dpmpp"."""
    cfg = small_cfg(sampler="dpmpp", ddim_steps=6, diff_full=True)
    (apply_fn, dense, feature, states_flat, coeffs, formulas, signal_base,
     ctx, n) = make_sampler_setup(cfg)
    c, all_steps = diffusion.sample(
        jax.random.PRNGKey(0), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg, coeffs, n)
    assert c.shape == (n, cfg.nt, 2)
    # S-1 scan steps + init noise + final decode
    assert all_steps.shape[0] == 6 + 1
    np.testing.assert_allclose(np.asarray(all_steps[-1]), np.asarray(c),
                               atol=1e-6)
    assert np.all(np.isfinite(np.asarray(c)))
    c2, _ = diffusion.sample(
        jax.random.PRNGKey(0), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg, coeffs, n)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c))
    # the deterministic solver tracks the same model as DDIM(eta=0):
    # samples from the same init noise land in the same region
    cd, _ = diffusion.reverse_sample_ddim(
        jax.random.PRNGKey(0), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg.with_(sampler="ddim"), coeffs, n)
    assert float(np.abs(np.asarray(c) - np.asarray(cd)).mean()) < \
        float(np.abs(np.asarray(cd)).mean()) + 1.0


def test_sample_dispatch():
    cfg = small_cfg(sampler="ddim", ddim_steps=4, diff_full=True)
    (apply_fn, dense, feature, states_flat, coeffs, formulas, signal_base,
     ctx, n) = make_sampler_setup(cfg)
    c, steps = diffusion.sample(jax.random.PRNGKey(0), apply_fn, dense,
                                dense["highlevel_dense"], feature, cfg,
                                coeffs, n)
    assert steps.shape[0] == 4 + 1
    cfg2 = cfg.with_(sampler="ddpm")
    c2, steps2 = diffusion.sample(jax.random.PRNGKey(0), apply_fn, dense,
                                  dense["highlevel_dense"], feature, cfg2,
                                  coeffs, n)
    assert steps2.shape[0] == cfg.diffusion_steps
    # --diff_full off: only the final decode is retained
    # (nusc_train.py:630)
    cfg3 = cfg.with_(sampler="ddpm", diff_full=False)
    c3, steps3 = diffusion.sample(jax.random.PRNGKey(0), apply_fn, dense,
                                  dense["highlevel_dense"], feature, cfg3,
                                  coeffs, n)
    assert steps3.shape[0] == 1
    np.testing.assert_allclose(np.asarray(c3), np.asarray(c2), atol=1e-6)


def test_fast_taus_guided_focus():
    """_fast_taus: uniform by default; with fast_guided_focus and a banded
    trigger, the requested fraction of evaluations lands inside
    [1, guidance_before], strictly decreasing, endpoints preserved."""
    from pstl_tpu.config import Config
    base = dict(diffusion=True, diffusion_steps=100, ddim_steps=20)
    uni = diffusion._fast_taus(Config(**base).finalize())
    assert len(uni) == 20 and uni[0] == 99 and uni[-1] == 1
    assert (np.diff(uni) < 0).all()
    cfg = Config(**base, guidance=True, guidance_before=10,
                 fast_guided_focus=0.5).finalize()
    taus = diffusion._fast_taus(cfg)
    assert len(taus) == 20 and taus[0] == 99 and taus[-1] == 1
    assert (np.diff(taus) < 0).all()
    in_band = int((taus <= 10).sum())
    assert in_band == 10                     # 0.5 * 20 evaluations
    # all-steps guidance (guidance_before >= T-1): focus is a no-op
    cfg_all = Config(**base, guidance=True, guidance_before=1000,
                     fast_guided_focus=0.5).finalize()
    np.testing.assert_array_equal(diffusion._fast_taus(cfg_all), uni)


def test_ddim_runs_with_guided_focus():
    cfg = small_cfg(sampler="ddim", ddim_steps=6, guidance=True,
                    guidance_before=3, guidance_niters=1,
                    fast_guided_focus=0.5)
    (apply_fn, dense, feature, states_flat, coeffs, formulas, signal_base,
     ctx, n) = make_sampler_setup(cfg)
    c, _ = diffusion.reverse_sample_ddim(
        jax.random.PRNGKey(0), apply_fn, dense, dense["highlevel_dense"],
        feature, cfg, coeffs, n, guidance_ctx=ctx, maximize=True)
    assert np.isfinite(np.asarray(c)).all()


def test_fast_taus_explicit_band():
    """fast_focus_band applies the focus with an all-steps trigger."""
    from pstl_tpu.config import Config
    cfg = Config(diffusion=True, diffusion_steps=100, ddim_steps=20,
                 guidance=True, guidance_before=1000,
                 fast_guided_focus=0.4, fast_focus_band=10).finalize()
    taus = diffusion._fast_taus(cfg)
    assert len(taus) == 20 and (np.diff(taus) < 0).all()
    assert int((taus <= 10).sum()) == 8      # 0.4 * 20
