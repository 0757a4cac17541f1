"""Policy network: shapes, modes, RefineNet semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu.config import Config
from pstl_tpu.models import Net, normalize_xyth, pos_encoding
from tests.test_specs import make_batch


def base_cfg(**kw):
    kw.setdefault("n_randoms", 4)
    kw.setdefault("n_neighbors", 2)
    kw.setdefault("compute_dtype", "float32")
    return Config(**kw)


def test_normalize_xyth_identity_frame():
    state = jnp.asarray([[3.0, 4.0, 0.5]])
    base = jnp.zeros((1, 3))
    np.testing.assert_allclose(normalize_xyth(state, base), state, atol=1e-6)


def test_normalize_xyth_rotation():
    # point 1m ahead of a base heading 90deg -> local frame (1, 0)
    state = jnp.asarray([[0.0, 1.0, jnp.pi / 2]])
    base = jnp.asarray([[0.0, 0.0, jnp.pi / 2]])
    out = normalize_xyth(state, base)
    np.testing.assert_allclose(out, [[1.0, 0.0, 0.0]], atol=1e-6)


def test_pos_encoding_shape_and_range():
    t = jnp.asarray([[0.0], [50.0], [99.0]])
    enc = pos_encoding(t, 32)
    assert enc.shape == (3, 32)
    assert float(jnp.abs(enc).max()) <= 1.0 + 1e-6


@pytest.mark.slow
def test_diffusion_forward_shapes():
    cfg = base_cfg(diffusion=True)
    net = Net(cfg)
    bs = 2
    batch = make_batch(cfg, bs=bs)
    batch["neighbors"] = batch["neighbor_trajs_aug"][:, :, 0, :]
    from pstl_tpu import specs
    stlp = specs.calibrate_stlp(batch, batch["ego_traj"][..., :4], cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    n = bs * cfg.n_randoms * 3
    ext = {
        "timestep": jnp.ones((n, 1)),
        "highlevel": dense["highlevel_dense"],
        "noise": jnp.zeros((n, cfg.nt * 2)),
    }
    params = net.init(jax.random.PRNGKey(0), dense, ext)
    controls, feature = net.apply(params, dense, ext, get_feature=True)
    assert controls.shape == (n, cfg.nt, 2)
    assert feature.shape == (n, 7 * 32)
    # residual head: zero noise input -> output is the raw MLP (finite)
    assert np.all(np.isfinite(np.asarray(controls)))
    # reuse feature path
    c2 = net.apply(params, dense, ext, prev_feature=feature)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(controls),
                               atol=1e-6)


def test_bc_mode_bounds():
    cfg = base_cfg(bc=True)
    net = Net(cfg)
    bs = 2
    batch = make_batch(cfg, bs=bs)
    batch["neighbors"] = batch["neighbor_trajs_aug"][:, :, 0, :]
    from pstl_tpu import specs
    stlp = specs.calibrate_stlp(batch, batch["ego_traj"][..., :4], cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    ext = {"highlevel": dense["highlevel_dense"]}
    params = net.init(jax.random.PRNGKey(0), dense, ext)
    controls = net.apply(params, dense, ext)
    # tanh-bounded outputs
    assert float(jnp.abs(controls[..., 0]).max()) <= cfg.mul_w_max + 1e-5
    assert float(jnp.abs(controls[..., 1]).max()) <= cfg.mul_a_max + 1e-5


def test_vae_mode_latent_stats():
    cfg = base_cfg(vae=True)
    net = Net(cfg)
    bs = 2
    batch = make_batch(cfg, bs=bs)
    batch["neighbors"] = batch["neighbor_trajs_aug"][:, :, 0, :]
    from pstl_tpu import specs
    stlp = specs.calibrate_stlp(batch, batch["ego_traj"][..., :4], cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    n = bs * cfg.n_randoms * 3
    ext = {
        "highlevel": dense["highlevel_dense"],
        "noise": jnp.zeros((n, cfg.vae_dim)),
        "trajopt_controls": jnp.zeros((n, cfg.nt, 2)),
    }
    params = net.init(jax.random.PRNGKey(0), dense, ext)
    controls, (mean, logstd, std) = net.apply(params, dense, ext)
    assert controls.shape == (n, cfg.nt, 2)
    assert mean.shape == (n, cfg.vae_dim)
    np.testing.assert_allclose(np.asarray(std), np.exp(np.asarray(logstd)),
                               rtol=1e-5)


def rect_setup(cfg):
    net = Net(cfg)
    bs = 1
    batch = make_batch(cfg, bs=bs)
    batch["neighbors"] = batch["neighbor_trajs_aug"][:, :, 0, :]
    from pstl_tpu import specs
    stlp = specs.calibrate_stlp(batch, batch["ego_traj"][..., :4], cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    n = bs * cfg.n_randoms * 3
    ext = {
        "timestep": jnp.ones((n, 1)),
        "highlevel": dense["highlevel_dense"],
        "noise": jnp.zeros((n, cfg.nt * 2)),
    }
    params = net.init(jax.random.PRNGKey(0), dense, ext,
                      method=Net.init_all)
    _, feature = net.apply(params, dense, ext, get_feature=True)
    return net, params, dense, feature, n


@pytest.mark.slow
def test_rect_noop_on_satisfying_samples():
    cfg = base_cfg(diffusion=True, rect_head=True, diverse_loss=True).finalize()
    cfg = cfg.with_(n_randoms=4, n_neighbors=2, compute_dtype="float32",
                    epochs=1)
    net, params, dense, feature, n = rect_setup(cfg)
    init_controls = jnp.zeros((n, cfg.nt, 2)).at[..., 1].set(1.0)
    scores_pos = jnp.ones((n,))     # satisfied -> delta must be zeroed
    out = net.apply(params, feature, dense["highlevel_dense"],
                    dense["stlp_dense"][:, 0], init_controls, scores_pos,
                    method=Net.rect)
    np.testing.assert_allclose(np.asarray(out), np.asarray(init_controls),
                               atol=1e-6)


def test_rect_interval_keeps_bounds():
    cfg = base_cfg(diffusion=True, rect_head=True, diverse_loss=True).finalize()
    cfg = cfg.with_(n_randoms=4, n_neighbors=2, compute_dtype="float32",
                    epochs=1)
    assert cfg.interval    # coupled by finalize
    net, params, dense, feature, n = rect_setup(cfg)
    rng = np.random.RandomState(0)
    init_controls = jnp.asarray(
        rng.uniform(-1, 1, (n, cfg.nt, 2))
        * np.array([cfg.mul_w_max, cfg.mul_a_max]), dtype=jnp.float32)
    scores_neg = -jnp.ones((n,))    # all violating -> rectified
    out = net.apply(params, feature, dense["highlevel_dense"],
                    dense["stlp_dense"][:, 0], init_controls, scores_neg,
                    method=Net.rect)
    out = np.asarray(out)
    assert np.abs(out[..., 0]).max() <= cfg.mul_w_max + 1e-5
    assert np.abs(out[..., 1]).max() <= cfg.mul_a_max + 1e-5
    # and it actually changed something
    assert np.abs(out - np.asarray(init_controls)).max() > 1e-5


def test_param_count_order():
    """All-MLP stack should be ~0.5M params like the reference."""
    cfg = base_cfg(diffusion=True)
    net = Net(cfg)
    bs = 1
    batch = make_batch(cfg, bs=bs)
    batch["neighbors"] = batch["neighbor_trajs_aug"][:, :, 0, :]
    from pstl_tpu import specs
    stlp = specs.calibrate_stlp(batch, batch["ego_traj"][..., :4], cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    n = bs * cfg.n_randoms * 3
    ext = {"timestep": jnp.ones((n, 1)), "highlevel": dense["highlevel_dense"],
           "noise": jnp.zeros((n, cfg.nt * 2))}
    params = net.init(jax.random.PRNGKey(0), dense, ext)
    count = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 2e5 < count < 2e6, count
