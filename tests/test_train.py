"""Training engine smoke tests: loss decreases, rect-only masking, sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu import diffusion, specs, train
from pstl_tpu.config import Config
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net


def tiny_cfg(**kw):
    base = dict(diffusion=True, n_randoms=4, n_neighbors=2,
                diffusion_steps=8, batch_size=4, n_synth_scenes=8,
                compute_dtype="float32", flex=True, lr=1e-3)
    base.update(kw)
    return Config(**base).finalize().with_(epochs=1)


def setup(cfg):
    ds = SceneDataset.from_synthetic(cfg, n_scenes=8)
    ds.ensure_random_params(0)
    formulas = specs.build_formulas(cfg)
    coeffs = diffusion.get_coeffs(cfg)
    net = Net(cfg)
    batch = next(batch_iterator(ds, "train", cfg.batch_size, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not k.startswith(("scene_", "traj_i", "ti"))}
    state = train.init_state(cfg, net, batch, jax.random.PRNGKey(0))
    opt = train.make_optimizer(cfg, state.params)
    state = train.TrainState(state.params, opt.init(state.params), state.step)
    return ds, formulas, coeffs, net, batch, state, opt


@pytest.mark.slow
def test_diffusion_loss_decreases():
    # stl_bc_mask (forced on by finalize) masks eps-MSE to STL-satisfying
    # augmented samples; without a trajopt pass none satisfy, so disable it
    # for this smoke test
    cfg = tiny_cfg().with_(stl_bc_mask=False)
    ds, formulas, coeffs, net, batch, state, opt = setup(cfg)
    step = train.make_train_step(cfg, net, formulas, coeffs, opt)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        state, rd = step(state, batch, k)
        losses.append(float(rd["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


@pytest.mark.slow
def test_chunked_epoch_exactly_matches_per_batch():
    """Device-side epoch chunking (cfg.train_chunk) runs the SAME steps
    with the SAME keys — final params must match per-batch dispatch
    bit-for-bit, including a non-divisible remainder batch."""
    cfg_a = tiny_cfg().with_(stl_bc_mask=False, epochs=2, train_chunk=1,
                             exp_name=None, train_ratio=0.75)
    cfg_b = cfg_a.with_(train_chunk=4)   # 6 train batches? bs=4, 8 scenes
    st_a = train.train(cfg_a, SceneDataset.from_synthetic(cfg_a, n_scenes=12),
                       log=lambda *a: None)
    st_b = train.train(cfg_b, SceneDataset.from_synthetic(cfg_b, n_scenes=12),
                       log=lambda *a: None)
    la = jax.tree_util.tree_leaves(st_a.params)
    lb = jax.tree_util.tree_leaves(st_b.params)
    assert int(st_a.step) == int(st_b.step) > 0
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_vae_mode_trains():
    cfg = tiny_cfg(vae=True, diffusion=False, bc_weight=1.0)
    ds, formulas, coeffs, net, batch, state, opt = setup(cfg)
    step = train.make_train_step(cfg, net, formulas, coeffs, opt)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        state, rd = step(state, batch, k)
    assert np.isfinite(float(rd["loss"]))
    assert "loss_vae_kl" in rd


@pytest.mark.slow
def test_bc_mode_trains():
    cfg = tiny_cfg(bc=True, diffusion=False, bc_weight=1.0)
    ds, formulas, coeffs, net, batch, state, opt = setup(cfg)
    step = train.make_train_step(cfg, net, formulas, coeffs, opt)
    state, rd = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(rd["loss"]))


@pytest.mark.slow
def test_rect_only_updates():
    """With rect_head and not joint, only rect_net/merge_net params move
    (nusc_train.py:1229-1233)."""
    cfg = tiny_cfg(rect_head=True, diverse_loss=True, multi_cands=2)
    ds, formulas, coeffs, net, batch, state, opt = setup(cfg)
    step = train.make_train_step(cfg, net, formulas, coeffs, opt)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state2, rd = step(state, batch, jax.random.PRNGKey(3))
    p1 = jax.tree_util.tree_map(np.asarray, state2.params)

    moved, frozen = [], []
    def walk(a, b, path=""):
        if isinstance(a, dict):
            for k in a:
                walk(a[k], b[k], path + "/" + k)
        else:
            delta = np.abs(a - b).max()
            (moved if delta > 0 else frozen).append((path, delta))

    walk(p0["params"], p1["params"])
    moved_names = " ".join(p for p, _ in moved)
    assert all(("rect_net" in p or "merge_net" in p) for p, _ in moved), \
        moved_names
    assert any("rect_net" in p for p, _ in moved), "rect_net did not move"
    frozen_names = " ".join(p for p, _ in frozen)
    assert any("policy_net" in p for p, _ in frozen), frozen_names


@pytest.mark.slow
def test_train_step_sharded_over_mesh():
    """Full train step over the virtual 8-device mesh."""
    from pstl_tpu.parallel import make_mesh, shard_batch, replicate
    cfg = tiny_cfg(batch_size=8)
    ds = SceneDataset.from_synthetic(cfg, n_scenes=16)
    ds.ensure_random_params(0)
    formulas = specs.build_formulas(cfg)
    coeffs = diffusion.get_coeffs(cfg)
    net = Net(cfg)
    batch = next(batch_iterator(ds, "train", 8, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not k.startswith(("scene_", "traj_i", "ti"))}
    state = train.init_state(cfg, net, batch, jax.random.PRNGKey(0))
    opt = train.make_optimizer(cfg, state.params)
    state = train.TrainState(state.params, opt.init(state.params), state.step)
    mesh = make_mesh((8,), ("data",))
    state = jax.device_put(state, replicate(mesh))
    batch = shard_batch(batch, mesh)
    step = train.make_train_step(cfg, net, formulas, coeffs, opt)
    state2, rd = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(rd["loss"]))
    # sharded batch actually spanned 8 devices
    any_arr = batch["ego_traj"]
    assert len(any_arr.sharding.device_set) == 8


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    ds, formulas, coeffs, net, batch, state, opt = setup(cfg)
    train.save_checkpoint(str(tmp_path), state, 0)
    state2 = train.load_checkpoint(str(tmp_path), state)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_mono_gt_data_training():
    """e4 preset path: gt_data_training diffusion (mono branch)."""
    cfg = tiny_cfg(gt_data_training=True)
    ds, formulas, coeffs, net, batch, state, opt = setup(cfg)
    step = train.make_train_step(cfg, net, formulas, coeffs, opt)
    state, rd = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(rd["loss"]))
    assert "loss_diffusion" in rd and "loss_stl" in rd


def test_gt_nei_false_uses_const_velocity_prediction():
    """gt_nei=False replaces GT neighbor tracks with constant-velocity
    rollouts from the current frame (nusc_train.py:1262-1265)."""
    import jax.numpy as jnp
    from pstl_tpu.train import attach_neighbors
    from pstl_tpu.config import Config
    cfg = Config(nt=6, dt=0.5, n_neighbors=2)
    rng = np.random.RandomState(0)
    nt = rng.randn(3, 2, 6, 7).astype(np.float32)
    nt[..., 0] = 1.0
    batch = {"neighbors_traj": jnp.asarray(nt)}
    gt = attach_neighbors(batch, cfg.with_(gt_nei=True))
    np.testing.assert_allclose(np.asarray(gt["neighbor_trajs_aug"]), nt)
    cv = attach_neighbors(batch, cfg.with_(gt_nei=False))
    aug = np.asarray(cv["neighbor_trajs_aug"])
    assert aug.shape == (3, 2, 6, 7)
    # heading/speed constant along the const-vel rollout
    np.testing.assert_allclose(aug[..., 3], aug[..., 0:1, 3] * np.ones((1, 1, 6)),
                               rtol=1e-5)
    # x advances by v*cos(th)*dt each step
    expect_dx = aug[:, :, 0, 4] * np.cos(aug[:, :, 0, 3]) * cfg.dt
    np.testing.assert_allclose(aug[:, :, 1, 1] - aug[:, :, 0, 1], expect_dx,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_grad_rollout_trains_through_sampler():
    """--grad_rollout without rect_head runs the sampler inside the loss
    with gradients flowing (loss_stl non-zero weight in the total)."""
    import jax
    from pstl_tpu.config import Config
    from pstl_tpu.data.dataset import SceneDataset, batch_iterator
    cfg = Config(diffusion=True, grad_rollout=True, diffusion_steps=4,
                 n_randoms=2, n_neighbors=2, batch_size=4,
                 compute_dtype="float32", train_ratio=0.5).finalize()
    ds = SceneDataset.from_synthetic(cfg, n_scenes=8)
    ds.ensure_random_params(0)
    from pstl_tpu import train as tr
    state = tr.train(cfg, ds, log=lambda *a: None, epochs=1)
    assert int(state.step) > 0
