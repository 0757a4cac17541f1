"""Closed-loop simulator: observation extraction, env step, full episodes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu import diffusion, sim, specs
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu.models import Net


def sim_cfg(**kw):
    base = dict(diffusion=True, rect_head=True, multi_cands=2,
                diverse_loss=True, n_randoms=4, n_neighbors=2,
                diffusion_steps=6, compute_dtype="float32", flex=True)
    base.update(kw)
    return Config(**base).finalize().with_(epochs=1)


@pytest.fixture(scope="module")
def setup():
    cfg = sim_cfg()
    data = synthetic.generate_dataset(0, 3, cfg, scene_len=12)
    scenes = sim.scenes_from_dataset(data)
    net = Net(cfg)
    formulas = specs.build_formulas(cfg)
    coeffs = diffusion.get_coeffs(cfg)
    bs = 3
    obs0 = jax.vmap(lambda s, e, t: sim.observe(s, e, t, cfg),
                    in_axes=(0, 0, 0))(
        scenes, scenes.ego_full[:, 0], jnp.zeros((bs,), jnp.int32))
    n = bs * cfg.n_randoms * 3
    gt_stlp = jnp.broadcast_to(jnp.asarray(sim.AGGRESSIVE_STLP), (bs, 6))
    dense0 = specs.densify_batch(
        obs0, gt_stlp, cfg, key=jax.random.PRNGKey(0),
        stlp_dense=jnp.broadcast_to(jnp.asarray(sim.AGGRESSIVE_STLP),
                                    (n, 1, 6)))
    ext0 = {"timestep": jnp.ones((n, 1)),
            "highlevel": dense0["highlevel_dense"],
            "noise": jnp.zeros((n, cfg.nt * 2))}
    params = net.init(jax.random.PRNGKey(1), dense0, ext0,
                      method=Net.init_all)
    return cfg, data, scenes, net, formulas, coeffs, params


@pytest.mark.slow
def test_observe_shapes(setup):
    cfg, data, scenes, *_ = setup
    one = jax.tree_util.tree_map(lambda x: x[0], scenes)
    obs = sim.observe(one, one.ego_full[0], jnp.asarray(3), cfg)
    assert obs["ego_traj"].shape == (cfg.nt, 6)
    assert obs["neighbors_traj"].shape == (cfg.n_neighbors, cfg.nt, 7)
    assert obs["currlane_wpts"].shape == (cfg.n_segs, 3)
    # current lane window starts near the pose
    d0 = np.linalg.norm(np.asarray(obs["currlane_wpts"][0, :2])
                        - np.asarray(one.ego_full[0, :2]))
    assert d0 < 5.0


def test_lane_window_tracks_pose(setup):
    cfg, data, scenes, *_ = setup
    center = scenes.center_dense[0]
    far_pose = center[50, :2]
    win = sim.lane_window_device(center, far_pose, cfg.n_segs)
    d = np.linalg.norm(np.asarray(win[0, :2] - far_pose))
    assert d < 3.0


def test_env_step_collision_detection(setup):
    cfg, data, scenes, *_ = setup
    one = jax.tree_util.tree_map(lambda x: x[0], scenes)
    # teleport a neighbor onto the ego
    nei = one.nei_full.at[0, :, 0].set(1.0)
    nei = nei.at[0, :, 1:3].set(one.ego_full[1, 0:2])
    nei = nei.at[0, :, 5:7].set(jnp.asarray([4.0, 2.0]))
    crashed = one._replace(nei_full=nei)
    _, collide, _, _ = sim.env_step(crashed, one.ego_full[0],
                                    jnp.asarray(0), jnp.zeros(2), cfg)
    assert bool(collide)
    # and no collision in the clean scene
    _, collide2, _, _ = sim.env_step(one, one.ego_full[0], jnp.asarray(0),
                                     jnp.zeros(2), cfg)
    assert not bool(collide2)


def test_env_step_out_of_lane(setup):
    cfg, data, scenes, *_ = setup
    one = jax.tree_util.tree_map(lambda x: x[0], scenes)
    off = one.ego_full[0].at[1].add(50.0)    # 50 m lateral
    _, _, ool, _ = sim.env_step(one, off, jnp.asarray(0), jnp.zeros(2), cfg)
    assert bool(ool)
    _, _, ool2, _ = sim.env_step(one, one.ego_full[0], jnp.asarray(0),
                                 jnp.zeros(2), cfg)
    assert not bool(ool2)


def test_gt_replay_stays_in_lane(setup):
    """Replaying GT controls through env_step must not trigger
    out-of-lane (consistency between generator and checker)."""
    cfg, data, scenes, *_ = setup
    one = jax.tree_util.tree_map(lambda x: x[0], scenes)
    ego = one.ego_full[0]
    for t in range(8):
        # finite-difference GT controls
        s_next = one.ego_full[t + 1]
        u = jnp.asarray([(s_next[2] - ego[2]) / cfg.dt,
                         (s_next[3] - ego[3]) / cfg.dt])
        ego, collide, ool, _ = sim.env_step(one, ego, jnp.asarray(t), u, cfg)
        assert not bool(ool), f"GT replay out of lane at t={t}"


@pytest.mark.slow
def test_closed_loop_host_record_and_render(setup, tmp_path):
    cfg, data, scenes, net, formulas, coeffs, params = setup
    out = sim.run_closed_loop_host(
        jax.random.PRNGKey(0), scenes, cfg, net, params, formulas, coeffs,
        max_steps=2, record=True, render_dir=str(tmp_path))
    assert "history" in out and len(out["history"]["ego"]) >= 2
    assert np.isfinite(float(out["area"]))
    import os
    gifs = [f for f in os.listdir(tmp_path) if f.endswith(".gif")]
    frames = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert gifs and frames


@pytest.mark.slow
def test_closed_loop_episode_runs(setup):
    cfg, data, scenes, net, formulas, coeffs, params = setup
    out = jax.jit(lambda k: sim.run_closed_loop(
        k, scenes, cfg, net, params, formulas, coeffs, max_steps=4))(
        jax.random.PRNGKey(0))
    assert out["collide"].shape == (3,)
    assert float(out["agent_steps"]) > 0
    assert np.all(np.asarray(out["traj_len"]) <= 4)
    assert np.all(np.isfinite(np.asarray(out["progress"])))


@pytest.mark.slow
def test_closed_loop_vae_planner():
    """VAE (e3/e6 Table-II rows) drives the closed-loop planner."""
    import jax
    from pstl_tpu import diffusion as diff, sim, specs, train
    from pstl_tpu.data import synthetic
    from pstl_tpu.data.dataset import SceneDataset, batch_iterator
    from pstl_tpu.models import Net

    cfg = Config(vae=True, bc_weight=1.0, vae_dim=8, n_randoms=2,
                 n_neighbors=2, compute_dtype="float32",
                 flex=True).finalize().with_(epochs=1, test=True)
    data = synthetic.generate_dataset(5, 2, cfg, scene_len=12)
    scenes = sim.scenes_from_dataset(data)
    net = Net(cfg)
    ds = SceneDataset({k: v for k, v in data.items()
                       if not k.startswith("scene_")}, cfg)
    sample = next(batch_iterator(ds, "val", 1, shuffle=False,
                                 drop_last=False))
    st = train.init_state(cfg, net, sample, jax.random.PRNGKey(0))
    out = sim.run_closed_loop_host(
        jax.random.PRNGKey(0), scenes, cfg, net, st.params,
        specs.build_scorer(cfg), diff.get_coeffs(cfg), max_steps=2)
    assert np.all(np.isfinite(np.asarray(out["progress"])))


def test_rasterize_corridor_matches_analytic():
    """The synthetic-cache drivable raster agrees with the analytic
    corridor: points within CORRIDOR_HALF of a valid lane are drivable,
    far-off points are not."""
    from pstl_tpu import sim
    th = np.zeros(50)
    xs = np.linspace(0, 60, 50)
    center = np.stack([xs, np.zeros(50), th], -1).astype(np.float32)
    mask, origin, res = sim.rasterize_corridor(
        center, np.array([1.0, 1.0, 0.0], np.float32))

    def drivable(x, y):
        j = int((x - origin[0]) / res)
        i = int((y - origin[1]) / res)
        return bool(mask[i, j])

    assert drivable(30.0, 0.0)               # on the centerline
    assert drivable(30.0, 3.5 + 2.0)         # within the LEFT lane corridor
    assert not drivable(30.0, -3.5 - 2.0)    # right lane INVALID
    assert not drivable(30.0, 3.5 + 3.25 + 1.0)  # beyond left corridor


def test_apply_backup_first_unsafe_neighbor(monkeypatch):
    """Reference parity (nusc_sim.py:689-705): the backup controller
    repairs against the FIRST valid neighbor whose 2-step-ahead clearance
    is unsafe (slot order), not the nearest; safe scenes keep their plan;
    the Adam budget comes from cfg.backup_niters."""
    from pstl_tpu import refine
    cfg = sim_cfg().with_(backup=True, backup_niters=7)
    bs, K, nt = 2, 3, cfg.nt
    v = 2.0
    ts = np.arange(nt + 1) * cfg.dt
    plan = np.zeros((bs, nt + 1, 4), np.float32)
    plan[:, :, 0] = v * ts
    plan[:, :, 3] = v
    px = plan[0, 2, 0]                       # plan x at step 2

    nei = np.zeros((bs, K, nt, 7), np.float32)
    nei[:, :, :, 0] = 1.0                    # all slots valid
    nei[:, :, :, 5] = 4.0                    # L
    nei[:, :, :, 6] = 2.0                    # W
    # scene 0: slot 0 safe (far), slots 1 AND 2 unsafe at distinct poses
    nei[0, 0, :, 1] = 100.0
    nei[0, 1, :, 1] = px + 1.0
    nei[0, 2, :, 1] = px - 1.0
    nei[0, 2, :, 2] = 0.5
    # scene 1: everything far away (safe)
    nei[1, :, :, 1] = 200.0

    seen = {}

    def fake_solve_backup(pt, uu, nn, cfg_, n_iters):
        seen["n_iters"] = n_iters
        # encode the repaired-against neighbor's x so the test can tell
        # WHICH slot drove the residual
        return jnp.full((2, 2), nn[0, 2, 1])

    monkeypatch.setattr(refine, "solve_backup", fake_solve_backup)
    u0 = jnp.ones((bs, 2))
    info = {"plan_traj": jnp.asarray(plan)}
    obs = {"neighbor_trajs_aug": jnp.asarray(nei)}
    out, unsafe = sim._apply_backup(u0, info, obs, cfg)
    out = np.asarray(out)

    assert seen["n_iters"] == 7              # cfg.backup_niters honored
    np.testing.assert_array_equal(np.asarray(unsafe), [True, False])
    # scene 0: corrected control = u01[:,0] (zeros: straight constant-v
    # plan) + residual encoding slot 1's x — the FIRST unsafe slot, even
    # though slot 2 is closer to the plan point
    np.testing.assert_allclose(out[0], np.full(2, px + 1.0), atol=1e-5)
    # scene 1 safe: plan untouched
    np.testing.assert_allclose(out[1], np.ones(2), atol=1e-6)


def test_backup_forced_unsafe_repair_restores_clearance():
    """End-to-end backup repair with the REAL solve_backup (VERDICT r4 #6):
    a converging neighbor overlaps the plan's 2-step-ahead pose, so the
    2-step clearance is below D_SAFE; the repair must fire and the
    corrected 2-step controls must measurably improve clearance.  NOTE the
    reference's own solve_bak loss (nusc_sim.py:757-781) weights the L2
    residual penalty 1:1 against the clearance hinge, so the equilibrium
    correction is a NUDGE (~+0.02 m on this geometry), not a full
    restoration above D_SAFE — we assert the parity behavior."""
    from pstl_tpu.ops import dynamics as dyn, geometry as geom
    cfg = sim_cfg().with_(backup=True, backup_niters=500)
    bs, K, nt = 1, 2, cfg.nt
    v = 2.0
    ts = np.arange(nt + 1) * cfg.dt
    plan = np.zeros((bs, nt + 1, 4), np.float32)
    plan[:, :, 0] = v * ts                   # straight constant-v plan
    plan[:, :, 3] = v

    nei = np.zeros((bs, K, nt, 7), np.float32)
    nei[:, :, :, 0] = 1.0
    nei[:, :, :, 5] = 4.5                    # car-sized neighbor
    nei[:, :, :, 6] = 2.0
    # shallowly unsafe: lateral offset 2.2 m puts the 2-step clearance at
    # -0.03 (< D_SAFE) — the regime the 2-step residual CAN improve; a
    # perfectly axis-aligned overlap has zero lateral clearance gradient
    nei[0, 0, :, 1] = plan[0, 2, 0]
    nei[0, 0, :, 2] = 2.2
    nei[0, 0, :, 3] = 0.3
    nei[0, 1, :, 1] = 300.0                  # slot 1 far away

    u0 = jnp.zeros((bs, 2))                  # chosen first control
    info = {"plan_traj": jnp.asarray(plan)}
    obs = {"neighbor_trajs_aug": jnp.asarray(nei)}
    u_new, unsafe = sim._apply_backup(u0, info, obs, cfg)
    assert bool(unsafe[0]), "repair must fire on the forced-unsafe scene"
    assert not np.allclose(np.asarray(u_new[0]), np.asarray(u0[0])), \
        "corrected control must differ from the unsafe plan"

    def two_step_clearance(u_first):
        # roll the (repaired) first control + original second control and
        # measure min clearance over the two look-ahead steps
        u2 = jnp.stack([u_first, jnp.zeros(2)], axis=0)[None]  # (1, 2, 2)
        traj = dyn.rollout(jnp.asarray(plan[:, 0, :4]), u2, cfg.dt)
        cl = geom.car_clearance(
            traj[:, 1:3, :3], cfg.ego_L, cfg.ego_W,
            jnp.asarray(nei[:, 0, 1:3, 1:4]),
            jnp.asarray(nei[:, 0, 1:3, 5]), jnp.asarray(nei[:, 0, 1:3, 6]),
            cfg.refined_nL, cfg.refined_nW)
        return float(jnp.min(cl))

    before = two_step_clearance(u0[0])
    after = two_step_clearance(u_new[0])
    assert before < sim.D_SAFE               # the scene IS unsafe
    assert after > before + 0.01, \
        f"repair must improve clearance (before={before}, after={after})"


@pytest.mark.slow
def test_closed_loop_repairs_counter(setup):
    """The repairs metric counts backup activations inside the closed-loop
    body: a neighbor riding the GT corridor two steps ahead of the ego
    forces the planner's 2-step clearance below D_SAFE, so repairs must
    fire (> 0) and be reported by _carry_metrics."""
    cfg, data, scenes, net, formulas, coeffs, params = setup
    cfg_b = cfg.with_(backup=True, backup_niters=20)
    # neighbor slot 0 := GT ego pose shifted 2 frames ahead, large box
    nei = np.array(scenes.nei_full)          # (bs, K, T, 7) writable copy
    ego_full = np.asarray(scenes.ego_full)   # (bs, T, 4)
    T = ego_full.shape[1]
    ahead = ego_full[:, np.minimum(np.arange(T) + 2, T - 1)]
    nei[:, 0, :, 0] = 1.0
    nei[:, 0, :, 1:5] = ahead
    nei[:, 0, :, 5] = 8.0
    nei[:, 0, :, 6] = 8.0
    scenes_u = scenes._replace(nei_full=jnp.asarray(nei))
    out = sim.run_closed_loop(jax.random.PRNGKey(0), scenes_u, cfg_b, net,
                              params, formulas, coeffs, max_steps=3)
    assert "repairs" in out
    assert float(np.asarray(out["repairs"]).sum()) > 0, \
        "backup repairs must fire on the forced-unsafe fixture"
    # and the clean scenes with backup on report repairs as a metric too
    out2 = sim.run_closed_loop(jax.random.PRNGKey(0), scenes, cfg_b, net,
                               params, formulas, coeffs, max_steps=2)
    assert "repairs" in out2


def test_ref_parity_bundle():
    """Config.ref_parity flips every documented deviation at once
    (VERDICT r3 #4)."""
    cfg = sim_cfg(guidance=True).with_(
        forward_shield=True, env_nonnegative_speed=True,
        sample_noise_scale=1.3, backup_niters=100)
    p = cfg.ref_parity(open_loop=False)
    assert p.guidance_positive_offset_quirk
    assert not p.forward_shield
    assert not p.env_nonnegative_speed
    assert p.backup_niters == 500
    assert p.sample_noise_scale == 1.0
    # README closed-loop guidance schedule (README.md:175)
    assert (p.guidance_before, p.guidance_niters, p.guidance_lr,
            p.multi_cands) == (10, 1, 0.04, 5)
    # open-loop flavor (README.md:115)
    po = cfg.ref_parity(open_loop=True)
    assert (po.guidance_before, po.guidance_niters, po.guidance_lr,
            po.multi_cands) == (10, 1, 0.01, 10)
    # no guidance => schedule untouched
    pn = sim_cfg(guidance=False).ref_parity()
    assert pn.guidance_before == sim_cfg().guidance_before
