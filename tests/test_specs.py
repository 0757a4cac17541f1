"""Driving spec layer: calibration self-consistency, dense layout, scoring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pstl_tpu import specs
from pstl_tpu.config import Config
from pstl_tpu.ops import dynamics as dyn


@pytest.fixture(scope="module")
def cfg():
    return Config(diffusion=True, n_randoms=4, n_neighbors=2, nt=20)


def make_batch(cfg, bs=3, seed=0):
    """Synthetic straight-road scene with a GT trajectory driving the lane."""
    rng = np.random.RandomState(seed)
    n_segs = cfg.n_segs
    xs = np.linspace(-5, 60, n_segs)
    lane = np.stack([xs, np.zeros(n_segs), np.zeros(n_segs)], -1)
    batch = {
        "currlane_wpts": np.tile(lane, (bs, 1, 1)).astype(np.float32),
        "leftlane_wpts": np.tile(lane + [0, 3.5, 0], (bs, 1, 1)).astype(np.float32),
        "rightlane_wpts": np.tile(lane + [0, -3.5, 0], (bs, 1, 1)).astype(np.float32),
        "curr_id": np.ones((bs, 1), np.float32),
        "left_id": np.ones((bs, 1), np.float32),
        "right_id": np.zeros((bs, 1), np.float32),
        "gt_high_level": np.zeros((bs, 1), np.float32),
    }
    # GT: drive straight down the current lane at ~5 m/s with tiny noise
    s0 = np.zeros((bs, 4), np.float32)
    s0[:, 3] = 5.0 + rng.rand(bs)
    us = np.zeros((bs, cfg.nt, 2), np.float32)
    us[:, :, 1] = rng.randn(bs, cfg.nt) * 0.1
    traj = np.asarray(dyn.rollout(jnp.asarray(s0), jnp.asarray(us), cfg.dt))
    batch["ego_traj"] = traj[:, :-1].astype(np.float32)
    # one valid neighbor far ahead in the other lane, one invalid
    K, T = cfg.n_neighbors, cfg.nt
    nei = np.zeros((bs, K, T, 7), np.float32)
    nei[:, 0, :, 0] = 1.0
    nei[:, 0, :, 1] = 40.0
    nei[:, 0, :, 2] = 3.5
    nei[:, 0, :, 5:7] = [4.0, 2.0]
    batch["neighbor_trajs_aug"] = nei
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_calibrated_gt_satisfies_own_spec(cfg):
    """The reference's --check_stl_params golden test (nusc_train.py:816-875):
    GT trajectories must satisfy the spec calibrated from themselves."""
    batch = make_batch(cfg)
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
    assert float(acc) == 1.0, f"GT violates its own calibrated spec: {scores}"


def test_calibration_flex_widens(cfg):
    batch = make_batch(cfg)
    gt = batch["ego_traj"][..., :4]
    tight = specs.calibrate_stlp(batch, gt, cfg.with_(flex=False))
    wide = specs.calibrate_stlp(batch, gt, cfg.with_(flex=True))
    assert np.all(np.asarray(wide[:, 0]) <= np.asarray(tight[:, 0]))  # vmin
    assert np.all(np.asarray(wide[:, 1]) >= np.asarray(tight[:, 1]))  # vmax


def test_densify_shapes(cfg):
    bs = 3
    batch = make_batch(cfg, bs=bs)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    dense = specs.densify_batch(batch, stlp, cfg, key=jax.random.PRNGKey(0))
    m = cfg.n_randoms * 3
    assert dense["neighbors_dense"].shape == (bs * m, cfg.n_neighbors, cfg.nt, 7)
    assert dense["currlane_wpts_dense"].shape == (bs * m, cfg.n_segs, 3)
    assert dense["stlp_dense"].shape == (bs * m, 1, 6)
    assert dense["valids_dense"].shape == (bs * cfg.n_randoms, 3)
    assert dense["highlevel_dense"].shape == (bs * m, 1)
    # highlevel tiling is [0, 1, 2] repeating
    np.testing.assert_allclose(np.asarray(dense["highlevel_dense"][:6, 0]),
                               [0, 1, 2, 0, 1, 2])
    # right lane invalid everywhere in this fixture
    np.testing.assert_allclose(np.asarray(dense["valids_dense"][:, 2]), 0.0)


@pytest.mark.slow
def test_dense_stlp_keeps_gt_on_label(cfg):
    """Rows whose maneuver matches the GT label carry the calibrated params."""
    bs = 2
    batch = make_batch(cfg, bs=bs)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg.with_(flex=True))
    dense = specs.get_dense_stlp(jax.random.PRNGKey(1),
                                 batch["gt_high_level"], stlp,
                                 cfg.with_(flex=True))
    dense = np.asarray(dense).reshape(bs, cfg.n_randoms, 3, 6)
    # gt_high_level = 0 (keep) -> maneuver-0 rows == calibrated stlp
    for b in range(bs):
        np.testing.assert_allclose(
            dense[b, :, 0], np.tile(np.asarray(stlp[b]), (cfg.n_randoms, 1)),
            rtol=1e-5)
        # off-label rows differ from calibrated (flex randomization)
        assert not np.allclose(dense[b, :, 1], np.asarray(stlp[b]))


def test_outlier_rows_score_one(cfg):
    batch = make_batch(cfg)
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
    hl = jnp.full((3,), 3.0)     # all outliers
    _, scores, acc = specs.compute_scores(signals, formulas, hl,
                                          jnp.ones((3,)), cfg)
    np.testing.assert_allclose(np.asarray(scores), 1.0)


@pytest.mark.slow
def test_scores_jit_and_grad(cfg):
    """The scoring path must be jittable and differentiable w.r.t. the
    trajectory (this is the guidance gradient path)."""
    batch = make_batch(cfg)
    gt = batch["ego_traj"][..., :4]
    stlp = specs.calibrate_stlp(batch, gt, cfg)
    formulas = specs.build_formulas(cfg)
    hl = batch["gt_high_level"][:, 0]
    mask = jnp.ones((3,))

    @jax.jit
    def loss(traj):
        signals = {
            "ego_traj": traj,
            "neighbors": batch["neighbor_trajs_aug"],
            "currlane_wpts": batch["currlane_wpts"],
            "leftlane_wpts": batch["leftlane_wpts"],
            "rightlane_wpts": batch["rightlane_wpts"],
            "stlp": stlp[:, None, :],
        }
        _, scores, _ = specs.compute_scores(signals, formulas, hl, mask, cfg)
        return jnp.mean(jax.nn.relu(0.01 - scores))

    g = jax.grad(loss)(gt)
    assert np.all(np.isfinite(np.asarray(g)))


def test_mask_mean():
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    m = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    np.testing.assert_allclose(float(specs.mask_mean(x, m)), 1.5, rtol=1e-6)


class TestTiledScorer:
    """TiledScorer must equal ClauseBank + per-row selection exactly."""

    def _setup(self, norm_stl, seed=0, bs=3, M=4):
        cfg = Config(diffusion=True, n_randoms=M, n_neighbors=3, nt=20,
                     flex=True, norm_stl=norm_stl).finalize()
        rng = np.random.RandomState(seed)
        k, T, S = cfg.n_neighbors, cfg.nt, cfg.n_segs
        batch = {
            "neighbor_trajs_aug": jnp.asarray(
                rng.randn(bs, k, T, 7).astype(np.float32) * 5),
            "currlane_wpts": jnp.asarray(
                rng.randn(bs, S, 3).astype(np.float32) * 3),
            "leftlane_wpts": jnp.asarray(
                rng.randn(bs, S, 3).astype(np.float32) * 3),
            "rightlane_wpts": jnp.asarray(
                rng.randn(bs, S, 3).astype(np.float32) * 3),
            "curr_id": jnp.ones((bs, 1)),
            "left_id": jnp.asarray((rng.rand(bs, 1) > .5).astype(np.float32)),
            "right_id": jnp.asarray((rng.rand(bs, 1) > .5).astype(np.float32)),
            "gt_high_level": jnp.asarray(
                rng.randint(0, 3, (bs, 1)).astype(np.float32)),
        }
        batch["neighbor_trajs_aug"] = batch["neighbor_trajs_aug"].at[
            ..., 0].set((rng.rand(bs, k, T) > 0.3).astype(np.float32))
        gt_stlp = jnp.asarray(
            np.stack([rng.uniform(0, 2, bs), rng.uniform(5, 9, bs),
                      rng.uniform(-3, -1, bs), rng.uniform(1, 3, bs),
                      rng.uniform(0.1, 1, bs), rng.uniform(0.2, 0.5, bs)],
                     -1).astype(np.float32))
        dense = specs.densify_batch(batch, gt_stlp, cfg,
                                    key=jax.random.PRNGKey(seed))
        N = bs * M * 3
        trajs = jnp.asarray(rng.randn(N, T, 4).astype(np.float32) * 3)
        return cfg, batch, dense, trajs

    def _reference_scores(self, cfg, dense, trajs):
        sig = specs.dense_signal_input(dense)
        sig["ego_traj"] = trajs
        formulas = specs.build_scorer(cfg)
        _, scores, _ = specs.compute_scores(
            sig, formulas, dense["highlevel_dense"],
            dense["valids_dense"].reshape(-1), cfg)
        return scores

    @pytest.mark.slow
    def test_matches_clausebank(self):
        for norm_stl in (False, True):
            cfg, batch, dense, trajs = self._setup(norm_stl)
            ref = self._reference_scores(cfg, dense, trajs)
            scorer = specs.TiledScorer(batch, dense["stlp_dense"], cfg)
            out = scorer(trajs)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)

    def test_matches_hard(self):
        cfg, batch, dense, trajs = self._setup(False, seed=2)
        sig = specs.dense_signal_input(dense)
        sig["ego_traj"] = trajs
        formulas = specs.build_scorer(cfg)
        _, ref, _ = specs.compute_scores(
            sig, formulas, dense["highlevel_dense"],
            dense["valids_dense"].reshape(-1), cfg, hard=True)
        scorer = specs.TiledScorer(batch, dense["stlp_dense"], cfg)
        out = scorer(trajs, hard=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_candminor_guidance_loss_matches(self):
        """The candidate-minor fused guidance loss equals the fallback
        rollout+TiledScorer hinge loss (values to fp tolerance; grads up
        to segment-argmin ties on a sub-percent of entries)."""
        from pstl_tpu import diffusion
        from pstl_tpu.ops import dynamics as dyn

        for norm_stl in (False, True):
            cfg, batch, dense, _ = self._setup(norm_stl, seed=6)
            bs, M = 3, cfg.n_randoms
            N = bs * M * 3
            rng = np.random.RandomState(7)
            states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
            states = states.at[:, 3].set(jnp.abs(states[:, 3]) * 3)
            valid = dense["valids_dense"].reshape(-1)
            states_flat = jnp.broadcast_to(
                states[:, None, None], (bs, M, 3, 4)).reshape(N, 4)
            mu = jnp.asarray(rng.randn(N, cfg.nt * 2).astype(np.float32))
            score_rows = specs.make_score_rows(batch, dense, cfg)

            def loss_ref(m):
                u = diffusion.denormalize_controls(m, cfg, clip=False)
                trajs = dyn.rollout(states_flat, u, cfg.dt)
                return specs.mask_mean(
                    jax.nn.relu(100.0 - score_rows(trajs[:, :-1])), valid)

            fused = specs.make_guidance_loss(batch, dense, cfg, states,
                                             valid)
            assert fused is not None
            l_ref = float(jax.jit(loss_ref)(mu))
            l_fused = float(jax.jit(lambda m: fused(m, 100.0))(mu))
            np.testing.assert_allclose(l_fused, l_ref, rtol=1e-4)
            g_ref = np.asarray(jax.jit(jax.grad(loss_ref))(mu))
            g_f = np.asarray(jax.jit(jax.grad(
                lambda m: fused(m, 100.0)))(mu))
            scale = np.abs(g_ref).max()
            frac_diff = np.mean(np.abs(g_ref - g_f) > 1e-3 * scale)
            assert frac_diff < 0.05, frac_diff

    def test_cand_minor_roundtrip(self):
        """_from_cand_minor inverts _to_cand_minor (the guidance Adam loop
        runs wholly in cm layout — the round-trip must be exact)."""
        cfg, batch, dense, _ = self._setup(False, seed=3)
        rng = np.random.RandomState(5)
        states = jnp.asarray(rng.randn(3, 4).astype(np.float32))
        valid = dense["valids_dense"].reshape(-1)
        fused = specs.make_guidance_loss(batch, dense, cfg, states, valid)
        mu = jnp.asarray(
            rng.randn(3 * cfg.n_randoms * 3, cfg.nt * 2).astype(np.float32))
        back = fused._from_cand_minor(fused._to_cand_minor(mu))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(mu))

    @pytest.mark.slow
    def test_frozen_selection_guidance(self):
        """cfg.guidance_reuse_selection: selections frozen at the same mu
        give EXACTLY the unfrozen loss and gradient (both paths
        stop-gradient the same argmins); after an Adam-sized perturbation
        the frozen loss stays within the trust-region tolerance; and the
        full _guidance_step with niters=1 is bit-identical frozen vs not
        (the reference's own closed-loop config, README.md:175)."""
        from pstl_tpu import diffusion

        cfg, batch, dense, _ = self._setup(True, seed=9)
        bs, M = 3, cfg.n_randoms
        N = bs * M * 3
        rng = np.random.RandomState(11)
        states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
        states = states.at[:, 3].set(jnp.abs(states[:, 3]) * 3)
        valid = dense["valids_dense"].reshape(-1)
        mu = jnp.asarray(rng.randn(N, cfg.nt * 2).astype(np.float32))
        fused = specs.make_guidance_loss(batch, dense, cfg, states, valid)

        frozen = jax.jit(fused.freeze)(mu)
        l_exact = jax.jit(lambda m: fused(m, 100.0))(mu)
        l_froz = jax.jit(lambda m: fused(m, 100.0, frozen=frozen))(mu)
        np.testing.assert_allclose(float(l_froz), float(l_exact),
                                   rtol=1e-6)
        g_exact = np.asarray(jax.jit(jax.grad(
            lambda m: fused(m, 100.0)))(mu))
        g_froz = np.asarray(jax.jit(jax.grad(
            lambda m: fused(m, 100.0, frozen=frozen)))(mu))
        np.testing.assert_allclose(g_froz, g_exact, rtol=1e-5, atol=1e-6)

        mu2 = mu + 0.01 * jnp.sign(jnp.asarray(
            rng.randn(N, cfg.nt * 2).astype(np.float32)))
        l2_exact = float(jax.jit(lambda m: fused(m, 100.0))(mu2))
        l2_froz = float(jax.jit(
            lambda m: fused(m, 100.0, frozen=frozen))(mu2))
        assert abs(l2_froz - l2_exact) < 0.05 * max(abs(l2_exact), 1.0)

        states_flat = jnp.broadcast_to(
            states[:, None, None], (bs, M, 3, 4)).reshape(N, 4)
        score_rows = specs.make_score_rows(batch, dense, cfg)
        beta = jnp.float32(0.02)
        cfg1 = cfg.with_(guidance_niters=1, guidance_lr=0.04)
        ctx = diffusion.make_guidance_ctx(score_rows, valid, states_flat,
                                          fused)
        out_plain = jax.jit(lambda m: diffusion._guidance_step(
            m, beta, ctx, cfg1, True))(mu)
        out_froz = jax.jit(lambda m: diffusion._guidance_step(
            m, beta, ctx, cfg1.with_(guidance_reuse_selection=True),
            True))(mu)
        np.testing.assert_allclose(np.asarray(out_froz),
                                   np.asarray(out_plain),
                                   rtol=1e-6, atol=1e-7)

    def test_geometry_recentering_invariance(self):
        """The guidance loss depends only on coordinate DIFFERENCES, so
        shifting a scene's lanes + neighbors + ego start by a large map-
        scale offset must not change it.  CandMinorGuidanceLoss recenters
        every scene at its ego start — the property that makes
        cfg.geometry_dtype=bfloat16 usable on NuScenes-scale coords."""
        cfg, batch, dense, _ = self._setup(True, seed=13)
        bs, M = 3, cfg.n_randoms
        N = bs * M * 3
        rng = np.random.RandomState(7)
        states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
        states = states.at[:, 3].set(jnp.abs(states[:, 3]) * 3)
        valid = dense["valids_dense"].reshape(-1)
        mu = jnp.asarray(rng.randn(N, cfg.nt * 2).astype(np.float32))
        fused = specs.make_guidance_loss(batch, dense, cfg, states, valid)
        l0 = float(jax.jit(lambda m: fused(m, 100.0))(mu))

        ox, oy = 1713.0, -2504.0   # NuScenes map-frame magnitudes
        b2 = dict(batch)
        for key in ("currlane_wpts", "leftlane_wpts", "rightlane_wpts"):
            b2[key] = batch[key].at[..., 0].add(ox).at[..., 1].add(oy)
        b2["neighbor_trajs_aug"] = batch["neighbor_trajs_aug"].at[
            ..., 1].add(ox).at[..., 2].add(oy)
        s2 = states.at[:, 0].add(ox).at[:, 1].add(oy)
        fused2 = specs.make_guidance_loss(b2, dense, cfg, s2, valid)
        l1 = float(jax.jit(lambda m: fused2(m, 100.0))(mu))
        np.testing.assert_allclose(l1, l0, rtol=1e-3)

    @pytest.mark.slow
    def test_geometry_dtype_bf16(self):
        """cfg.geometry_dtype=bfloat16 stores the selection fields and
        frozen payloads in bf16 (the guidance loop's HBM traffic); the
        Adam-iteration arithmetic stays fp32, so loss and gradient track
        the fp32 path closely, and the frozen pytree dtypes match
        freeze_zeros (the sel_every scan-carry contract)."""
        cfg, batch, dense, _ = self._setup(True, seed=21)
        bs, M = 3, cfg.n_randoms
        N = bs * M * 3
        rng = np.random.RandomState(5)
        states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
        states = states.at[:, 3].set(jnp.abs(states[:, 3]) * 3)
        valid = dense["valids_dense"].reshape(-1)
        mu = jnp.asarray(rng.randn(N, cfg.nt * 2).astype(np.float32))
        f32 = specs.make_guidance_loss(batch, dense, cfg, states, valid)
        f16 = specs.make_guidance_loss(
            batch, dense, cfg.with_(geometry_dtype="bfloat16"),
            states, valid)

        l32 = float(jax.jit(lambda m: f32(m, 100.0))(mu))
        l16 = float(jax.jit(lambda m: f16(m, 100.0))(mu))
        assert abs(l16 - l32) < 0.05 * max(abs(l32), 1.0), (l16, l32)

        g32 = np.asarray(jax.jit(jax.grad(
            lambda m: f32(m, 100.0)))(mu)).ravel()
        g16 = np.asarray(jax.jit(jax.grad(
            lambda m: f16(m, 100.0)))(mu)).ravel()
        cos = float(g32 @ g16
                    / max(np.linalg.norm(g32) * np.linalg.norm(g16), 1e-12))
        assert cos > 0.95, cos

        frozen = jax.jit(f16.freeze)(mu)
        zeros = f16.freeze_zeros()
        fl, zl = jax.tree_util.tree_leaves(frozen), \
            jax.tree_util.tree_leaves(zeros)
        assert [(a.shape, a.dtype) for a in fl] \
            == [(a.shape, a.dtype) for a in zl]
        assert frozen["lane"]["x2"].dtype == jnp.bfloat16
        l16f = float(jax.jit(
            lambda m: f16(m, 100.0, frozen=frozen))(mu))
        assert abs(l16f - l16) < 0.05 * max(abs(l16), 1.0), (l16f, l16)

    @pytest.mark.slow
    def test_blend_scores_matches_sliced(self):
        """cfg.guidance_blend_scores (the candidate-sharding-friendly
        all-R + is_keep-mask variant) must equal the sliced keep/change
        path column-for-column, values AND gradients."""
        for norm_stl in (False, True):
            cfg, batch, dense, _ = self._setup(norm_stl, seed=21)
            bs, M = 3, cfg.n_randoms
            N = bs * M * 3
            rng = np.random.RandomState(4)
            states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
            states = states.at[:, 3].set(jnp.abs(states[:, 3]) * 3)
            valid = dense["valids_dense"].reshape(-1)
            mu = jnp.asarray(rng.randn(N, cfg.nt * 2).astype(np.float32))
            fs = specs.make_guidance_loss(batch, dense, cfg, states, valid)
            fb = specs.make_guidance_loss(
                batch, dense, cfg.with_(guidance_blend_scores=True),
                states, valid)
            s_s = np.asarray(jax.jit(fs.scores_r)(fs._to_cand_minor(mu)))
            s_b = np.asarray(jax.jit(fb.scores_r)(fb._to_cand_minor(mu)))
            np.testing.assert_allclose(s_b, s_s, rtol=1e-5, atol=1e-5)
            g_s = np.asarray(jax.jit(jax.grad(
                lambda m: fs(m, 100.0)))(mu))
            g_b = np.asarray(jax.jit(jax.grad(
                lambda m: fb(m, 100.0)))(mu))
            np.testing.assert_allclose(g_b, g_s, rtol=1e-4, atol=1e-6)

    def test_clearance_coarse_pair(self):
        """cfg.clearance_coarse_pair: the two-stage frozen-pair selection
        agrees with the exact pair argmin on almost all rows, and the
        frozen-selection loss stays within a few percent (the selection
        only decides WHICH near-minimal disc pair is frozen)."""
        cfg, batch, dense, _ = self._setup(True, seed=33)
        bs, M = 3, cfg.n_randoms
        N = bs * M * 3
        rng = np.random.RandomState(3)
        states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
        states = states.at[:, 3].set(jnp.abs(states[:, 3]) * 3)
        valid = dense["valids_dense"].reshape(-1)
        mu = jnp.asarray(rng.randn(N, cfg.nt * 2).astype(np.float32))
        fe = specs.make_guidance_loss(batch, dense, cfg, states, valid)
        fc = specs.make_guidance_loss(
            batch, dense, cfg.with_(clearance_coarse_pair=True),
            states, valid)
        froz_e = jax.jit(fe.freeze)(mu)
        froz_c = jax.jit(fc.freeze)(mu)
        # frozen neighbor-disc coords agree on the vast majority of rows
        same = float(jnp.mean((jnp.abs(froz_e["clear"]["nx"]
                                       - froz_c["clear"]["nx"]) < 1e-5)))
        assert same > 0.85, same
        l_e = float(jax.jit(lambda m: fe(m, 100.0, frozen=froz_e))(mu))
        l_c = float(jax.jit(lambda m: fc(m, 100.0, frozen=froz_c))(mu))
        assert abs(l_c - l_e) < 0.05 * max(abs(l_e), 1.0), (l_c, l_e)

    @pytest.mark.slow
    def test_gradient_matches(self):
        cfg, batch, dense, trajs = self._setup(True, seed=4)
        scorer = specs.TiledScorer(batch, dense["stlp_dense"], cfg)
        valid = dense["valids_dense"].reshape(-1)

        def loss_new(tr):
            return specs.mask_mean(jax.nn.relu(1.0 - scorer(tr)), valid)

        def loss_ref(tr):
            return specs.mask_mean(
                jax.nn.relu(1.0 - self._reference_scores(cfg, dense, tr)),
                valid)

        g_new = jax.grad(loss_new)(trajs)
        g_ref = jax.grad(loss_ref)(trajs)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=5e-3, atol=1e-5)

    @pytest.mark.slow
    def test_vmap_over_candidates(self):
        cfg, batch, dense, trajs = self._setup(False, seed=6)
        scorer = specs.TiledScorer(batch, dense["stlp_dense"], cfg)
        cands = jnp.stack([trajs, trajs * 1.01, trajs * 0.99])
        out = jax.vmap(scorer)(cands)
        ref = jnp.stack([scorer(c) for c in cands])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
