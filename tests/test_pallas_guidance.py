"""Interpret-mode equality: the Pallas guidance mega-kernel vs the XLA
frozen-path Adam loop (diffusion._guidance_step fused branch).

Mosaic cannot compile in this container (docs/PERF.md "Pallas status"), so
these tests pin the kernel's semantics through the Pallas interpreter —
the same kernel code compiles on a toolchain with working Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pstl_tpu import diffusion, specs
from pstl_tpu.config import Config
from pstl_tpu.ops import pallas_guidance


def _setup(norm_stl=False, quirk=False, niters=3, seed=0, bs=2, M=4,
           inline=False, clip_dist=False, coarse=False, nt=20,
           n_neighbors=3, n_segs=15):
    cfg = Config(diffusion=True, n_randoms=M, n_neighbors=n_neighbors, nt=nt,
                 n_segs=n_segs,
                 flex=True, norm_stl=norm_stl, guidance=True,
                 guidance_niters=niters, guidance_reuse_selection=True,
                 inline=inline, clip_dist=clip_dist,
                 clearance_coarse_pair=coarse,
                 guidance_positive_offset_quirk=quirk).finalize()
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
    states = jnp.asarray(rng.randn(bs, 4).astype(np.float32))
    states = states.at[:, 3].set(jnp.abs(states[:, 3]) * 3)
    valid = dense["valids_dense"].reshape(-1)
    fused = specs.make_guidance_loss(batch, dense, cfg, states, valid)
    assert fused is not None
    N = bs * M * 3
    mu = jnp.asarray(rng.randn(N, cfg.nt * 2).astype(np.float32) * 0.5)
    return cfg, fused, mu


def _run_both(cfg, fused, mu, thres=100.0, beta=0.02):
    """XLA frozen-path Adam loop vs the Pallas kernel on the same frozen
    selections; returns (xla (N, nt*2), pallas (N, nt*2))."""
    mu_cm = fused._to_cand_minor(mu)
    frozen = fused.freeze_cm(mu_cm)
    beta_t = jnp.asarray(beta, jnp.float32)

    ctx = diffusion.make_guidance_ctx(None, fused.valid_r, None, fused)
    xla = diffusion._guidance_step(mu, beta_t, ctx, cfg, maximize=True,
                                   frozen=frozen)
    pal_cm = pallas_guidance.guidance_adam_cm(
        fused, frozen, mu_cm, beta_t, thres, cfg, interpret=True)
    pal = fused._from_cand_minor(pal_cm)
    return np.asarray(xla), np.asarray(pal)


@pytest.mark.parametrize("norm_stl", [False, True])
@pytest.mark.slow
def test_kernel_matches_xla(norm_stl):
    cfg, fused, mu = _setup(norm_stl=norm_stl, seed=1)
    xla, pal = _run_both(cfg, fused, mu)
    np.testing.assert_allclose(pal, xla, rtol=2e-4, atol=2e-5)


def test_kernel_matches_xla_quirk():
    cfg, fused, mu = _setup(quirk=True, seed=2)
    xla, pal = _run_both(cfg, fused, mu)
    np.testing.assert_allclose(pal, xla, rtol=2e-4, atol=2e-5)


def test_kernel_matches_xla_inline_clip():
    """The lane-endpoint (inline) and distance-clip branches — the real
    divergence surface vs specs._lane_terms."""
    cfg, fused, mu = _setup(inline=True, clip_dist=True, seed=7)
    xla, pal = _run_both(cfg, fused, mu)
    np.testing.assert_allclose(pal, xla, rtol=2e-4, atol=2e-5)


def test_kernel_matches_xla_one_iter():
    """niters=1 (the reference's own closed-loop schedule)."""
    cfg, fused, mu = _setup(niters=1, seed=3)
    xla, pal = _run_both(cfg, fused, mu)
    np.testing.assert_allclose(pal, xla, rtol=2e-4, atol=2e-5)


def test_flag_path_matches_default():
    """cfg.guidance_pallas=True (+ pallas_interpret) routes
    diffusion._guidance_step through the kernel and must reproduce the
    default XLA loop bit-for-tolerance."""
    cfg, fused, mu = _setup(seed=5)
    beta_t = jnp.asarray(0.02, jnp.float32)
    ctx = diffusion.make_guidance_ctx(None, fused.valid_r, None, fused)
    base = diffusion._guidance_step(mu, beta_t, ctx, cfg, maximize=True)
    cfg_p = cfg.with_(guidance_pallas=True, pallas_interpret=True)
    pal = diffusion._guidance_step(mu, beta_t, ctx, cfg_p, maximize=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(base),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fuse_freeze", [False, True])
@pytest.mark.slow
def test_fold_variants_match(fuse_freeze):
    """Scene-folded dispatch (default), the legacy per-scene grid, and a
    column-chunked fold all compute the identical guided mu — the fold
    only re-lays out columns; gradients decouple per column."""
    cfg, fused, mu = _setup(seed=7)
    mu_cm = fused._to_cand_minor(mu)
    frozen = None if fuse_freeze else fused.freeze_cm(mu_cm)
    beta_t = jnp.asarray(0.02, jnp.float32)
    run = lambda c: np.asarray(pallas_guidance.guidance_adam_cm(
        fused, frozen, mu_cm, beta_t, 100.0, c, interpret=True,
        fuse_freeze=fuse_freeze))
    folded = run(cfg)
    grid = run(cfg.with_(guidance_pallas_fold=False))
    # R_fold = bs*M*3 = 24; cols=12 -> 2 grid programs (interpret mode
    # skips the 128-divisibility rule, which is Mosaic-only)
    chunked = run(cfg.with_(guidance_pallas_cols=12))
    np.testing.assert_allclose(folded, grid, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(chunked, grid, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("norm_stl", [False, True])
@pytest.mark.slow
def test_fused_freeze_matches_xla(norm_stl):
    """guidance_pallas_fuse_freeze: the in-kernel where-chain freeze must
    reproduce the XLA freeze_cm + Adam loop exactly (selections at the
    posterior mean, earliest-index tie semantics)."""
    cfg, fused, mu = _setup(norm_stl=norm_stl, seed=11)
    mu_cm = fused._to_cand_minor(mu)
    frozen = fused.freeze_cm(mu_cm)
    beta_t = jnp.asarray(0.02, jnp.float32)
    ctx = diffusion.make_guidance_ctx(None, fused.valid_r, None, fused)
    xla = diffusion._guidance_step(mu, beta_t, ctx, cfg, maximize=True,
                                   frozen=frozen)
    pal_cm = pallas_guidance.guidance_adam_cm(
        fused, None, mu_cm, beta_t, 100.0, cfg, interpret=True,
        fuse_freeze=True)
    pal = fused._from_cand_minor(pal_cm)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(xla),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_fused_freeze_coarse_pair_matches_xla():
    """cfg.clearance_coarse_pair with fuse_freeze: the in-kernel two-stage
    (ego-disc-to-centroid, then neighbor-disc) selection must reproduce
    the XLA specs._clear_select coarse branch exactly — before this test
    the kernel silently ignored the flag and used the exact nLe*nLn pair
    argmin."""
    cfg, fused, mu = _setup(seed=13, coarse=True)
    assert cfg.clearance_coarse_pair
    mu_cm = fused._to_cand_minor(mu)
    frozen = fused.freeze_cm(mu_cm)
    beta_t = jnp.asarray(0.02, jnp.float32)
    ctx = diffusion.make_guidance_ctx(None, fused.valid_r, None, fused)
    xla = diffusion._guidance_step(mu, beta_t, ctx, cfg, maximize=True,
                                   frozen=frozen)
    pal_cm = pallas_guidance.guidance_adam_cm(
        fused, None, mu_cm, beta_t, 100.0, cfg, interpret=True,
        fuse_freeze=True)
    pal = fused._from_cand_minor(pal_cm)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(xla),
                               rtol=2e-4, atol=2e-5)
    # and the coarse selection must actually differ from the exact one on
    # at least some rows for this geometry (otherwise the test is vacuous)
    cfg_x, fused_x, mu_x = _setup(seed=13, coarse=False)
    pal_x = fused_x._from_cand_minor(pallas_guidance.guidance_adam_cm(
        fused_x, None, fused_x._to_cand_minor(mu_x), beta_t, 100.0, cfg_x,
        interpret=True, fuse_freeze=True))
    assert not np.allclose(np.asarray(pal), np.asarray(pal_x))


def test_fused_freeze_coarse_pair_matches_xla_fast():
    """Default-suite (non-slow) coverage of the kernel's coarse-pair
    branch: the full XLA-oracle variant above is slow-marked, and the
    round-4 coarse-branch divergence went unnoticed precisely because the
    default tier never exercised it.  Cheap oracle: the kernel run on
    selections FROZEN BY XLA (specs._clear_select coarse branch, via
    fused.freeze_cm) must equal the kernel computing the same selections
    IN-VMEM (fuse_freeze) — the exact divergence the round-4 fix closed.
    Reduced budget: one scene, M=2, niters=1, nt=8, 2 neighbors, 5 segs."""
    cfg, fused, mu = _setup(seed=13, coarse=True, niters=1, bs=1, M=2,
                            nt=8, n_neighbors=2, n_segs=5)
    assert cfg.clearance_coarse_pair
    mu_cm = fused._to_cand_minor(mu)
    frozen = fused.freeze_cm(mu_cm)   # XLA coarse-pair selection
    beta_t = jnp.asarray(0.02, jnp.float32)
    ref_cm = pallas_guidance.guidance_adam_cm(
        fused, frozen, mu_cm, beta_t, 100.0, cfg, interpret=True)
    pal_cm = pallas_guidance.guidance_adam_cm(
        fused, None, mu_cm, beta_t, 100.0, cfg, interpret=True,
        fuse_freeze=True)            # in-kernel coarse-pair selection
    np.testing.assert_allclose(np.asarray(pal_cm), np.asarray(ref_cm),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_bf16_cumsum_close_to_fp32():
    """cfg.guidance_pallas_bf16_cumsum (bf16-operand MXU cumsums in the
    in-kernel rollout) is an opt-in approximation: the guided update must
    stay within the trust-region clip of the fp32 path (|delta| <= beta
    each side, so 2*beta worst case) and must actually change the path."""
    cfg, fused, mu = _setup(seed=4, niters=1, bs=1, M=2)
    mu_cm = fused._to_cand_minor(mu)
    frozen = fused.freeze_cm(mu_cm)
    beta = 0.02
    beta_t = jnp.asarray(beta, jnp.float32)
    base = pallas_guidance.guidance_adam_cm(
        fused, frozen, mu_cm, beta_t, 100.0, cfg, interpret=True)
    cfg_b = cfg.with_(guidance_pallas_bf16_cumsum=True)
    out = pallas_guidance.guidance_adam_cm(
        fused, frozen, mu_cm, beta_t, 100.0, cfg_b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=2 * beta + 1e-4)
    assert not np.allclose(np.asarray(out), np.asarray(base)), \
        "bf16 path must actually engage (identical output = dead flag)"


@pytest.mark.parametrize("norm_stl", [False, True])
@pytest.mark.slow
def test_fold2_matches_grid(norm_stl):
    """_kernel_fused_f2 (column-chunk grid + in-kernel MXU scene
    broadcast) must reproduce the per-scene-grid fuse_freeze kernel: the
    selector matmul is an exact broadcast (one-hot fp32 rows), is_keep
    comes from the same col%R<M rule, and the freeze/Adam math is shared
    code."""
    cfg, fused, mu = _setup(norm_stl=norm_stl, seed=13)
    mu_cm = fused._to_cand_minor(mu)
    beta_t = jnp.asarray(0.02, jnp.float32)
    run = lambda c: np.asarray(pallas_guidance.guidance_adam_cm(
        fused, None, mu_cm, beta_t, 100.0, c, interpret=True,
        fuse_freeze=True))
    grid = run(cfg.with_(guidance_pallas_fold=False))
    # bs=2, M=4 -> Rf = 24; cols=12 -> 2 chunks (the chunk boundary cuts
    # THROUGH scene 0's columns — the iota selector must still map them)
    if hasattr(fused, "_pallas_inv"):
        del fused._pallas_inv
    fold2 = run(cfg.with_(guidance_pallas_fold2=True,
                          guidance_pallas_cols=12).finalize())
    if hasattr(fused, "_pallas_inv"):
        del fused._pallas_inv
    fold2_one = run(cfg.with_(guidance_pallas_fold2=True).finalize())
    np.testing.assert_allclose(fold2, grid, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fold2_one, grid, rtol=1e-5, atol=1e-6)


def test_fold2_config_coupling():
    c = Config(diffusion=True, guidance=True,
               guidance_pallas_fold2=True).finalize()
    assert c.guidance_pallas_fuse_freeze and c.guidance_pallas


@pytest.mark.parametrize("pack", [2, 4])
@pytest.mark.slow
def test_pack_matches_grid(pack):
    """guidance_pallas_pack: G scenes side-by-side in the lane axis must
    reproduce the per-scene fuse_freeze grid exactly — packing is a pure
    column re-layout (per-scene constants pre-broadcast to their own lane
    columns on the host; the loss sum decouples per column)."""
    cfg, fused, mu = _setup(seed=17, bs=4)
    mu_cm = fused._to_cand_minor(mu)
    beta_t = jnp.asarray(0.02, jnp.float32)
    run = lambda c: np.asarray(pallas_guidance.guidance_adam_cm(
        fused, None, mu_cm, beta_t, 100.0, c, interpret=True,
        fuse_freeze=True))
    grid = run(cfg)
    if hasattr(fused, "_pallas_inv"):
        del fused._pallas_inv
    packed = run(cfg.with_(guidance_pallas_pack=pack).finalize())
    np.testing.assert_allclose(packed, grid, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_pack_fallback_and_coupling():
    """pack falls back to 1 when bs % G != 0 (bs=2, G=4) and finalize
    rejects pack combined with the folded variants."""
    cfg, fused, mu = _setup(seed=18)                 # bs=2
    mu_cm = fused._to_cand_minor(mu)
    beta_t = jnp.asarray(0.02, jnp.float32)
    run = lambda c: np.asarray(pallas_guidance.guidance_adam_cm(
        fused, None, mu_cm, beta_t, 100.0, c, interpret=True,
        fuse_freeze=True))
    grid = run(cfg)
    if hasattr(fused, "_pallas_inv"):
        del fused._pallas_inv
    fell_back = run(cfg.with_(guidance_pallas_pack=4).finalize())
    np.testing.assert_allclose(fell_back, grid, rtol=1e-6, atol=1e-7)
    c = Config(diffusion=True, guidance=True,
               guidance_pallas_pack=2).finalize()
    assert c.guidance_pallas_fuse_freeze and c.guidance_pallas
    with pytest.raises(ValueError):
        Config(diffusion=True, guidance=True, guidance_pallas_pack=2,
               guidance_pallas_fold2=True).finalize()


@pytest.mark.slow
def test_fused_freeze_flag_path():
    """cfg.guidance_pallas_fuse_freeze routes the sampler's guidance step
    through the freeze+Adam kernel and matches the default path."""
    cfg, fused, mu = _setup(seed=12)
    beta_t = jnp.asarray(0.02, jnp.float32)
    ctx = diffusion.make_guidance_ctx(None, fused.valid_r, None, fused)
    base = diffusion._guidance_step(mu, beta_t, ctx, cfg, maximize=True)
    cfg_p = cfg.with_(guidance_pallas=True,
                      guidance_pallas_fuse_freeze=True,
                      pallas_interpret=True)
    pal = diffusion._guidance_step(mu, beta_t, ctx, cfg_p, maximize=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(base),
                               rtol=2e-4, atol=2e-5)


def test_config_couplings():
    """finalize() couples guidance_pallas to its prerequisites and rejects
    the fp32-only kernel under bf16 robustness."""
    c = Config(diffusion=True, guidance=True, guidance_pallas=True,
               guidance_reuse_selection=False).finalize()
    assert c.guidance_reuse_selection and c.guidance_fused_loss
    with pytest.raises(ValueError):
        Config(diffusion=True, guidance_pallas=True,
               robustness_dtype="bfloat16").finalize()


@pytest.mark.slow
def test_kernel_actually_guides():
    """The kernel's output must differ from its input (non-trivial update)
    and stay within the beta trust region of it."""
    cfg, fused, mu = _setup(seed=4)
    _, pal = _run_both(cfg, fused, mu, beta=0.05)
    d = np.abs(pal - np.asarray(mu))
    assert d.max() > 1e-5
    assert d.max() <= 0.05 + 1e-6
