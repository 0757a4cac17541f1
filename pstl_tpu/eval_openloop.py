"""Open-loop evaluation harness (Table-I metrics).

Parity target: ``run_sampling_test`` (nusc_train.py:890-1183).  Per batch:
1. score the trajopt-augmented control set (the oracle reference row),
2. sample ``sampling_size`` candidates per (scene, maneuver) from the model
   (full DDPM reverse pass + optional guidance), apply multi-cands selection,
   RefineNet, and ``n_rolls`` re-rectification,
3. report STL accuracy, best-of-M scene accuracy, min-ADE/FDE, masked std,
   summed hull volume, score/control entropies, occupancy area, and the
   wall-clock of the jitted sampling region.

All metric math runs on device (pstl_tpu.metrics); only meter accumulation
is host-side.

Table-I column mapping: "Success" = scene_acc (best-of-M per scene &
maneuver), "Compliance" = acc (per-candidate satisfaction), "Valid area" =
the occupancy-area measure over satisfying candidates, "Entropy" = ent_s.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pstl_tpu import diffusion, metrics, specs
from pstl_tpu.config import Config
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net
from pstl_tpu.models import net as models
from pstl_tpu.ops import dynamics as dyn
from pstl_tpu.utils.meters import MeterDict

Array = jax.Array


def _prep_batch(batch, cfg: Config):
    from pstl_tpu.train import attach_neighbors
    return attach_neighbors(batch, cfg)


def _trajopt_row(params, key, batch, cfg: Config, net: Net, formulas,
                 coeffs):
    """Jittable: the trajopt oracle row of Table I (nusc_train.py:926-944).

    Lives OUTSIDE the timed region, like the reference (the timer starts at
    nusc_train.py:957 after this row is done)."""
    batch = _prep_batch(batch, cfg)
    gt_trajs = batch["ego_traj"][..., :4]
    states = gt_trajs[:, 0, :4]
    bs = states.shape[0]
    k_dense, _, _ = jax.random.split(key, 3)   # same stream as the timed fn
    gt_stlp = specs.calibrate_stlp(batch, gt_trajs, cfg)
    n_tj = bs * cfg.n_randoms * 3
    dense_tj = specs.densify_batch(batch, gt_stlp, cfg, key=k_dense)
    sig_tj = specs.dense_signal_input(dense_tj, cfg=cfg)
    valid_tj = dense_tj["valids_dense"].reshape(-1)
    states_tj = jnp.broadcast_to(states[:, None, None],
                                 (bs, cfg.n_randoms, 3, 4)).reshape(n_tj, 4)
    tj_controls = batch["params"].reshape(n_tj, cfg.nt, 2)
    tj_trajs = dyn.rollout(states_tj, tj_controls, cfg.dt)
    stj = dict(sig_tj)
    stj["ego_traj"] = tj_trajs[:, :-1]
    _, tj_scores, tj_acc, tj_scene_acc = specs.compute_scores(
        stj, formulas, dense_tj["highlevel_dense"], valid_tj, cfg, scene=True)

    tj = {"acc": tj_acc, "scene_acc": tj_scene_acc, "scores": tj_scores}
    tj_div = metrics.measure_diversity(
        tj_trajs[:, :-1, :2].reshape(bs, cfg.n_randoms, 3, cfg.nt * 2),
        tj_scores.reshape(bs, cfg.n_randoms, 3),
        valid_tj.reshape(bs, cfg.n_randoms, 3), cfg.nt)
    tj["std"], tj["vol"] = tj_div["ma_std"], tj_div["ma_vol"]
    tj["ade"], tj["fde"] = metrics.ade_fde(
        gt_trajs, tj_trajs[:, :-1].reshape(bs, cfg.n_randoms, 3, cfg.nt, 4),
        valid_tj.reshape(bs, -1))
    if cfg.extra_diversity:
        tj_extra = metrics.measure_extra_diversity(
            tj_trajs[:, :-1].reshape(bs, cfg.n_randoms, 3, cfg.nt * 4),
            tj_scores.reshape(bs, cfg.n_randoms, 3),
            valid_tj.reshape(bs, cfg.n_randoms, 3), cfg.nt,
            tj_controls.reshape(bs, cfg.n_randoms, 3, cfg.nt * 2),
            -cfg.mul_w_max, cfg.mul_w_max, -cfg.mul_a_max, cfg.mul_a_max)
        tj.update({f"ent_{k}": v for k, v in tj_extra.items()
                   if k.startswith("ent")})
        tj["area"] = tj_extra["area"]
    return tj


def _sample_and_score(params, key, batch, cfg: Config, net: Net, formulas,
                      coeffs):
    """Jittable TIMED region (nusc_train.py:957-1105): dense sampling batch,
    generative sampling (+ guidance), multi-cands, RefineNet + n_rolls,
    optional refinement, final rollout and STL scoring.  Diversity/ADE
    metrics live in :func:`_nn_metrics` outside the timer, mirroring
    tttt1/tttt2 in the reference."""
    S = cfg.sampling_size
    batch = _prep_batch(batch, cfg)
    gt_trajs = batch["ego_traj"][..., :4]
    states = gt_trajs[:, 0, :4]
    bs = states.shape[0]
    _, k_dense2, k_sample = jax.random.split(key, 3)
    gt_stlp = specs.calibrate_stlp(batch, gt_trajs, cfg)

    # ---- model sampling row (nusc_train.py:958-1101) -------------------
    N = bs * S * 3
    dense = specs.densify_batch(batch, gt_stlp, cfg, key=k_dense2,
                                n_randoms=S)
    valid = dense["valids_dense"].reshape(-1)
    highlevel = dense["highlevel_dense"]
    states_flat = jnp.broadcast_to(states[:, None, None],
                                   (bs, S, 3, 4)).reshape(N, 4)

    score_rows = specs.make_score_rows(batch, dense, cfg, formulas,
                                       n_randoms=S)

    def score_controls(u):
        trajs = dyn.rollout(states_flat, u, cfg.dt)
        s = score_rows(trajs[:, :-1])
        acc = specs.mask_mean((s > 0).astype(s.dtype), valid)
        sc = s.reshape(-1, S, 3)
        mc = valid.reshape(-1, S, 3)
        scene_acc = specs.mask_mean((jnp.max(sc, axis=1) > 0).astype(s.dtype),
                                    mc[:, 0, :])
        return (None, s, acc, scene_acc), trajs

    if cfg.diffusion:
        ext0 = {"timestep": jnp.ones((N, 1)), "highlevel": highlevel,
                "noise": jnp.zeros((N, cfg.nt * 2))}
        _, feature = net.apply(params, dense, ext0, get_feature=True,
                               n_randoms=S)

        def apply_fn(e):
            return net.apply(params, dense, e, prev_feature=feature,
                             n_randoms=S)

        fused = (specs.make_guidance_loss(batch, dense, cfg, states,
                                          valid, n_randoms=S)
                 if cfg.guidance else None)
        guidance_ctx = (diffusion.make_guidance_ctx(
            score_rows, valid, states_flat, fused_loss=fused)
            if cfg.guidance else None)
        cm_fn = (models.make_cm_eps_fn(params, dense, highlevel, feature,
                                       cfg, n_randoms=S)
                 if cfg.cm_sampler and fused is not None else None)
        nn_controls, all_steps = diffusion.sample(
            k_sample, apply_fn, dense, highlevel, feature, cfg, coeffs, N,
            guidance_ctx=guidance_ctx, cm_fn=cm_fn)
        if cfg.rect_head and not cfg.not_use_rect:
            if cfg.multi_cands is not None:
                nn_controls, prev_scores = diffusion.select_multi_cands(
                    all_steps, cfg.multi_cands, states_flat, score_rows, cfg)
            else:
                (_, prev_scores, _, _), _ = score_controls(nn_controls)
            if not cfg.no_refinenet:
                nn_controls = net.apply(params, feature, highlevel,
                                        dense["stlp_dense"][:, 0],
                                        nn_controls, prev_scores,
                                        method=Net.rect)
            for _ in range(cfg.n_rolls or 0):
                (_, s_re, _, _), _ = score_controls(nn_controls)
                nn_controls = net.apply(params, feature, highlevel,
                                        dense["stlp_dense"][:, 0],
                                        nn_controls, s_re, method=Net.rect)
            if cfg.refinement:
                from pstl_tpu import refine
                nn_controls = refine.convex_refinement(
                    nn_controls, all_steps, states_flat, score_rows, valid,
                    cfg)
    elif cfg.vae:
        ext = {"highlevel": highlevel}
        z = jax.random.normal(k_sample, (N, cfg.vae_dim))
        nn_controls, _ = net.apply(params, dense, ext, n_randoms=S, sample=z)
    else:   # bc
        ext = {"highlevel": highlevel}
        nn_controls = net.apply(params, dense, ext, n_randoms=S)

    (_, scores, acc, scene_acc), nn_trajs = score_controls(nn_controls)
    nn = {"acc": acc, "scene_acc": scene_acc, "scores": scores}
    return nn, nn_controls, nn_trajs, valid


def _nn_metrics(nn, nn_controls, nn_trajs, valid, batch, cfg: Config):
    """Jittable UNTIMED metric tail (nusc_train.py:1107-1131): diversity,
    ADE/FDE, entropy/area, label breakdown."""
    S = cfg.sampling_size
    batch = _prep_batch(batch, cfg)
    gt_trajs = batch["ego_traj"][..., :4]
    bs = gt_trajs.shape[0]
    scores = nn["scores"]
    nn = dict(nn)
    div = metrics.measure_diversity(
        nn_trajs[:, :-1, :2].reshape(bs, S, 3, cfg.nt * 2),
        scores.reshape(bs, S, 3), valid.reshape(bs, S, 3), cfg.nt)
    nn["std"], nn["vol"] = div["ma_std"], div["ma_vol"]
    nn["ade"], nn["fde"] = metrics.ade_fde(
        gt_trajs, nn_trajs[:, :-1].reshape(bs, S, 3, cfg.nt, 4),
        valid.reshape(bs, -1))
    if cfg.extra_diversity:
        extra = metrics.measure_extra_diversity(
            nn_trajs[:, :-1].reshape(bs, S, 3, cfg.nt * 4),
            scores.reshape(bs, S, 3), valid.reshape(bs, S, 3), cfg.nt,
            nn_controls.reshape(bs, S, 3, cfg.nt * 2),
            -cfg.mul_w_max, cfg.mul_w_max, -cfg.mul_a_max, cfg.mul_a_max)
        nn.update({f"ent_{k}": v for k, v in extra.items()
                   if k.startswith("ent")})
        nn["area"] = extra["area"]
    nn.update(metrics.label_score_breakdown(
        scores.reshape(bs, S, 3), batch["gt_high_level"][:, 0],
        valid.reshape(bs, S, 3)))
    return nn


def run(cfg: Config, ds: SceneDataset, params, net: Optional[Net] = None,
        n_trials: Optional[int] = None, log=print,
        viz_dir: Optional[str] = None) -> Dict[str, float]:
    """Open-loop evaluation over the val split; returns averaged metrics."""
    # the reference's --run_sampling_test coupling (nusc_train.py:1789-1791)
    # forces extra_diversity on in eval mode; Net arch is unaffected
    cfg = cfg.with_(run_sampling_test=True).finalize()
    if net is None:
        net = Net(cfg)
    formulas = specs.build_scorer(cfg)
    coeffs = diffusion.get_coeffs(cfg)
    ds.ensure_random_params(cfg.seed)
    md = MeterDict()
    key = jax.random.PRNGKey(cfg.seed + 123)
    n_trials = n_trials if n_trials is not None else cfg.n_trials

    fn_tj = jax.jit(lambda p, k, b: _trajopt_row(p, k, b, cfg, net,
                                                 formulas, coeffs))
    fn_sample = jax.jit(lambda p, k, b: _sample_and_score(p, k, b, cfg, net,
                                                          formulas, coeffs))
    fn_metrics = jax.jit(lambda o, u, tr, v, b: _nn_metrics(o, u, tr, v, b,
                                                            cfg))
    warmed = False
    for bi, batch in enumerate(batch_iterator(ds, "val", cfg.batch_size,
                                              shuffle=False,
                                              drop_last=False)):
        if bi > n_trials:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if not k.startswith(("scene_", "traj_i", "ti"))}
        key, k = jax.random.split(key)
        tj = fn_tj(params, k, batch)
        if not warmed:   # compile outside the timer (reference is steady-
            warmed = True  # state torch; first-call XLA compile isn't Time)
            jax.block_until_ready(fn_sample(params, k, batch))
        # ---- TIMED sampling region (nusc_train.py:957-1105) -----------
        t0 = time.time()
        nn, nn_controls, nn_trajs, valid = jax.block_until_ready(
            fn_sample(params, k, batch))
        dt = time.time() - t0
        nn = fn_metrics(nn, nn_controls, nn_trajs, valid, batch)
        if viz_dir and bi == 0:
            # paper figures for the first batch (plot_paper_scene,
            # nusc_viz.py:111-202 / nusc_train.py:1145-1180)
            from pstl_tpu import viz
            import numpy as np
            import os
            S = cfg.sampling_size
            bs_v = batch["ego_traj"].shape[0]
            tr = np.asarray(nn_trajs[:, :-1]).reshape(bs_v, S, 3, cfg.nt, 4)
            sc = np.asarray(nn["scores"]).reshape(bs_v, S, 3)
            bnp = {k: np.asarray(v) for k, v in batch.items()}
            # inject per-sample drivable rasters from the per-SCENE store
            # (batches carry only per-sample columns): the map-patch
            # backdrop of the reference figures (nusc_viz.py:204-339)
            sd = getattr(ds, "scene_data", {})
            if "scene_drivable" in sd and "traj_i" in bnp:
                ti = bnp["traj_i"].astype(int).reshape(-1)
                for k2 in ("scene_drivable", "scene_drivable_origin",
                           "scene_drivable_res"):
                    bnp[k2] = np.asarray(sd[k2])[ti]
            for i in range(min(bs_v, 6)):
                viz.plot_paper_scene(os.path.join(
                    viz_dir, f"paper_scene{i:02d}.png"), bnp, i,
                    nn_trajs=tr[i], nn_scores=sc[i])
        for name, d in (("tj", tj), ("nn", nn)):
            for met in ("acc", "scene_acc", "ade", "fde", "std", "vol",
                        "ent_ent_s", "ent_ent_wa", "area"):
                if met in d:
                    md.update(f"{name}_{met}", float(d[met]))
        md.update("time", dt)
        log(f"[{bi:03d}] tj_acc:{md('tj_acc'):.3f} acc:{md('nn_acc'):.3f} "
            f"scene_acc:{md('nn_scene_acc'):.3f} std:{md('nn_std'):.3f} "
            f"vol:{md('nn_vol'):.3f} area:{md('nn_area'):.3f} "
            f"T:{md('time'):.3f}s")
    return {k: md.avg(k) for k in md.sum}
