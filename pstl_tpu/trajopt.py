"""Gradient trajectory-optimization data augmentation.

Parity target: the ``--trajopt_only`` pipeline — Adam directly on raw control
tensors, 64 seeds x 3 maneuvers per scene, loss =
mask_mean(relu(0.01 - robustness)) + control-bound penalty
(``compute_trajopt_loss_lite`` nusc_train.py:287-316 and the epoch-loop
branch nusc_train.py:1303-1328).

TPU-first: the whole 2000-iteration optimization is ONE jitted
``lax.scan`` of Adam steps — rollout, STL robustness, backward, and update
all fused into a single device program; scenes/seeds/maneuvers are one big
leading batch axis that shards over the data mesh.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from pstl_tpu import specs
from pstl_tpu.config import Config
from pstl_tpu.ops import dynamics as dyn

Array = jax.Array


def trajopt_loss(params: Array, states_flat: Array,
                 signal_base: Dict[str, Array], highlevel: Array,
                 formulas, cfg: Config, tau: Array | None = None,
                 stlp_draws: Array | None = None):
    """params: (n, nt, 2) flat dense controls; returns (loss, aux).

    ``stlp_draws`` (K, n, 1, 6): optimize a WEIGHTED expected hinge over K
    independent flex-stlp draws instead of the single draw in
    ``signal_base``: half the weight on draw 0 (the canonical draw whose
    stlp/score are persisted and condition training), half spread over the
    robustness draws.  A pure average dilutes per-draw satisfaction (the
    measured best-of-4 acc fell to 0.61 vs 0.82 single-draw); the weighted
    form keeps the canonical draw satisfied while still pressuring
    robustness to redraws (round-2 fresh-draw satisfaction was 0.601).
    The geometry signals (lane distances, clearance) are stlp-independent
    and computed once; only the clause evaluation repeats per draw.
    """
    valid = signal_base["dense_valids"].reshape(-1)
    trajs = dyn.rollout(states_flat, params, cfg.dt)
    sig = dict(signal_base)
    sig["ego_traj"] = trajs[:, :-1]
    if stlp_draws is None:
        _, scores, _ = specs.compute_scores(sig, formulas, highlevel, valid,
                                            cfg, tau=tau)
        hinge = jax.nn.relu(cfg.stl_trajopt_thres - scores)
    else:
        sig = specs.prep_signals(sig, cfg)     # geometry once, shared
        K = stlp_draws.shape[0]
        w = [1.0] if K == 1 else [0.5] + [0.5 / (K - 1)] * (K - 1)
        hinge = 0.0
        scores = None
        for k in range(K):
            sk = dict(sig)
            sk["stlp"] = stlp_draws[k]
            _, s_k, _ = specs.compute_scores(sk, formulas, highlevel, valid,
                                             cfg, tau=tau)
            hinge = hinge + w[k] * jax.nn.relu(cfg.stl_trajopt_thres - s_k)
            if k == 0:
                scores = s_k       # canonical draw reported downstream
    # note: clip floor 1e-3 here (nusc_train.py:297), not mask_mean's 1e-2
    dense_loss = (jnp.mean(hinge * valid)
                  / jnp.clip(jnp.mean(valid), 1e-3))
    reg = (jnp.mean(jax.nn.relu(params[..., 0] ** 2 - cfg.mul_w_max ** 2))
           + jnp.mean(jax.nn.relu(params[..., 1] ** 2 - cfg.mul_a_max ** 2))
           ) * cfg.reg_loss
    loss = dense_loss + reg
    if cfg.trajopt_nonneg_speed:
        # keep the oracle from braking past v=0 (reversal is an Euler
        # integrator artifact the strict env executes literally); squared
        # hinge so grads scale with reversal depth
        loss = loss + cfg.trajopt_nonneg_speed * jnp.mean(
            jnp.square(jax.nn.relu(-trajs[..., 3])))
    return loss, {"dense_loss": dense_loss, "reg_loss": reg,
                  "scores": scores, "trajs": trajs}


def optimize(params0: Array, states: Array, signal_base: Dict[str, Array],
             highlevel: Array, formulas, cfg: Config,
             iters: int | None = None, stlp_draws: Array | None = None):
    """Run the full augmentation optimization as one jitted scan.

    params0: (bs, M, 3, nt, 2) initial control seeds.
    states:  (bs, 4) scene initial states.
    signal_base: densified signal input (specs.dense_signal_input).
    stlp_draws: optional (K, n, 1, 6) flex draws for draw-robust
    optimization (see trajopt_loss).
    Returns (params (bs, M, 3, nt, 2), scores (bs, M, 3), aux dict).
    """
    if iters is None:
        iters = cfg.traj_opt_iters
    bs, M = params0.shape[0], params0.shape[1]
    n = bs * M * 3
    flat0 = params0.reshape(n, cfg.nt, 2)
    states_flat = jnp.broadcast_to(states[:, None, None],
                                   (bs, M, 3, 4)).reshape(n, 4)
    # warm, cosine-annealed lr: the tau=100 soft-min landscape is stiff —
    # a hot start escapes bad seeds, the decay settles into the tight
    # calibrated bands (reference uses a fixed lr; this converges to higher
    # satisfaction in the same iteration budget)
    sched = optax.cosine_decay_schedule(cfg.trajopt_lr * 3.0, iters,
                                        alpha=0.02)
    opt = optax.adam(sched)

    # tau-annealing: start with a smooth robustness surrogate (tau=10) whose
    # gradients see every clause, sharpen geometrically to the evaluation
    # tau — escapes the saturated-logsumexp plateaus that trap the
    # fixed-tau optimization on lane-change seeds
    tau_final = cfg.smoothing_factor
    tau_start = min(10.0, tau_final)

    grad_fn = jax.grad(
        lambda p, tau: trajopt_loss(p, states_flat, signal_base, highlevel,
                                    formulas, cfg, tau=tau,
                                    stlp_draws=stlp_draws)[0])

    def step(carry, i):
        p, opt_state = carry
        frac = i.astype(jnp.float32) / max(iters - 1, 1)
        tau = tau_start * (tau_final / tau_start) ** frac
        g = grad_fn(p, tau)
        updates, opt_state = opt.update(g, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state), None

    (flat, _), _ = jax.lax.scan(step, (flat0, opt.init(flat0)),
                                jnp.arange(iters))
    loss, aux = trajopt_loss(flat, states_flat, signal_base, highlevel,
                             formulas, cfg)
    scores = aux["scores"].reshape(bs, M, 3)
    return (flat.reshape(bs, M, 3, cfg.nt, 2), scores,
            {"loss": loss, "dense_loss": aux["dense_loss"],
             "reg_loss": aux["reg_loss"]})


def augment_dataset(ds, cfg: Config, formulas, batch_size: int = 64,
                    iters: int | None = None, seed: int = 0,
                    verbose: bool = True, epochs: int = 1):
    """Offline augmentation pass over a SceneDataset: attaches ``params``
    (optimized), ``params_init``, ``pre_stlp`` and ``tj_scores_prior``
    columns — the array-store replacement for the reference's per-sample
    .npy sidecars (nusc_train.py:775-797)."""
    import numpy as np
    ds.ensure_random_params(seed)
    n = len(ds)
    cfg_flex = cfg.with_(flex=True)   # trajopt_only forces flex
    key = jax.random.PRNGKey(seed)
    params_out = np.zeros_like(ds.data["params"])
    scores_out = np.zeros((n, cfg.n_randoms, 3), np.float32)
    stlp_out = np.zeros((n, cfg.n_randoms, 3, 1, 6), np.float32)

    K = max(int(cfg.trajopt_robust_draws), 1)
    run = jax.jit(lambda p0, st, sb, hl, draws: optimize(
        p0, st, sb, hl, formulas, cfg_flex, iters=iters,
        stlp_draws=draws))

    # fresh-draw satisfaction probe: score optimized params under a flex
    # draw NEVER seen by the optimizer (training redraws stlp per epoch,
    # so this — not the seen-draw acc — is the oracle quality that bounds
    # the stl_bc_mask training signal)
    @jax.jit
    def score_under(params, st, sb, hl, stlp_dense):
        n_rows = params.shape[0] * params.shape[1] * 3
        sb = dict(sb)
        sb["stlp"] = stlp_dense
        states_flat = jnp.broadcast_to(
            st[:, None, None], (st.shape[0], params.shape[1], 3, 4)
        ).reshape(n_rows, 4)
        _, aux = trajopt_loss(params.reshape(n_rows, cfg.nt, 2), states_flat,
                              sb, hl, formulas, cfg_flex)
        return aux["scores"]

    # --opt_epochs: optimization passes; epoch > 0 warm-starts from the
    # previous epoch's optimum (reference epoch-loop trajopt branch,
    # nusc_train.py:1303-1328)
    accs_seen, accs_fresh = [], []
    for ep in range(max(epochs, 1)):
        for i0 in range(0, n, batch_size):
            idx = np.arange(i0, min(i0 + batch_size, n))
            if len(idx) < batch_size:   # pad to keep shapes static
                idx = np.concatenate([idx, idx[:batch_size - len(idx)]])
            batch = {k: jnp.asarray(v) for k, v in ds.gather(idx).items()}
            batch["neighbor_trajs_aug"] = batch["neighbors_traj"]
            if ep > 0:
                batch["params"] = jnp.asarray(params_out[idx])
            gt = batch["ego_traj"][..., :4]
            stlp = specs.calibrate_stlp(batch, gt, cfg_flex)
            key, k_d = jax.random.split(key)
            dense = specs.densify_batch(batch, stlp, cfg_flex, key=k_d)
            signal_base = specs.dense_signal_input(dense, cfg=cfg)
            states = gt[:, 0]
            # K flex draws: draw 0 is the canonical stlp_dense persisted to
            # the pre_stlp sidecar; the rest exist only to robustify
            draws = [dense["stlp_dense"]]
            for _ in range(K - 1):
                key, k_k = jax.random.split(key)
                draws.append(specs.get_dense_stlp(
                    k_k, batch["gt_high_level"], stlp, cfg_flex))
            params, scores, aux = run(batch["params"], states, signal_base,
                                      dense["highlevel_dense"],
                                      jnp.stack(draws))
            key, k_f = jax.random.split(key)
            fresh = specs.get_dense_stlp(k_f, batch["gt_high_level"], stlp,
                                         cfg_flex)
            s_fresh = score_under(params, states, signal_base,
                                  dense["highlevel_dense"], fresh)
            valid = np.asarray(dense["valids_dense"]).reshape(-1)
            acc_fresh = float((np.asarray(s_fresh > 0) * valid).sum()
                              / max(valid.sum(), 1.0))
            M = cfg.n_randoms
            if K > 1:
                # persist the BEST-of-K draw per row: training conditions
                # on the cached stlp (load_stlp, nusc_dataset.py:220-222),
                # so store the draw each optimized control best satisfies —
                # robust params + a conditioning stlp they actually meet
                # (keeps the stl_bc_mask training signal dense)
                s_all = [scores.reshape(-1)]
                for kk in range(1, K):
                    s_all.append(score_under(params, states, signal_base,
                                             dense["highlevel_dense"],
                                             draws[kk]))
                S = np.stack([np.asarray(s).reshape(batch_size, M, 3)
                              for s in s_all])              # (K, bs, M, 3)
                kstar = np.argmax(S, axis=0)                # (bs, M, 3)
                scores_np = np.max(S, axis=0)
                D = np.stack([np.asarray(d).reshape(batch_size, M, 3, 6)
                              for d in draws])              # (K, bs, M, 3, 6)
                stlp_np = np.take_along_axis(
                    D, kstar[None, ..., None], axis=0)[0][..., None, :]
            else:
                scores_np = np.asarray(scores)
                stlp_np = np.asarray(dense["stlp_dense"]).reshape(
                    batch_size, M, 3, 1, 6)
            real = np.arange(i0, min(i0 + batch_size, n)) - i0
            params_out[i0:i0 + len(real)] = np.asarray(params)[real]
            scores_out[i0:i0 + len(real)] = scores_np[real]
            stlp_out[i0:i0 + len(real)] = stlp_np[real]
            # VALID-masked like the eval tj_acc row (the unmasked mean
            # counts invalid-lane rows as failures and reads ~0.73x lower)
            acc = float(((scores_np.reshape(-1) > 0) * valid).sum()
                        / max(valid.sum(), 1.0))
            if ep == max(epochs, 1) - 1:
                accs_seen.append(acc)
                accs_fresh.append(acc_fresh)
            if verbose:
                print(f"trajopt [{ep}|{i0:5d}/{n}] "
                      f"loss={float(aux['loss']):.4f} acc={acc:.3f} "
                      f"fresh={acc_fresh:.3f}")
    ds.attach("params", params_out)
    ds.attach("tj_scores_prior", scores_out)
    ds.attach("pre_stlp", stlp_out)
    stats = {"acc_seen": float(np.mean(accs_seen)),
             "acc_fresh": float(np.mean(accs_fresh))}
    if verbose:
        print(f"trajopt oracle: seen={stats['acc_seen']:.3f} "
              f"fresh-draw={stats['acc_fresh']:.3f} (K={K} draws)")
    ds.trajopt_stats = stats
    return ds
