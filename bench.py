"""North-star benchmark: closed-loop agent-steps/sec on one TPU chip.

Runs the full reference-parity planning stack per sim step — 99-step DDPM
reverse pass, STL-guidance gradient ascent inside the sampler, multi-candidate
selection, RefineNet rectification, n_rolls re-rectification, lane-keep
argmax — batched over many scenes, with the environment stepped on device
(pstl_tpu.sim.run_closed_loop).

Baseline: the reference's closed-loop "Ours+guidance" plan time is
0.379 s/step on a V100-class GPU => ~2.6 agent-steps/sec (BASELINE.md).

Every run measures THREE contract rows (>= 8 timed dispatches each,
p50/p90 reported):
  heavy       all-99-step x 3-iteration guidance (round-1 contract; headline)
  parity      the reference's published guidance schedule (README.md:175:
              --guidance_before 10 --guidance_niters 1 --multi_cands 5)
  parity_nog  the reference's no-guidance "Ours" row (0.055 s/plan)

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "detail":
   {..., "contracts": {parity row, parity_nog row}}}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_SEC = 2.6   # 1 / 0.379s (BASELINE.md table II)
# apples-to-apples anchors per contract row
MODE_BASELINE = {
    "heavy": BASELINE_STEPS_PER_SEC,
    "parity": BASELINE_STEPS_PER_SEC,
    "parity_nog": 1.0 / 0.055,   # reference "Ours" Table-II plan time
}


def build_cfg(mode):
    from pstl_tpu.config import Config

    # reference "Ours+guidance" closed-loop configuration
    # (README e7 + guidance flags; multi_cands=10, n_rolls=3)
    cfg = Config(diffusion=True, rect_head=True, diverse_loss=True,
                 multi_cands=10, guidance=True, guidance_niters=3,
                 n_rolls=3, n_randoms=64, n_neighbors=8,
                 flex=True).finalize().with_(epochs=1, test=True)
    if os.environ.get("BENCH_PALLAS"):
        cfg = cfg.with_(use_pallas_clearance=True)
    # Pallas guidance mega-kernel (ops/pallas_guidance.py): the whole
    # per-denoise-step Adam ascent in one program per scene, with the
    # freeze argmins computed in-VMEM.  Measured 493.3 vs 348.8 steps/s
    # for the XLA loop (docs/PERF.md round 3) — shipped default.
    # BENCH_GPALLAS=0 reverts to the XLA candidate-minor loop,
    # =1 frozen-payload kernel, =2 fuse_freeze (same as default),
    # =1f/=2f the scene-folded variants, =3 the round-4 column-grid
    # fold2 kernel (in-kernel MXU scene broadcast; BENCH_COLS sets the
    # chunk width, 0 = auto), =4 the whole-denoise-step superstep kernel
    # (eps-MLP + posterior + guidance + noise in ONE program per step).
    gp = os.environ.get("BENCH_GPALLAS", "2")
    if gp != "0":
        # BENCH_GPACK=G packs G scenes per program in the lane axis of the
        # per-scene fuse_freeze grid — only meaningful for gp=2 unfolded.
        # Default 2: fills the 128 VPU lanes at R=64; measured 606.3 vs
        # 524-536 steps/s at G=1 (+15%), G=4 570.5, G=8 compile-times-out
        # (docs/PERF.md round-4).
        pack = (int(os.environ.get("BENCH_GPACK", "2"))
                if gp == "2" else 1)
        # re-finalize: guidance_pallas couples reuse_selection/fused_loss
        cfg = cfg.with_(
            guidance_pallas=True,
            guidance_pallas_fuse_freeze=gp.startswith("2"),
            guidance_pallas_fold=gp.endswith("f"),
            guidance_pallas_fold2=gp.startswith("3"),
            guidance_pallas_superstep=gp.startswith("4"),
            guidance_pallas_cols=int(os.environ.get("BENCH_COLS", "0")),
            guidance_pallas_pack=pack,
        ).finalize()
    # frozen argmin selections across the per-step Adam iterations:
    # measured 242.2 vs 213.3 steps/s (1.135x) metric-neutral (compliance
    # 0.935 vs 0.939, zero collision/OOL both) — docs/PERF.md round 3.
    # BENCH_EXACT_SEL=1 restores per-iteration re-selection.
    if not os.environ.get("BENCH_EXACT_SEL"):
        cfg = cfg.with_(guidance_reuse_selection=True)
    if os.environ.get("BENCH_SEL_EVERY"):
        cfg = cfg.with_(
            guidance_sel_every=int(os.environ["BENCH_SEL_EVERY"]))
    # bf16 levers (docs/PERF.md round 3): selection-field/frozen-payload
    # geometry dtype and STL robustness accumulation dtype
    if os.environ.get("BENCH_GEOM_DTYPE"):
        cfg = cfg.with_(geometry_dtype=os.environ["BENCH_GEOM_DTYPE"])
    if os.environ.get("BENCH_ROB_DTYPE"):
        cfg = cfg.with_(robustness_dtype=os.environ["BENCH_ROB_DTYPE"])
    if os.environ.get("BENCH_NO_CM"):
        cfg = cfg.with_(cm_sampler=False)
    # Round-5 shipped defaults (A/B matrix exps/r5_perf/, docs/PERF.md
    # round-5): coarse-pair freeze +4.4%, bf16 MXU cumsum tiles +6.8%,
    # together +18.4% (621.5 -> 736.0 steps/s) at identical bench
    # compliance (0.936).  =0 restores the exact/fp32 paths.
    if os.environ.get("BENCH_COARSE_PAIR", "1") != "0":
        cfg = cfg.with_(clearance_coarse_pair=True)
    if os.environ.get("BENCH_BF16_CUMSUM", "1") != "0":
        cfg = cfg.with_(guidance_pallas_bf16_cumsum=True)
    if os.environ.get("BENCH_BLEND"):
        cfg = cfg.with_(guidance_blend_scores=True)
    if os.environ.get("BENCH_SCAN_UNROLL"):
        cfg = cfg.with_(
            diffusion_scan_unroll=int(os.environ["BENCH_SCAN_UNROLL"]))
    if mode == "parity":
        # the EXACT guidance schedule behind the reference's published
        # 0.379 s/plan Table-II row (README.md:175: --guidance_before 10
        # --guidance_niters 1 --guidance_lr 0.04 --multi_cands 5): guide
        # only the last 10 denoise steps with ONE Adam iteration.  The
        # default "heavy" mode keeps the strictly harder all-99-steps
        # x 3-iteration contract from round 1.
        cfg = cfg.with_(guidance_before=10, guidance_niters=1,
                        guidance_lr=0.04, multi_cands=5)
    elif mode == "parity_nog":
        # the reference's NO-guidance "Ours" Table-II row (0.055 s/plan
        # = ~18 plans/s on the V100-class GPU): full T=100 DDPM +
        # multi-candidate selection + RefineNet, guidance off
        cfg = cfg.with_(guidance=False, multi_cands=5)
    if os.environ.get("BENCH_SAMPLER"):
        cfg = cfg.with_(sampler=os.environ["BENCH_SAMPLER"],
                        ddim_steps=int(os.environ.get("BENCH_DDIM_STEPS",
                                                      "20")))
    return cfg


def measure(cfg, scenes, bs, max_steps, chunk, ckpt):
    """Compile + time one contract row; returns (steps/s, detail dict)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pstl_tpu import diffusion, sim, specs
    from pstl_tpu.models import Net

    net = Net(cfg)
    formulas = specs.build_scorer(cfg)
    coeffs = diffusion.get_coeffs(cfg)

    # init params — everything jitted: eager dispatch through the TPU
    # tunnel costs seconds per primitive
    n = bs * cfg.n_randoms * 3

    @jax.jit
    def init_params(key):
        obs0 = jax.vmap(lambda s, e, t: sim.observe(s, e, t, cfg),
                        in_axes=(0, 0, 0))(
            scenes, scenes.ego_full[:, 0], jnp.zeros((bs,), jnp.int32))
        gt_stlp = jnp.broadcast_to(jnp.asarray(sim.AGGRESSIVE_STLP), (bs, 6))
        dense0 = specs.densify_batch(
            obs0, gt_stlp, cfg, key=key,
            stlp_dense=jnp.broadcast_to(jnp.asarray(sim.AGGRESSIVE_STLP),
                                        (n, 1, 6)))
        ext0 = {"timestep": jnp.ones((n, 1)),
                "highlevel": dense0["highlevel_dense"],
                "noise": jnp.zeros((n, cfg.nt * 2))}
        return net.init(key, dense0, ext0, method=Net.init_all)

    params = init_params(jax.random.PRNGKey(1))
    if ckpt:
        from pstl_tpu import train as _train
        state = _train.TrainState(params, None, 0)
        params = _train.load_params_only(ckpt, state).params

    init_carry, step = sim.make_closed_loop_step(scenes, cfg, net, params,
                                                 formulas, coeffs,
                                                 chunk=chunk)

    # compile
    t0 = time.time()
    jax.block_until_ready(step(init_carry(jax.random.PRNGKey(0))))
    compile_s = time.time() - t0
    print(f"# compiled in {compile_s:.0f}s", file=sys.stderr, flush=True)
    # timed episodes (steady state). Every step() plans for ALL scenes
    # (done-masking zeroes metrics, not compute), so throughput counts
    # bs plans per call — the work a deployment would batch.  ``chunk``
    # replanning steps run per dispatch (lax.scan) to amortize the device
    # tunnel's launch latency.
    c = init_carry(jax.random.PRNGKey(1))
    t0 = time.time()
    chunk_s = []
    for _ in range(max_steps // chunk):
        t1 = time.time()
        c = step(c)
        jax.block_until_ready(c.ego)
        chunk_s.append(time.time() - t1)
    out = jax.block_until_ready(sim._carry_metrics(c))
    wall = time.time() - t0
    # per-dispatch stats: p50 is the headline (robust to transient
    # contention on the shared device tunnel), p90 shows the tail
    p50 = float(np.percentile(chunk_s, 50))
    p90 = float(np.percentile(chunk_s, 90))
    sps = bs * chunk / p50
    detail = {
        "scenes": bs, "steps_run": float(bs * max_steps),
        "n_dispatches": len(chunk_s),
        "dispatch_p50_s": round(p50, 4), "dispatch_p90_s": round(p90, 4),
        "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
        "collide_rate": round(float(out["collide"].mean()), 3),
        "out_of_lane_rate": round(float(out["out_of_lane"].mean()), 3),
        "mean_progress_m": round(float(out["progress"].mean()), 2),
        "stl_compliance": round(float(out["stl_acc"].mean()), 3),
    }
    return sps, detail


def main():
    # persistent compile cache: repeat bench runs skip the big XLA compile
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/pstl_tpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        # CPU smoke runs etc. — the container pre-imports jax with the
        # axon platform pinned, so env vars are too late; config works
        # because backend selection is lazy
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    from pstl_tpu import sim
    from pstl_tpu.data import synthetic

    mode = os.environ.get("BENCH_MODE", "heavy")
    bs = int(os.environ.get("BENCH_SCENES", "16"))
    # >= 8 timed dispatches by default (chunk=8 -> 64 steps)
    max_steps = int(os.environ.get("BENCH_STEPS", "64"))
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    max_steps = max(max_steps // chunk, 1) * chunk

    cfg0 = build_cfg(mode)
    data = synthetic.generate_dataset(0, bs, cfg0, scene_len=38)
    scenes = sim.scenes_from_dataset(data)

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.environ.get("BENCH_CKPT")
    if not ckpt:   # newest committed checkpoint wins
        for name in ("e7_round5", "e7_round4", "e7_round3", "e7_round2",
                     "e7_round1"):
            cand = os.path.join(here, "checkpoints", name)
            if os.path.isdir(cand):
                ckpt = cand
                break

    label = {"heavy": "DDPM T=100 + STL guidance + RefineNet",
             "parity": "DDPM T=100, reference-parity guidance schedule",
             "parity_nog": "DDPM T=100, no guidance (reference 'Ours' row)",
             }.get(mode, mode)
    print(f"# mode={mode}: compiling closed-loop step...",
          file=sys.stderr, flush=True)
    sps, detail = measure(cfg0, scenes, bs, max_steps, chunk, ckpt)
    detail["device"] = str(jax.devices()[0])
    detail["checkpoint"] = os.path.basename(ckpt) if ckpt else None

    # the other contract rows, in the same emitted JSON every run
    # (BENCH_ALL_MODES=0 to skip, e.g. for quick A/B sweeps)
    if os.environ.get("BENCH_ALL_MODES", "1") != "0" and mode == "heavy":
        contracts = {}
        for m in ("parity", "parity_nog"):
            print(f"# mode={m}: compiling closed-loop step...",
                  file=sys.stderr, flush=True)
            m_sps, m_detail = measure(build_cfg(m), scenes, bs, max_steps,
                                      chunk, ckpt)
            contracts[m] = {
                "agent_steps_per_sec": round(m_sps, 2),
                "vs_baseline": round(m_sps / MODE_BASELINE[m], 2),
                "dispatch_p50_s": m_detail["dispatch_p50_s"],
                "dispatch_p90_s": m_detail["dispatch_p90_s"],
                "n_dispatches": m_detail["n_dispatches"],
                "stl_compliance": m_detail["stl_compliance"],
                "collide_rate": m_detail["collide_rate"],
                "out_of_lane_rate": m_detail["out_of_lane_rate"],
            }
        detail["contracts"] = contracts

    result = {
        "metric": f"closed-loop agent-steps/sec/chip ({label})",
        "value": round(sps, 2),
        "unit": "agent-steps/s",
        "vs_baseline": round(sps / MODE_BASELINE.get(mode, 2.6), 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
