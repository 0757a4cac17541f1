"""Retrain e7 with the round-1 recipe (STL hinge ON) and re-eval the ours
rows.

Round-2 finding: the reference's own e7 command trains the RefineNet with
stl_weight=0.0 and rect_reg_loss=0.0, i.e. on the quality-gated DPP
diversity loss ALONE (README.md:66 + parser defaults nusc_train.py:1701,
1719).  In our setting that collapses candidate satisfaction (open-loop
compliance 0.17, minADE ~900) because the quality gate (score>0) is mostly
zero early and the diversity term then dominates unopposed.  Adding the STL
hinge (stl_weight=1.0 — the parser default the README overrides) recovers
it; round 1 shipped this recipe and beat the reference's no-guidance
closed-loop compliance.

Trains models_e7v2 from the e5 checkpoint, then runs the ours /
ours+guidance open-loop rows and writes ours_v2 keys into results.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

from pstl_tpu import diffusion, eval_openloop, specs, train
from pstl_tpu.config import PRESETS
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net

OUT = os.environ.get("E2E_OUT", "exps/e2e_r2")
T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:8.1f}s] {msg}", flush=True)


def _load(cfg, ds, mdir):
    net = Net(cfg)
    sample = next(batch_iterator(ds, "val", min(cfg.batch_size, 4),
                                 shuffle=False, drop_last=False))
    st = train.init_state(cfg, net, sample, jax.random.PRNGKey(cfg.seed))
    return train.load_params_only(mdir, st)


def main():
    base = dict(n_randoms=64, n_neighbors=8, batch_size=16)
    epochs = int(os.environ.get("E7V2_EPOCHS", "25"))
    src = os.environ.get("E7V2_SRC", "models_e5")
    dst = os.environ.get("E7V2_DST", "models_e7v2")
    tag = os.environ.get("E7V2_TAG", "ours_v2")
    cfg7 = PRESETS["e7_ours"].with_(**base).with_(
        stl_weight=1.0, epochs=epochs,
        net_pretrained_path=os.path.join(OUT, src))
    # training-recipe overrides for sweeps, e.g.
    # E7V2_OVERRIDES="diversity_weight=2.0,diversity_scale=0.5"
    for kv in filter(None, os.environ.get("E7V2_OVERRIDES", "").split(",")):
        k, v = (s.strip() for s in kv.split("=", 1))
        cur = getattr(cfg7, k)
        if isinstance(cur, bool):
            val = v.lower() in ("1", "true")
        elif isinstance(cur, int):
            val = int(float(v))
        elif isinstance(cur, float):
            val = float(v)
        elif cur is None:
            # Optional numeric fields (e.g. multi_cands=None): infer from
            # the literal so the field never gets a raw string
            try:
                val = int(v)
            except ValueError:
                try:
                    val = float(v)
                except ValueError:
                    val = v
        else:
            val = v
        cfg7 = cfg7.with_(**{k: val})
        log(f"override: {k} = {getattr(cfg7, k)}")
    ds = SceneDataset.load(os.path.join(OUT, "cache_aug.npz"), cfg7)
    results = json.load(open(os.path.join(OUT, "results.json")))

    mdir = os.path.join(OUT, dst)
    if not os.path.exists(os.path.join(mdir, "LAST")):
        log(f"training e7v2 (stl_weight=1.0, {epochs} epochs)...")
        st = train.train(cfg7.with_(exp_name=None), ds, log=log)
        train.save_checkpoint(mdir, st, 0)
        log("e7v2 done")

    for row, cfge in (
            (tag, PRESETS["e7_ours"].with_(n_rolls=3)),
            (tag + "_guidance", PRESETS["ours_guidance"].with_(
                guidance_before=1000, guidance_niters=3)),
    ):
        cfge = cfge.with_(test=True, sampling_size=64, **base)
        st = _load(cfge, ds, mdir)
        log(f"open-loop eval: {row}")
        out = eval_openloop.run(cfge, ds, st.params, n_trials=3, log=log,
                                viz_dir=os.path.join(OUT, f"viz_{row}"))
        results[f"openloop_{row}"] = {k: round(v, 4) for k, v in out.items()}
        with open(os.path.join(OUT, "results.json"), "w") as f:
            json.dump(results, f, indent=2)

    if os.environ.get("E7V2_SKIP_SIM"):
        log("E7V2_SKIP_SIM set — open-loop rows only")
        log("done: " + json.dumps({k: v for k, v in results.items()
                                   if tag in k}))
        return

    # closed-loop ours rows on the held-out protocol
    from pstl_tpu import sim as simmod
    from pstl_tpu.data import synthetic
    data = synthetic.generate_dataset(777, 50, cfg7, scene_len=38)
    keep = np.where(data["scene_ego_full"][:, :, 3].mean(-1) >= 1.0)[0][:25]
    data = {k: v[keep] for k, v in data.items()}
    scenes = simmod.scenes_from_dataset(data)
    for row, cfgs in (
            (tag, PRESETS["e7_ours"]),
            (tag + "_guidance", PRESETS["ours_guidance_sim"].with_(
                guidance_before=1000, guidance_niters=3,
                guidance_lr=0.01)),
    ):
        cfgs = cfgs.with_(test=True, **base)
        st = _load(cfgs, ds, mdir)
        log(f"closed-loop eval: {row}")
        out = simmod.run_closed_loop_host(
            jax.random.PRNGKey(0), scenes, cfgs, Net(cfgs), st.params,
            specs.build_scorer(cfgs), diffusion.get_coeffs(cfgs),
            max_steps=36, record=True)
        step_s = out["history"]["step_s"][1:] or out["history"]["step_s"]
        results[f"closedloop_{row}"] = {
            "compliance": round(float(out["stl_acc"].mean()), 4),
            "area": round(float(out["area"]), 4),
            "progress": round(float(out["progress"].mean()), 3),
            "collision": round(float(out["collide"].mean()), 4),
            "out_of_lane": round(float(out["out_of_lane"].mean()), 4),
            "plan_s_per_step_batch": round(float(np.median(step_s)), 4),
        }
        with open(os.path.join(OUT, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
    log("done: " + json.dumps({k: v for k, v in results.items()
                               if tag in k}))


if __name__ == "__main__":
    main()
