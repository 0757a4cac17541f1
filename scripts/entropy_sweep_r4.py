"""Entropy-vs-compliance frontier sweep (VERDICT r3 #2).

Target: a Table-I row with entropy (ent_s) >= 1.735 at compliance
(nn_acc) >= 0.544 — the reference's "Ours+guidance" cell
(BASELINE.md Table I).  Eval-time lever: sampler temperature
``sample_noise_scale`` (the ancestral-noise scale); optionally DPP
shard count.  No retraining — runs the open-loop evaluator on the
trained ours(+guidance) checkpoint at several temperatures.

Usage: python scripts/entropy_sweep_r4.py [ckpt_dir] [cache.npz] [out.json]
Env: ENT_TEMPS="1.0,1.1,1.2" ENT_TRIALS=3
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

from pstl_tpu import eval_openloop, train
from pstl_tpu.config import PRESETS
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net

OUT = os.environ.get("E2E_OUT", "exps/r4")


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(OUT, "models_e7")
    cache = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        OUT, "cache_aug.npz")
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        OUT, "entropy_sweep.json")
    temps = [float(t) for t in os.environ.get(
        "ENT_TEMPS", "1.0,1.05,1.1,1.2").split(",")]
    trials = int(os.environ.get("ENT_TRIALS", "3"))
    base = dict(n_randoms=64, n_neighbors=8, batch_size=16)
    rows = {}
    if os.path.exists(out_path):
        rows = json.load(open(out_path))
    for t in temps:
        name = f"temp{t:g}"
        if name in rows:
            print(f"{name}: cached", flush=True)
            continue
        cfg = PRESETS["ours_guidance"].with_(**base).with_(
            test=True, sampling_size=64, stl_weight=1.0,
            sample_noise_scale=t)
        ds = SceneDataset.load(cache, cfg)
        net = Net(cfg)
        sample = next(batch_iterator(ds, "val", min(cfg.batch_size, 4),
                                     shuffle=False, drop_last=False))
        st = train.init_state(cfg, net, sample, jax.random.PRNGKey(cfg.seed))
        st = train.load_params_only(ckpt, st)
        t0 = time.time()
        r = eval_openloop.run(cfg, ds, st.params, net=net, n_trials=trials)
        rows[name] = {k: round(v, 4) for k, v in r.items()
                      if k.startswith(("nn_", "time"))}
        rows[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, json.dumps(rows[name]), flush=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
