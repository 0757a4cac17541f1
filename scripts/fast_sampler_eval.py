"""Fast-sampler quality/time rows (beyond-reference): DDPM(99 evals) vs
DDIM vs DPM-Solver++(2M) at ddim_steps network evaluations, open-loop
Table-I metrics on the trained ours(+guidance) checkpoint.

Usage: python scripts/fast_sampler_eval.py exps/e2e_r3/models_e7v2 [out.json]
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

OUT = os.environ.get("E2E_OUT", "exps/e2e_r3")


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        OUT, "models_e7v2")
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        OUT, "fast_sampler.json")
    base = dict(n_randoms=64, n_neighbors=8, batch_size=16)
    rows = {}
    for name, over in (
            ("ddpm", dict(sampler="ddpm")),
            ("ddim20", dict(sampler="ddim", ddim_steps=20)),
            ("dpmpp10", dict(sampler="dpmpp", ddim_steps=10)),
            ("dpmpp20", dict(sampler="dpmpp", ddim_steps=20)),
            # guidance-aware step placement (VERDICT r3 #9): 40% of the
            # evaluations in the last-10-timesteps band where guidance
            # correction moves the final sample most
            ("dpmpp20_focus", dict(sampler="dpmpp", ddim_steps=20,
                                   fast_guided_focus=0.4,
                                   fast_focus_band=10)),
            ("ddim20_focus", dict(sampler="ddim", ddim_steps=20,
                                  fast_guided_focus=0.4,
                                  fast_focus_band=10))):
        cfg = PRESETS["ours_guidance"].with_(**base).with_(
            test=True, sampling_size=64, stl_weight=1.0, **over)
        ds = SceneDataset.load(os.path.join(OUT, "cache_aug.npz"), cfg)
        net = Net(cfg)
        sample = next(batch_iterator(ds, "val", min(cfg.batch_size, 4),
                                     shuffle=False, drop_last=False))
        st = train.init_state(cfg, net, sample, jax.random.PRNGKey(cfg.seed))
        st = train.load_params_only(ckpt, st)
        r = eval_openloop.run(cfg, ds, st.params, net=net, n_trials=3)
        rows[name] = {k: round(v, 4) for k, v in r.items()
                      if k.startswith(("nn_", "time"))}
        print(name, json.dumps(rows[name]), flush=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
