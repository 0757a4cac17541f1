"""Open-loop Table-I row under the FULL reference-parity bundle
(Config.ref_parity(open_loop=True): guidance quirk ON, README open-loop
guidance schedule — last 10 denoise steps, 1 Adam iteration, lr 0.01,
multi_cands 10 — plus strict env semantics; VERDICT r3 #4's Table-I leg).

Usage: python scripts/openloop_refparity.py [ckpt] [cache] [out.json]
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
        OUT, "openloop_refparity.json")
    base = dict(n_randoms=64, n_neighbors=8, batch_size=16)
    rows = {}
    for name, guidance in (("ours_refparity", False),
                           ("ours_guidance_refparity", True)):
        cfg = PRESETS["ours_guidance" if guidance else "e7_ours"].with_(
            **base).with_(test=True, sampling_size=64, stl_weight=1.0)
        if not guidance:
            cfg = cfg.with_(n_rolls=3)
        cfg = cfg.ref_parity(open_loop=True)
        ds = SceneDataset.load(cache, cfg)
        net = Net(cfg)
        sample = next(batch_iterator(ds, "val", min(cfg.batch_size, 4),
                                     shuffle=False, drop_last=False))
        st = train.init_state(cfg, net, sample, jax.random.PRNGKey(cfg.seed))
        st = train.load_params_only(ckpt, st)
        t0 = time.time()
        r = eval_openloop.run(cfg, ds, st.params, net=net, n_trials=3)
        rows[name] = {k: round(v, 4) for k, v in r.items()
                      if k.startswith(("nn_", "time"))}
        rows[name]["wall_s"] = round(time.time() - t0, 1)
        print(name, json.dumps(rows[name]), flush=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
