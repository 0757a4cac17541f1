"""End-to-end pipeline on synthetic scenes (the reference's e0->e1->e5->e7
staged workflow, README.md:54-202), sized to run unattended on one chip:

  1. generate scenes (e0)
  2. trajopt augmentation (e1)
  3. train plain DDPM (e5)
  4. train RefineNet + DPP diversity on top (e7)
  5. open-loop eval (Table-I metrics) with and without guidance
  6. save the checkpoint for bench.py (BENCH_CKPT)

Writes exps/e2e/{cache_aug.npz, models/, results.json}.
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
import jax.numpy as jnp
import numpy as np

from pstl_tpu import diffusion, eval_openloop, specs, train, trajopt
from pstl_tpu.config import Config
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net

OUT = os.environ.get("E2E_OUT", "exps/e2e")
T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:8.1f}s] {msg}", flush=True)


def main():
    os.makedirs(os.path.join(OUT, "models"), exist_ok=True)
    n_scenes = int(os.environ.get("E2E_SCENES", "256"))
    epochs_e5 = int(os.environ.get("E2E_EPOCHS_E5", "150"))
    epochs_e7 = int(os.environ.get("E2E_EPOCHS_E7", "20"))
    tj_iters = int(os.environ.get("E2E_TJ_ITERS", "2000"))

    base = dict(n_randoms=64, n_neighbors=8, batch_size=16, flex=True,
                load_stlp=True, load_tj=True)
    cfg5 = Config(diffusion=True, **base).finalize().with_(epochs=epochs_e5)
    cfg7 = Config(diffusion=True, rect_head=True, diverse_loss=True,
                  multi_cands=5, **base).finalize().with_(epochs=epochs_e7)

    # ---- 1. data -------------------------------------------------------
    cache = os.path.join(OUT, "cache_aug.npz")
    if os.path.exists(cache):
        ds = SceneDataset.load(cache, cfg5)
        log(f"loaded cached dataset ({len(ds)} scenes)")
    else:
        ds = SceneDataset.from_synthetic(cfg5, n_scenes=n_scenes,
                                         scene_len=38)
        log(f"generated {len(ds)} scenes")

        # ---- 2. trajopt ------------------------------------------------
        formulas = specs.build_scorer(cfg5)
        trajopt.augment_dataset(ds, cfg5, formulas, batch_size=64,
                                iters=tj_iters, verbose=True)
        sc = ds.data["tj_scores_prior"]
        log(f"trajopt done: sat-rate {float((sc > 0).mean()):.3f}")
        ds.save(cache)

    results = {"trajopt_sat": float((ds.data["tj_scores_prior"] > 0).mean())}

    # ---- 3. train e5 (plain DDPM) ---------------------------------------
    log("training e5 (plain DDPM)...")
    state5 = train.train(cfg5, ds, log=log, epochs=epochs_e5)
    train.save_checkpoint(os.path.join(OUT, "models_e5"), state5, 0)

    # ---- 4. train e7 (RefineNet + diversity) on top ----------------------
    log("training e7 (RefineNet + DPP)...")
    cfg7p = cfg7.with_(net_pretrained_path=os.path.join(OUT, "models_e5"))
    state7 = train.train(cfg7p, ds, log=log, epochs=epochs_e7)
    train.save_checkpoint(os.path.join(OUT, "models"), state7, 0)
    log("checkpoints saved")

    # ---- 5. open-loop eval ------------------------------------------------
    for name, eval_cfg in (
            ("ours", cfg7.with_(test=True, sampling_size=64, n_rolls=3)),
            ("ours_guidance", cfg7.with_(test=True, sampling_size=64,
                                         n_rolls=3, guidance=True,
                                         guidance_niters=3, multi_cands=10)),
    ):
        log(f"open-loop eval: {name}")
        out = eval_openloop.run(eval_cfg, ds, state7.params,
                                n_trials=3, log=log)
        results[name] = {k: round(v, 4) for k, v in out.items()}

    with open(os.path.join(OUT, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    log("results: " + json.dumps(results))


if __name__ == "__main__":
    main()
