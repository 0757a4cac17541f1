"""Closed-loop guidance hyperparameter sweep on the held-out protocol.

Sweeps (guidance_before, guidance_niters, guidance_lr) on a trained e7
checkpoint over the 25 held-out scenes, reporting compliance / collision /
out-of-lane / progress per variant (VERDICT r1 item 3).

Usage: python scripts/guidance_sweep.py exps/e2e_r2/models_e7 [out.json]
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

from pstl_tpu import diffusion, sim, specs, train
from pstl_tpu.config import PRESETS
from pstl_tpu.data import synthetic
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net

VARIANTS = {
    # reference Table-II closed-loop params
    "ref_b10_n1_lr04": dict(guidance=True, guidance_before=10,
                            guidance_niters=1, guidance_lr=0.04),
    # round-1 best (all steps, 3 iters, signed clamp)
    "all_n3_lr01": dict(guidance=True, guidance_before=1000,
                        guidance_niters=3, guidance_lr=0.01),
    "all_n1_lr01": dict(guidance=True, guidance_before=1000,
                        guidance_niters=1, guidance_lr=0.01),
    "b10_n3_lr04": dict(guidance=True, guidance_before=10,
                        guidance_niters=3, guidance_lr=0.04),
    "no_guidance": dict(guidance=False),
}


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "exps/e2e_r2/models_e7"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "exps/e2e_r2/gsweep.json"
    base = PRESETS["ours_guidance_sim"].with_(
        n_randoms=64, n_neighbors=8, batch_size=16, test=True)
    data = synthetic.generate_dataset(777, 50, base, scene_len=38)
    keep = np.where(data["scene_ego_full"][:, :, 3].mean(-1) >= 1.0)[0][:25]
    data = {k: v[keep] for k, v in data.items()}
    scenes = sim.scenes_from_dataset(data)
    ds = SceneDataset({k: v for k, v in data.items()
                       if not k.startswith("scene_")}, base)
    net = Net(base)
    sample = next(batch_iterator(ds, "val", 8, shuffle=False,
                                 drop_last=False))
    st = train.init_state(base, net, sample, jax.random.PRNGKey(0))
    st = train.load_params_only(ckpt, st)

    results = {}
    for name, kw in VARIANTS.items():
        cfg = base.with_(**kw)
        t0 = time.time()
        out = sim.run_closed_loop_host(
            jax.random.PRNGKey(0), scenes, cfg, net, st.params,
            specs.build_scorer(cfg), diffusion.get_coeffs(cfg),
            max_steps=36, chunk=4)
        results[name] = {
            "compliance": round(float(out["stl_acc"].mean()), 4),
            "progress": round(float(out["progress"].mean()), 2),
            "collision": round(float(out["collide"].mean()), 4),
            "out_of_lane": round(float(out["out_of_lane"].mean()), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(name, json.dumps(results[name]), flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
