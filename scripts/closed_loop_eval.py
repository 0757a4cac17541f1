"""Closed-loop Table-II evaluation on held-out scenes.

Parity target: the ``nusc_sim.py`` driver over the 25 curated test scenes
(nusc_dataset.py:38-72): compliance, valid area, progress, collision rate,
out-of-lane rate, and planning time per step — with the full Ours(+guidance)
planning stack, on a trained checkpoint.

Usage:
  python scripts/closed_loop_eval.py exps/e2e_v2/models [--guidance]
      [--cache cache.npz] [--strict]

--cache runs the episodes on an extracted scene cache instead of fresh
synthetic scenes; --strict reports the reference-exact-semantics row
(forward_shield=False, env_nonnegative_speed=False — nusc_sim.py:118 lets
speed go negative and applies no reversal shield); --ref-parity applies
the FULL one-switch parity bundle (Config.ref_parity: strict semantics +
guidance quirk + README closed-loop guidance schedule + backup budget);
--backup enables the backup safety controller (solve_bak A/B row);
--unsafe-fixture injects a neighbor riding the GT corridor two frames
ahead of the ego into every scene (forces the planner's 2-step clearance
below D_SAFE so backup repairs demonstrably fire, VERDICT r4 #6 —
a stress row, not a Table-II parity row).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pstl_tpu import diffusion, sim, specs, train
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net

N_TEST_SCENES = 25     # matches the reference's curated list size


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "exps/e2e_v2/models"
    guidance = "--guidance" in sys.argv
    strict = "--strict" in sys.argv
    ref_parity = "--ref-parity" in sys.argv
    backup = "--backup" in sys.argv
    unsafe_fixture = "--unsafe-fixture" in sys.argv
    cache = None
    if "--cache" in sys.argv:
        cache = sys.argv[sys.argv.index("--cache") + 1]
    base = dict(n_randoms=64, n_neighbors=8, batch_size=16, flex=True,
                load_stlp=True, load_tj=True)
    cfg = Config(diffusion=True, rect_head=True, diverse_loss=True,
                 multi_cands=10, **base).finalize().with_(
                     epochs=1, test=True, n_rolls=3,
                     guidance=guidance, guidance_niters=3)
    if os.environ.get("CL_NOISE_SCALE"):
        cfg = cfg.with_(
            sample_noise_scale=float(os.environ["CL_NOISE_SCALE"]))
    if strict:
        # reference-exact step semantics (nusc_sim.py:118): no reversal
        # shield, speed may go negative
        cfg = cfg.with_(forward_shield=False, env_nonnegative_speed=False)
    if ref_parity:
        # the full one-switch deviation-reverting bundle (VERDICT r3 #4)
        cfg = cfg.ref_parity(open_loop=False)
    if backup:
        cfg = cfg.with_(backup=True)

    if cache:
        data = dict(np.load(cache, allow_pickle=False))
    else:
        # held-out scenes: a fresh seed never used for training data
        data = synthetic.generate_dataset(777, N_TEST_SCENES * 2, cfg,
                                          scene_len=38)
    # pre_check drops slow scenes (mean GT speed < 1 m/s, nusc_sim.py:34-39)
    keep = np.where(data["scene_ego_full"][:, :, 3].mean(-1)
                    >= 1.0)[0][:N_TEST_SCENES]
    data = {k: (v[keep] if k.startswith("scene_") else v)
            for k, v in data.items()}
    if unsafe_fixture:
        # a converging neighbor riding the GT corridor 2 frames ahead:
        # whatever lane-keeping plan the policy picks, its 2-step-ahead
        # pose lands near this box, forcing the backup trigger
        nei = np.array(data["scene_nei_full"])       # (bs, K, T, 7)
        ego = data["scene_ego_full"]                 # (bs, T, 4)
        T = ego.shape[1]
        ahead = ego[:, np.minimum(np.arange(T) + 2, T - 1)]
        nei[:, 0, :, 0] = 1.0
        nei[:, 0, :, 1:5] = ahead
        nei[:, 0, :, 5] = 6.0
        nei[:, 0, :, 6] = 6.0
        data["scene_nei_full"] = nei
    scenes = sim.scenes_from_dataset(data)

    net = Net(cfg)
    formulas = specs.build_scorer(cfg)
    coeffs = diffusion.get_coeffs(cfg)
    ds = SceneDataset(
        {k: v for k, v in data.items() if not k.startswith("scene_")}, cfg)
    sample = next(batch_iterator(ds, "val", 8, shuffle=False,
                                 drop_last=False))
    state = train.init_state(cfg, net, sample, jax.random.PRNGKey(0))
    state = train.load_params_only(ckpt, state)

    out = sim.run_closed_loop_host(
        jax.random.PRNGKey(0), scenes, cfg, net, state.params, formulas,
        coeffs, max_steps=36, record=True)
    # steady-state batched plan time (first step carries the compile)
    step_s = out["history"]["step_s"][1:] or out["history"]["step_s"]
    result = {
        "variant": ("ours_guidance" if guidance else "ours")
                   + ("_strict" if strict else "")
                   + ("_refparity" if ref_parity else "")
                   + ("_backup" if backup else "")
                   + ("_unsafe_fixture" if unsafe_fixture else "")
                   + ("_cache" if cache else ""),
        "compliance": round(float(out["stl_acc"].mean()), 4),
        "area": round(float(out["area"]), 4),
        "progress": round(float(out["progress"].mean()), 3),
        "collision": round(float(out["collide"].mean()), 4),
        "out_of_lane": round(float(out["out_of_lane"].mean()), 4),
        "mean_traj_len": round(float(out["traj_len"].mean()), 2),
        "repairs_fired": int(np.asarray(out["repairs"]).sum()),
        "plan_s_per_step_batch": round(float(np.median(step_s)), 4),
        "agent_steps_per_sec": round(
            len(keep) / float(np.median(step_s)), 2),
        "scenes": int(len(keep)),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
