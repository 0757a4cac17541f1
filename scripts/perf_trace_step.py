"""Device-op profile of the FULL closed-loop step (bench configuration)."""
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pstl_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pstl_tpu import diffusion, sim, specs
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu.models import Net

cfg = Config(diffusion=True, rect_head=True, diverse_loss=True,
             multi_cands=10, guidance=True, guidance_niters=3,
             n_rolls=3, n_randoms=64, n_neighbors=8,
             flex=True).finalize().with_(epochs=1, test=True)
if not os.environ.get("P_EXACT_SEL"):    # mirror bench.py's default
    cfg = cfg.with_(guidance_reuse_selection=True)
gp = os.environ.get("P_GPALLAS", "2")    # mirror bench.py's default
if gp != "0":
    cfg = cfg.with_(
        guidance_pallas=True,
        guidance_pallas_fuse_freeze=gp.startswith("2"),
        guidance_pallas_fold=gp.endswith("f")).finalize()
if os.environ.get("BENCH_GEOM_DTYPE"):
    cfg = cfg.with_(geometry_dtype=os.environ["BENCH_GEOM_DTYPE"])
if os.environ.get("BENCH_ROB_DTYPE"):
    cfg = cfg.with_(robustness_dtype=os.environ["BENCH_ROB_DTYPE"])
if os.environ.get("BENCH_NO_CM"):
    cfg = cfg.with_(cm_sampler=False)
if os.environ.get("BENCH_SCAN_UNROLL"):
    cfg = cfg.with_(
        diffusion_scan_unroll=int(os.environ["BENCH_SCAN_UNROLL"]))
bs = int(os.environ.get("BENCH_SCENES", "16"))
data = synthetic.generate_dataset(0, bs, cfg, scene_len=38)
scenes = sim.scenes_from_dataset(data)
net = Net(cfg)
formulas = specs.build_scorer(cfg)
coeffs = diffusion.get_coeffs(cfg)
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
init_carry, step = sim.make_closed_loop_step(scenes, cfg, net, params,
                                             formulas, coeffs)
c = jax.block_until_ready(step(init_carry(jax.random.PRNGKey(0))))
c = step(c)
c = jax.block_until_ready(step(c))

tdir = "/tmp/pstl_trace_step"
os.system(f"rm -rf {tdir}")
NRUN = 3
with jax.profiler.trace(tdir):
    for _ in range(NRUN):
        c = step(c)
    jax.block_until_ready(c.ego)

paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
pd = jax.profiler.ProfileData.from_file(paths[0])
dur = defaultdict(float)
cnt = defaultdict(int)
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            d = (ev.end_ns - ev.start_ns) / 1e3
            dur[ev.name] += d
            cnt[ev.name] += 1
tot = sum(v for k, v in dur.items() if not k.startswith("jit_"))
print(f"per call wall: see bench; top ops ({NRUN} calls):")
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{d/NRUN/1e3:9.3f} ms/call x{cnt[name]//NRUN:5d}  {name[:100]}")
