"""Two-process full-train-step worker (multi-host DP execution evidence).

One COMPLETE train_step (forward, STL losses, grads, optimizer update)
across 2 processes x 4 CPU devices: each process contributes half the
global batch; the gradient psum rides the global 8-device mesh, so both
processes must print IDENTICAL loss / updated-parameter checksums.

Launched twice (process_id 0 and 1) by
``tests/test_parallel.py::test_two_process_full_train_step`` and by
``__graft_entry__.dryrun_multichip`` (the driver's MULTICHIP artifact).

Usage: python scripts/two_proc_train_step.py <process_id> <coord_port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid,
                           local_device_ids=list(range(4)))

import numpy as np
import jax.numpy as jnp

from pstl_tpu import diffusion, specs, train
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net
from pstl_tpu.parallel import (make_mesh, replicate,
                               global_batch_from_local, local_rows)

cfg = Config(diffusion=True, rect_head=True, diverse_loss=True,
             multi_cands=2, n_randoms=2, n_neighbors=2, n_shards=2,
             diffusion_steps=5, guidance=False, compute_dtype="float32",
             flex=True).finalize().with_(epochs=1)
bs = 8
# seeded: both processes generate the SAME dataset, then slice their half
data = synthetic.generate_dataset(3, bs, cfg, scene_len=26)
ds = SceneDataset({k: v for k, v in data.items()
                   if not k.startswith("scene_")}, cfg)
ds.ensure_random_params(cfg.seed)
batch = next(batch_iterator(ds, "train", bs, shuffle=False, drop_last=False))
COLS = ("ego", "neighbors", "curr", "left", "right", "gt_", "params",
        "tj_scores", "pre_stlp")
batch = {k: np.asarray(v) for k, v in batch.items() if k.startswith(COLS)}

state = train.init_state(cfg, Net(cfg), batch, jax.random.PRNGKey(0))
opt = train.make_optimizer(cfg, state.params)
state = train.TrainState(state.params, opt.init(state.params), state.step)

mesh = make_mesh((-1,), ("data",))
assert mesh.shape["data"] == 8, mesh.shape
rows = local_rows(bs)                      # this process's half of the batch
gb = global_batch_from_local({k: v[rows] for k, v in batch.items()}, mesh)
state = jax.device_put(state, replicate(mesh))

step_fn = train.make_train_step(cfg, Net(cfg), specs.build_scorer(cfg),
                                diffusion.get_coeffs(cfg), opt)
new_state, rd = step_fn(state, gb, jax.random.PRNGKey(7))
loss = float(rd["loss"])
ck = float(sum(jnp.sum(jnp.abs(l)) for l in
               jax.tree_util.tree_leaves(new_state.params)))
assert np.isfinite(loss) and np.isfinite(ck)
assert int(new_state.step) == 1
print("TRAINSTEP", round(loss, 6), round(ck, 4), flush=True)
