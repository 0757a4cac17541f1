"""Open-loop evaluation harness smoke test (tiny shapes, CPU)."""

import numpy as np
import jax
import pytest

from pstl_tpu import eval_openloop, train
from pstl_tpu.config import Config
from pstl_tpu.data.dataset import SceneDataset, batch_iterator
from pstl_tpu.models import Net


@pytest.mark.slow
def test_eval_runs_and_reports():
    cfg = Config(diffusion=True, rect_head=True, diverse_loss=True,
                 multi_cands=2, n_randoms=2, sampling_size=2, n_shards=2,
                 n_neighbors=2, diffusion_steps=6, batch_size=4,
                 compute_dtype="float32",
                 flex=True).finalize().with_(epochs=1, test=True)
    ds = SceneDataset.from_synthetic(cfg, n_scenes=12)
    ds.ensure_random_params(0)
    net = Net(cfg)
    sample = next(batch_iterator(ds, "val", 4, shuffle=False,
                                 drop_last=False))
    state = train.init_state(cfg, net, sample, jax.random.PRNGKey(0))
    out = eval_openloop.run(cfg, ds, state.params, net=net, n_trials=0,
                            log=lambda *a: None)
    for k in ("tj_acc", "nn_acc", "nn_scene_acc", "nn_ade", "nn_fde",
              "nn_std", "nn_vol", "nn_area", "time"):
        assert k in out, (k, sorted(out))
        assert np.isfinite(out[k]), (k, out[k])
    # trajopt reference row from random controls scores low but is defined
    assert 0.0 <= out["tj_acc"] <= 1.0
    assert 0.0 <= out["nn_acc"] <= 1.0
