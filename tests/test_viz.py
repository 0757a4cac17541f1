"""Visualization renderers produce files without touching the device."""

import os

import numpy as np
import pytest

from pstl_tpu import viz
from pstl_tpu.config import Config
from pstl_tpu.data import synthetic


@pytest.fixture(scope="module")
def scene_np():
    cfg = Config(n_randoms=2, n_neighbors=2)
    data = synthetic.generate_dataset(0, 2, cfg, scene_len=12)
    return cfg, data


def test_plot_scene_with_candidates(scene_np, tmp_path):
    cfg, data = scene_np
    rng = np.random.RandomState(0)
    cand = rng.randn(3, 3, cfg.nt, 2).astype(np.float32) * 5
    cand[..., 0] += data["ego_traj"][0, 0, 0]
    cand[..., 1] += data["ego_traj"][0, 0, 1]
    scores = rng.randn(3, 3).astype(np.float32)
    path = str(tmp_path / "scene.png")
    viz.save_scene(path, data, 0, cand_trajs=cand, cand_scores=scores,
                   title="test")
    assert os.path.getsize(path) > 1000


def test_control_histograms(scene_np, tmp_path):
    cfg, data = scene_np
    path = str(tmp_path / "hist.png")
    viz.plot_control_histograms(np.random.randn(100, cfg.nt, 2), path)
    assert os.path.exists(path)


def test_closed_loop_frame_and_gif(scene_np, tmp_path):
    cfg, data = scene_np
    frames = []
    for t in range(2):
        p = str(tmp_path / f"f{t}.png")
        viz.render_closed_loop_frame(
            p, data["scene_center_dense"][0], data["scene_lane_valids"][0],
            data["scene_ego_full"][0, :t + 2],
            data["scene_nei_full"][0, :, t],
            data["scene_ego_full"][0, t:t + 5])
        frames.append(p)
    gif = str(tmp_path / "ep.gif")
    viz.generate_gif(gif, frames)
    assert os.path.getsize(gif) > 100


def test_paper_and_training_viz(tmp_path):
    import numpy as np
    from pstl_tpu import viz
    from pstl_tpu.config import Config
    from pstl_tpu.data import synthetic
    cfg = Config(n_neighbors=2, n_randoms=2)
    data = synthetic.generate_dataset(0, 2, cfg, scene_len=24)
    rng = np.random.RandomState(0)
    M, T = 3, cfg.nt
    trajs = np.cumsum(rng.randn(M, 3, T, 4) * 0.3, axis=2) \
        + data["ego_traj"][0, 0, :4]
    scores = rng.randn(M, 3)
    p1 = str(tmp_path / "paper.png")
    viz.plot_paper_scene(p1, data, 0, nn_trajs=trajs, nn_scores=scores)
    p2 = str(tmp_path / "train.png")
    viz.plot_training_viz(p2, data, 0, tj_trajs=trajs, tj_scores=scores,
                          nn_trajs=trajs, nn_scores=scores, epoch=3)
    import os
    assert os.path.getsize(p1) > 5000 and os.path.getsize(p2) > 5000
    # with per-sample drivable rasters present (the eval/train hooks inject
    # them from the per-scene store via traj_i), the backdrop draws
    data2 = dict(data)
    ti = np.asarray(data["traj_i"]).astype(int).reshape(-1)
    drv = np.zeros((2, 40, 40), bool)
    drv[:, 15:25, :] = True
    data2["scene_drivable"] = drv[ti]
    data2["scene_drivable_origin"] = np.tile(
        data["ego_traj"][:1, 0, :2] - 10.0, (len(ti), 1)).astype(np.float32)
    data2["scene_drivable_res"] = np.full((len(ti),), 0.5, np.float32)
    p3 = str(tmp_path / "paper_raster.png")
    viz.plot_paper_scene(p3, data2, 0, nn_trajs=trajs, nn_scores=scores)
    assert os.path.getsize(p3) > 5000
