"""CLI: preset listing, config overrides, data/trajopt round trip."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from pstl_tpu import cli
from pstl_tpu.config import PRESETS


def test_presets_complete():
    for name in ("e0_cache", "e1_trajopt", "e3_vae", "e4_ddpm_mono",
                 "e5_ddpm", "e7_ours", "e8_stl", "ours_guidance"):
        assert name in PRESETS, name
    e7 = PRESETS["e7_ours"]
    assert e7.diffusion and e7.rect_head and e7.diverse_loss
    assert e7.multi_cands == 5
    # coupling rules applied
    assert e7.interval and e7.diffusion_clip and e7.diff_full
    og = PRESETS["ours_guidance"]
    assert og.guidance and og.n_rolls == 3 and og.multi_cands == 10


def test_config_overrides(tmp_path):
    out = str(tmp_path / "c.npz")
    cli.main(["data", "--out", out, "--scenes", "6",
              "--set", "n_randoms=2", "n_neighbors=2"])
    import numpy as np
    with np.load(out) as f:
        assert f["ego_traj"].shape[0] == 6
        assert f["neighbors"].shape[1] == 2


@pytest.mark.slow
def test_data_then_trajopt(tmp_path):
    cache = str(tmp_path / "cache.npz")
    aug = str(tmp_path / "aug.npz")
    cli.main(["data", "--out", cache, "--scenes", "6",
              "--set", "n_randoms=2", "n_neighbors=2"])
    cli.main(["trajopt", "--cache", cache, "--out", aug, "--iters", "5",
              "--set", "n_randoms=2", "n_neighbors=2", "batch_size=6"])
    with np.load(aug) as f:
        assert "params" in f.files and "tj_scores_prior" in f.files


@pytest.mark.slow
def test_cli_sim_smoke(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cli.main(["sim", "--scenes", "2", "--scene-len", "8", "--steps", "2",
              "--set", "n_randoms=2", "n_neighbors=2", "diffusion=true",
              "diffusion_steps=4", "compute_dtype=float32",
              "batch_size=2"])
    out = capsys.readouterr().out
    assert '"collide"' in out and '"progress"' in out


@pytest.mark.slow
def test_cli_eval_smoke(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cache = str(tmp_path / "c.npz")
    cli.main(["data", "--out", cache, "--scenes", "8",
              "--set", "n_randoms=2", "n_neighbors=2"])
    cli.main(["eval", "--cache", cache, "--trials", "0",
              "--set", "n_randoms=2", "n_neighbors=2", "sampling_size=2",
              "diffusion=true", "diffusion_steps=4",
              "compute_dtype=float32", "batch_size=4"])
    out = capsys.readouterr().out
    assert '"nn_acc"' in out


def test_cli_check_smoke(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cache = str(tmp_path / "c.npz")
    cli.main(["data", "--out", cache, "--scenes", "8",
              "--set", "n_randoms=2", "n_neighbors=2"])
    cli.main(["check", "--cache", cache,
              "--set", "n_randoms=2", "n_neighbors=2", "batch_size=4"])
    out = capsys.readouterr().out
    assert "ACC:" in out


@pytest.mark.slow
def test_cli_sim_test_aggressive(tmp_path, capsys, monkeypatch):
    """--test_aggressive: 3 repeats of one scene under the per-episode
    aggressive stlp presets (nusc_sim.py:444-465)."""
    monkeypatch.chdir(tmp_path)
    cli.main(["sim", "--scenes", "1", "--scene-len", "8", "--steps", "2",
              "--set", "n_randoms=2", "n_neighbors=2", "diffusion=true",
              "diffusion_steps=4", "compute_dtype=float32",
              "batch_size=2", "test_aggressive=true"])
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    assert '"collide"' in out
    # agent_steps counts 3 episodes (the tripled scene)
    assert res["traj_len"] >= 0 and res["agent_steps"] <= 3 * 2


def test_cli_sim_consumes_cache_with_episode_list(tmp_path, capsys,
                                                  monkeypatch):
    """The extract->sim loop: `cli sim --cache` feeds scene_* tensors
    through scenes_from_dataset, and --episodes selects declared
    (scene, ti) pairs (the reference's curated [traj, ti] protocol,
    nusc_dataset.py:38-72 / nusc_sim.py:356-390)."""
    monkeypatch.chdir(tmp_path)
    cache = str(tmp_path / "scenes.npz")
    cli.main(["data", "--out", cache, "--scenes", "3", "--scene-len", "10",
              "--set", "n_randoms=2", "n_neighbors=2"])
    with np.load(cache) as f:
        assert "scene_ego_full" in f.files and "scene_lanes_t" in f.files
    eps = tmp_path / "episodes.txt"
    eps.write_text("# scene ti rationale\n0 0\n2 3  # late start\n1\n")
    cli.main(["sim", "--cache", cache, "--episodes", str(eps),
              "--steps", "2",
              "--set", "n_randoms=2", "n_neighbors=2", "diffusion=true",
              "diffusion_steps=4", "compute_dtype=float32",
              "batch_size=2"])
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    assert '"collide"' in out
    assert res["agent_steps"] <= 3 * 2          # 3 declared episodes


def test_cli_sim_cache_test_aggressive(tmp_path, capsys, monkeypatch):
    """--test_aggressive reproduces 'same scene x3 presets' from a CACHE
    (nusc_sim.py:444-465's scene 781 x3), not only synthetic."""
    monkeypatch.chdir(tmp_path)
    cache = str(tmp_path / "scenes.npz")
    cli.main(["data", "--out", cache, "--scenes", "2", "--scene-len", "10",
              "--set", "n_randoms=2", "n_neighbors=2"])
    cli.main(["sim", "--cache", cache, "--steps", "2", "--no-pre-check",
              "--set", "n_randoms=2", "n_neighbors=2", "diffusion=true",
              "diffusion_steps=4", "compute_dtype=float32",
              "batch_size=2", "test_aggressive=true"])
    out = capsys.readouterr().out
    res = json.loads(out[out.index("{"):])
    assert res["agent_steps"] <= 3 * 2          # tripled first cache scene


def test_new_round2_presets():
    for name in ("e2_vae_mono", "e6_trafficsim", "ctg", "ours_guidance_sim"):
        assert name in PRESETS, name
    e2 = PRESETS["e2_vae_mono"]
    assert e2.vae and e2.gt_data_training and e2.bc_weight == 1.0
    e6 = PRESETS["e6_trafficsim"]
    assert e6.vae and e6.collision_loss == 1.0 and e6.stl_weight == 1.0
    ctg = PRESETS["ctg"]
    assert ctg.guidance and not ctg.rect_head
    ogs = PRESETS["ours_guidance_sim"]
    assert ogs.guidance_before == 10 and ogs.guidance_niters == 1 \
        and ogs.guidance_lr == 0.04 and ogs.test_scenes
