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


def test_data_then_trajopt(tmp_path):
    cache = str(tmp_path / "cache.npz")
    aug = str(tmp_path / "aug.npz")
    cli.main(["data", "--out", cache, "--scenes", "6",
              "--set", "n_randoms=2", "n_neighbors=2"])
    cli.main(["trajopt", "--cache", cache, "--out", aug, "--iters", "5",
              "--set", "n_randoms=2", "n_neighbors=2", "batch_size=6"])
    with np.load(aug) as f:
        assert "params" in f.files and "tj_scores_prior" in f.files


def test_cli_sim_smoke(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cli.main(["sim", "--scenes", "2", "--scene-len", "8", "--steps", "2",
              "--set", "n_randoms=2", "n_neighbors=2", "diffusion=true",
              "diffusion_steps=4", "compute_dtype=float32",
              "batch_size=2"])
    out = capsys.readouterr().out
    assert '"collide"' in out and '"progress"' in out


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
