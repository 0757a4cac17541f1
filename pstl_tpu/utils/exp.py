"""Experiment directories, reproducibility capsule, stdout tee.

Parity: ``setup_exp_and_logger`` (utils.py:286-350) — creates
exps/<name>/{viz,models}, snapshots the config, and tees stdout to a
timestamped log file.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime
from typing import Optional

from pstl_tpu.config import Config


class TeeLogger:
    def __init__(self, path: str):
        self.file = open(path, "a")
        self.stdout = sys.stdout

    def write(self, s):
        self.stdout.write(s)
        self.file.write(s)

    def flush(self):
        self.stdout.flush()
        self.file.flush()


def setup_exp_dir(cfg: Config, root: str = "exps",
                  tee: bool = True, snapshot_src: bool = True) -> str:
    name = cfg.exp_name or datetime.now().strftime("exp_%m%d_%H%M%S")
    full = os.path.join(root, name)
    for sub in ("viz", "models", "src"):
        os.makedirs(os.path.join(full, sub), exist_ok=True)
    if snapshot_src:
        # reproducibility capsule: snapshot the package source
        # (utils.py:335-345 behavior)
        import shutil
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for dirpath, _, files in os.walk(pkg):
            rel = os.path.relpath(dirpath, os.path.dirname(pkg))
            for f in files:
                if f.endswith(".py"):
                    dst = os.path.join(full, "src", rel)
                    os.makedirs(dst, exist_ok=True)
                    shutil.copy2(os.path.join(dirpath, f), dst)
    with open(os.path.join(full, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, default=str)
    with open(os.path.join(full, "cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv) + "\n")
    if tee:
        ts = datetime.now().strftime("%m%d-%H%M%S")
        sys.stdout = TeeLogger(os.path.join(full, f"log-{ts}.txt"))
    return full
