"""Running-average meters and a named-interval wall-clock profiler.

Parity: ``MeterDict`` (utils.py:353-385) and ``MyTimer`` (utils.py:112-147).
"""

from __future__ import annotations

import time
from typing import Dict


class MeterDict:
    def __init__(self):
        self.cur: Dict[str, float] = {}
        self.sum: Dict[str, float] = {}
        self.count: Dict[str, int] = {}

    def update(self, key: str, val: float, n: int = 1):
        self.cur[key] = val
        self.sum[key] = self.sum.get(key, 0.0) + val * n
        self.count[key] = self.count.get(key, 0) + n

    def avg(self, key: str) -> float:
        return self.sum[key] / max(self.count[key], 1)

    def __contains__(self, key):
        return key in self.cur

    def __getitem__(self, key):
        return self.cur[key]

    def __call__(self, key):
        return self.avg(key)

    def summary(self, keys=None) -> str:
        keys = keys or sorted(self.cur)
        return " ".join(f"{k}:{self.cur[k]:.3f}({self.avg(k):.3f})"
                        for k in keys)


class Timer:
    """Accumulates average durations between named marks."""

    def __init__(self):
        self.stamp: Dict[str, float] = {}
        self.total: Dict[str, float] = {}
        self.count: Dict[str, int] = {}
        self.last = None

    def add(self, key: str):
        now = time.time()
        if self.last is not None:
            name = f"{self.last}->{key}"
            self.total[name] = self.total.get(name, 0.0) + now - self.stamp[self.last]
            self.count[name] = self.count.get(name, 0) + 1
        self.stamp[key] = now
        self.last = key

    def report(self) -> str:
        return " ".join(f"{k}:{self.total[k]/self.count[k]:.3f}s"
                        for k in self.total)
