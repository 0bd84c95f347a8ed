"""Benchmark session: per-swap device-synced wall times.

Mirrors reference utils/time.py:9-36 (CUDA-sync timing decorator printing
count/min/median/std to stderr). On TPU through the remote tunnel,
`block_until_ready` alone does not guarantee execution completed — a scalar
host fetch does, so callers pass a probe value to `lap`.
"""

from __future__ import annotations

import sys
import time
from typing import List

import numpy as np


class BenchSession:
    def __init__(self, name: str = "swap"):
        self.name = name
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def lap(self, probe=None):
        if probe is not None:
            float(np.asarray(probe).reshape(-1)[0])  # hard sync
        self.times.append(time.perf_counter() - self._t0)

    def report(self) -> dict:
        t = np.asarray(self.times)
        stats = {"n": len(t), "min": float(t.min()), "median": float(np.median(t)),
                 "std": float(t.std())}
        print(f"[bench:{self.name}] n={stats['n']} min={stats['min']:.3f}s "
              f"median={stats['median']:.3f}s std={stats['std']:.3f}s",
              file=sys.stderr)
        return stats
