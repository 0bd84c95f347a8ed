"""Tracing/profiling helpers.

The reference's only tracing is a CUDA-synced timing decorator
(utils/time.py:9-36; SURVEY.md §5.1). Here: named trace annotations that
show up in TPU profiler timelines, a trace-capture context manager, and the
scalar-probe timing primitive used by bench.py (block_until_ready does not
hard-sync through the axon tunnel — a host scalar fetch does).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (wraps TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str | Path) -> Iterator[None]:
    """Capture a TPU/XLA trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn, *args, probe=None) -> float:
    """Wall-clock one call, hard-synced by fetching a scalar to the host.

    `probe(out) -> scalar array` extracts the sync scalar; defaults to the
    first leaf's first element.
    """
    t0 = time.perf_counter()
    out = fn(*args)
    leaf = probe(out) if probe is not None else jax.tree.leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])
    return time.perf_counter() - t0
