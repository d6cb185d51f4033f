"""Tracing / profiling hooks.

The reference has no profiling beyond tqdm bars and wall-clock prints
(SURVEY.md §5).  TPU-native equivalents:

* ``trace(dir)`` — context manager around ``jax.profiler`` producing
  TensorBoard-loadable traces of the jit'd steps.
* ``StepTimer`` — device-synchronized wall-clock step timing.  NOTE: on
  tunneled/remote TPU backends ``block_until_ready`` can return before
  execution finishes; the timer syncs through a device→host transfer of a
  scalar probe, which is reliable everywhere.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hard_sync(x) -> float:
    """Reliable device sync: materialize one scalar on the host."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


class StepTimer:
    """Accumulates device-synced step durations."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result) -> float:
        hard_sync(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    def summary(self) -> str:
        if not self.times:
            return "no steps recorded"
        t = np.asarray(self.times)
        return (
            f"steps={len(t)} mean={t.mean()*1e3:.2f}ms "
            f"p50={np.percentile(t,50)*1e3:.2f}ms "
            f"p95={np.percentile(t,95)*1e3:.2f}ms"
        )
