"""Profiling hooks: XLA trace capture + per-step wall timing.

The reference has no profiling beyond an unused manual timer
(/root/reference/lib/funcs_utils.py:34-49, SURVEY.md §5). Here:
- ``trace(logdir)`` wraps a region in a ``jax.profiler`` trace whose
  output loads in TensorBoard/Perfetto (device timeline, HLO cost);
- ``StepTimer`` tracks steady-state step times with warmup exclusion —
  the number that matters for MXU utilization work.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)

    @property
    def steady_times(self) -> np.ndarray:
        return np.asarray(self._times[self.warmup:])

    def summary(self) -> dict:
        t = self.steady_times
        if len(t) == 0:
            return {"steps": len(self._times)}
        return {
            "steps": len(self._times),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
        }
