"""Profiling/tracing hooks (SURVEY §5.1: the reference only has wall-clock
prints; the TPU build gets real traces).

- trace(): context manager around jax.profiler.trace — produces a TensorBoard
  / Perfetto trace of device execution.
- StepTimer: lightweight steady-state step timing with compile-step exclusion
  and percentile summary, for throughput reporting without a full trace.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._times: list[float] = []
        self._last: float | None = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.skip_first:
                self._times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps_per_sec": float(1.0 / arr.mean()),
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p95": float(np.percentile(arr, 95) * 1e3),
        }
