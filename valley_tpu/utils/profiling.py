"""Profiling / tracing hooks.

The reference has none (SURVEY §5 — only DeepSpeed's unused
wall_clock_breakdown flag); here profiling is first-class:

* `start_server(port)` — on-demand `jax.profiler` endpoint for
  TensorBoard / xprof capture;
* `trace(logdir)` — context manager around a step range, producing a
  TPU trace viewable in TensorBoard;
* `StepTimer` — lightweight per-step wall-clock + throughput aggregation
  used by the trainer loop and the bench harness;
* `annotate(name)` — TraceAnnotation passthrough for labeling regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


def start_server(port: int = 9999):
    """Expose the profiler so `tensorboard --logdir` / xprof can capture."""
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing with percentile summary."""

    def __init__(self, window: int = 100):
        self.window = window
        self._durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self._durations.append(dt)
        if len(self._durations) > self.window:
            self._durations.pop(0)
        self._t0 = None
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        d = sorted(self._durations)
        n = len(d)
        return {
            "step_time_mean_s": sum(d) / n,
            "step_time_p50_s": d[n // 2],
            "step_time_p90_s": d[min(int(n * 0.9), n - 1)],
            "steps_per_s": n / sum(d),
        }
