"""Tracing / profiling hooks (SURVEY.md §5).

The reference has no profiling at all — its per-epoch timer result is
computed and discarded (trainer_masked.py:232-239). Here:

  * trace(dir) — jax.profiler context capturing a TensorBoard-loadable trace
    (XLA ops, HBM transfers, fusion boundaries) for the wrapped steps;
  * StepTimer — lightweight wall-clock aggregator with p50/p95 summaries,
    feeding the metrics JSONL sink so every run has throughput numbers.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """jax.profiler trace context; no-op when profile_dir is falsy."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer. Call tick() once per step; summary() returns
    mean/p50/p95 seconds and steps/sec for the metrics sink."""

    def __init__(self, capacity: int = 1000):
        self.capacity = capacity
        self._samples: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            if len(self._samples) >= self.capacity:
                self._samples.pop(0)
            self._samples.append(now - self._last)
        self._last = now

    def reset_epoch(self) -> None:
        self._last = None

    def summary(self) -> Dict[str, float]:
        if not self._samples:
            return {}
        s = sorted(self._samples)
        mean = statistics.mean(s)
        return {
            "step_time_mean_s": mean,
            "step_time_p50_s": s[len(s) // 2],
            "step_time_p95_s": s[min(len(s) - 1, int(len(s) * 0.95))],
            "steps_per_sec": (1.0 / mean) if mean > 0 else 0.0,
        }
