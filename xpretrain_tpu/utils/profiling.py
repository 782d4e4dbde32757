"""Profiling and step-time instrumentation.

The reference's only instrumentation is a one-off thop FLOPs count
(``hd-vila/src/modeling/e2e_model.py:262-268``) and wall-clock prints; this
module provides the TPU-native equivalents (SURVEY.md §5.1):

- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  compatible profile directory (works over the axon tunnel).
- :class:`StepTimer` — steady-state step-time/throughput meter with
  compile-step exclusion and percentile summary.
- :func:`flops_estimate` — analytic FLOPs via ``jax.jit(...).lower().cost_analysis``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

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
    """Track per-step wall time; first ``skip`` steps (compiles) excluded."""

    def __init__(self, skip: int = 2):
        self.skip = skip
        self.times: list[float] = []
        self._last: float | None = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.skip:
                self.times.append(now - self._last)
        self._last = now

    def summary(self, items_per_step: int = 1) -> dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_s": float(1.0 / arr.mean()),
            "items_per_s": float(items_per_step / arr.mean()),
        }


def flops_estimate(fn: Callable, *args) -> float:
    """Analytic FLOPs of a jitted callable on example args (0 if unavailable)."""
    import jax

    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0
