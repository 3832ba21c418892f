"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock deltas every 10 iterations
(``train_gen.py:331-343``); gstx keeps that log-line format (core/logging)
and adds first-class device tracing via ``jax.profiler`` (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(trace_dir: Optional[str], enabled: bool = True):
    """Capture a device trace viewable in TensorBoard/XProf.

    with trace("/tmp/gstx_trace"):
        run_steps()
    """
    if not enabled or not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall timing with simple aggregates (p50/p90/mean)."""

    def __init__(self):
        self._times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> dict:
        if not self._times:
            return {}
        xs = sorted(self._times)
        n = len(xs)
        return {
            "steps": n,
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p90_s": xs[min(n - 1, int(n * 0.9))],
            "total_s": sum(xs),
        }


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
