"""Profiling hooks (SURVEY.md §5 tracing rebuild): jax.profiler traces +
per-step timing, switchable from configs/CLI flags."""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec reporter for train loops."""

    def __init__(self, every: int = 100):
        self.every = every
        self._t0 = time.perf_counter()
        self._count = 0

    def tick(self) -> float | None:
        self._count += 1
        if self._count % self.every == 0:
            now = time.perf_counter()
            rate = self.every / (now - self._t0)
            self._t0 = now
            return rate
        return None
