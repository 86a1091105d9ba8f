"""Profiling / tracing utilities.

The reference has no profiling support (SURVEY section 5); the closest
artifacts are a ptflops report in the DB-AIAT self-test.  TPU-native
replacements:

* :class:`StepTimer` — rolling step-time / throughput statistics;
* :func:`trace` — context manager around ``jax.profiler`` trace capture
  (view with TensorBoard or Perfetto);
* :func:`flops_estimate` — XLA cost analysis of a jitted function
  (the ptflops analog).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Optional


class StepTimer:
    """Rolling mean/max of step wall-times with items/sec."""

    def __init__(self, window: int = 50):
        self._times: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns the last step duration (s)."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def items_per_sec(self, batch_size: int) -> float:
        return batch_size / self.mean if self.mean else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn, *args) -> Optional[float]:
    """XLA's FLOP estimate for ``jit(fn)(*args)`` (None if unavailable)."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    try:
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops")) if analysis else None
    except Exception:
        return None


def nan_guard(enable: bool = True) -> None:
    """Enable jax NaN debugging (replaces the reference's hard NaN abort
    with compiler-level localization)."""
    import jax

    jax.config.update("jax_debug_nans", enable)
