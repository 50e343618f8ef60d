"""Profiling hooks: jax.profiler traces + simple step timers.

The reference has no profiling at all (SURVEY §5). Here any task can be
wrapped in an XPlane trace for TensorBoard / xprof, and the train loop
reports steps/sec.

Usage:
    with trace_if(enabled, logdir):
        ... run steps ...
or set ``profile: {enable: true, logdir: ..., start: 10, num_steps: 20}``
in a training config (tasks/train_task.py hooks it up).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_if(enabled: bool, logdir: str = "/tmp/spnerf_trace"):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running steps/sec + examples/sec, cheap enough to call every step."""

    def __init__(self, window: int = 100):
        self.window = window
        self._t0 = time.perf_counter()
        self._count = 0
        self.steps_per_sec = 0.0

    def tick(self, n: int = 1) -> float | None:
        self._count += n
        if self._count >= self.window:
            now = time.perf_counter()
            self.steps_per_sec = self._count / (now - self._t0)
            self._t0 = now
            self._count = 0
            return self.steps_per_sec
        return None
