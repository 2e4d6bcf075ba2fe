"""Profiling/tracing utilities (SURVEY.md §5: the reference has only
wall-clock rays/s counters, trainer.py:301,351; the TPU build adds
jax.profiler device traces + named-scope timers)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named scope that shows up in profiler timelines."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Blocking wall-clock timer with running stats (rays/s counters)."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *a):
        self.times.append(time.time() - self._t0)

    def block_and_stop(self, x):
        jax.block_until_ready(x)
        self.times.append(time.time() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def rays_per_sec(self, num_rays: int) -> float:
        return num_rays / max(self.mean, 1e-9)
