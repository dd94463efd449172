"""Tracing / profiling utilities (SURVEY.md §5).

The reference has no profiling beyond stdout logging (reference
training.py:226). Here: ``jax.profiler`` trace capture (perfetto/
tensorboard-readable), named trace annotations around steps, and a
steady-state step timer that separates compile from execution — the
throughput counters behind bench.py's images/sec metric.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profiler_trace(log_dir: str):
    """Begin capturing a device trace viewable in TensorBoard/perfetto."""
    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics with warmup separation.

    Usage::

        timer = StepTimer(warmup=3)
        for batch in loader:
            with timer.step(batch_size):
                out = train_step(...)
                jax.block_until_ready(out)
        print(timer.summary())
    """

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: list[float] = []
        self.items: list[int] = []

    @contextlib.contextmanager
    def step(self, n_items: int = 1):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)
        self.items.append(n_items)

    def summary(self) -> dict:
        times = self.times[self.warmup:] or self.times
        items = self.items[self.warmup:] or self.items
        total = sum(times)
        return {
            "steps": len(times),
            "mean_step_ms": 1000.0 * total / max(len(times), 1),
            "items_per_sec": sum(items) / total if total else 0.0,
            "first_step_ms": 1000.0 * self.times[0] if self.times else 0.0,
        }
