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


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace for the enclosed region::

        with profile_trace("/tmp/trace"):
            for _ in range(20):
                state, m = train_step(state, images, targets)
            jax.block_until_ready(m["loss"])
    """
    start_profiler_trace(log_dir)
    try:
        yield
    finally:
        stop_profiler_trace()


def compiled_cost_analysis(fn, *args) -> dict:
    """XLA's own cost model for a jitted function at given example args:
    total FLOPs, bytes accessed, and (when the backend reports it) an
    optimal-seconds estimate.

    CAVEAT: XLA counts each while/scan BODY ONCE, ignoring the trip
    count — for the AIR step (a max_steps-trip scan) the reported FLOPs
    understate per-step work. bench.py's MFU readout therefore uses the
    hoisting-aware analytic model (bench.analytic_flops_per_image), which
    was cross-checked against this on round-2 hardware runs.

    Returns {} keys absent if the backend provides no analysis.
    """
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        costs = compiled.cost_analysis()
    except Exception:
        return {}
    if not costs:
        return {}
    if isinstance(costs, (list, tuple)):   # some backends wrap in a list
        costs = costs[0]
    keep = {}
    for k in ("flops", "bytes accessed", "optimal_seconds",
              "utilization operand 0 {}", "transcendentals"):
        if k in costs:
            keep[k.replace(" ", "_")] = float(costs[k])
    # keep any hbm/output bytes breakdown keys too
    for k, v in costs.items():
        if "bytes accessed" in k and k not in keep:
            keep[k.replace(" ", "_")] = float(v)
    return keep


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
