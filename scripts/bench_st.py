#!/usr/bin/env python
"""Micro-benchmark: XLA separable ST vs Pallas kernels.

Measures the write+masked-accumulate composite (the SURVEY §7.7 fusion
target) and the read resample, forward and forward+backward, at the
default and scaled AIR shapes. Prints one JSON line per case.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, steps=1500, warmup=20, repeats=3):
    """Slope-timed HOST ms/call via bench.slope_time (fetch-terminated
    chains; see RESULTS.md round-2 measurement note). These ops are tiny
    (tens of us), so long chains are needed to beat the tunnel's +-10 ms
    latency jitter — and even then per-call DISPATCH (~0.15 ms) dominates
    the result; use device_time() below for pure device per-op time."""
    from bench import slope_time, _fetch
    _fetch(fn(*args))
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    return slope_time(lambda i: fn(*args), max(steps // 5, 5), steps,
                      max(3, repeats)) * 1e3   # ms


def device_time(step_fn, init_carry, iters=4000, repeats=5):
    """Pure DEVICE per-op milliseconds: execute the op ``iters`` times
    inside ONE jitted lax.scan whose carry feeds the next call (defeats
    loop-invariant hoisting), so the tunnel's dispatch+readback cost is
    paid once per measurement instead of once per op. Slope between two
    scan lengths cancels that constant; median of ``repeats``."""
    import jax
    from bench import _fetch as fetch

    def make(n):
        def body(c, _):
            return step_fn(c), None
        return jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])

    k1, k2 = iters // 5, iters
    f1, f2 = make(k1), make(k2)
    fetch(f1(init_carry))
    fetch(f2(init_carry))
    slopes = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fetch(f1(init_carry))
        t1 = time.perf_counter()
        fetch(f2(init_carry))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    slopes.sort()
    med = slopes[len(slopes) // 2]
    if med <= 0.0:
        # noise-dominated measurement — flag it rather than reporting an
        # impossibly perfect 0.0 per-op time (ADVICE r2)
        return float("nan")
    return med * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from air_tpu.ops.transformer import attention_write, attention_read
    from air_tpu.kernels.st_fused import fused_write_accumulate
    from air_tpu.kernels.st_inline import (
        inline_attention_read, inline_write_accumulate)
    from air_tpu.kernels.st_pallas import pallas_attention_read

    cases = [
        ("default", 64, 50, 28),
        ("scaled", 1024, 100, 28),
    ]
    for name, b, cs, ws in cases:
        rng = np.random.default_rng(0)
        canvas = jnp.asarray(rng.uniform(size=(b, cs * cs)).astype(np.float32))
        windows = jnp.asarray(rng.uniform(size=(b, ws, ws)).astype(np.float32))
        images = jnp.asarray(rng.uniform(size=(b, cs, cs)).astype(np.float32))
        s = jnp.asarray(rng.uniform(0.2, 0.9, b).astype(np.float32))
        x = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
        y = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
        coeff = jnp.asarray(rng.uniform(0.0, 1.0, b).astype(np.float32))

        def xla_wacc(canvas, windows, s, x, y, coeff):
            wr = attention_write(windows, s, x, y, cs)
            return canvas + coeff[:, None] * wr.reshape(b, cs * cs)

        def pallas_wacc(canvas, windows, s, x, y, coeff):
            return fused_write_accumulate(canvas, windows, s, x, y, coeff,
                                          cs, interpret=False)

        def inline_wacc(canvas, windows, s, x, y, coeff):
            return inline_write_accumulate(canvas, windows, s, x, y, coeff,
                                           cs, interpret=False)

        results = {"case": name, "batch": b, "canvas": cs, "window": ws,
                   "platform": jax.devices()[0].platform}
        for label, fn in (("xla", xla_wacc), ("pallas", pallas_wacc),
                          ("inline", inline_wacc)):
            f = jax.jit(fn)
            results[f"write_acc_fwd_{label}_ms"] = round(
                timeit(f, canvas, windows, s, x, y, coeff,
                       steps=args.steps), 4)

            def loss(*a, _fn=fn):
                return jnp.sum(_fn(*a) ** 2)
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))
            results[f"write_acc_fwdbwd_{label}_ms"] = round(
                timeit(g, canvas, windows, s, x, y, coeff,
                       steps=args.steps), 4)

        def xla_read(images, s, x, y):
            return attention_read(images, s, x, y, ws)

        def pallas_read(images, s, x, y):
            return pallas_attention_read(images, s, x, y, ws,
                                         interpret=False)

        def inline_read(images, s, x, y):
            return inline_attention_read(images, s, x, y, ws,
                                         interpret=False)
        for label, fn in (("xla", xla_read), ("pallas", pallas_read),
                          ("inline", inline_read)):
            f = jax.jit(fn)
            results[f"read_fwd_{label}_ms"] = round(
                timeit(f, images, s, x, y, steps=args.steps), 4)

        # pure device time via in-scan chaining (host dispatch excluded —
        # at these op sizes the ~0.15 ms tunnel dispatch dominates the
        # per-call numbers above and hides the impl difference)
        results["device_write_acc_fwd_xla_ms"] = round(device_time(
            lambda c: xla_wacc(c, windows, s, x, y, coeff), canvas), 5)
        results["device_write_acc_fwd_pallas_ms"] = round(device_time(
            lambda c: pallas_wacc(c, windows, s, x, y, coeff), canvas), 5)
        results["device_write_acc_fwd_inline_ms"] = round(device_time(
            lambda c: inline_wacc(c, windows, s, x, y, coeff), canvas), 5)
        results["device_read_fwd_xla_ms"] = round(device_time(
            lambda c: c + jnp.pad(
                xla_read(images + c.ravel()[0] * 1e-20, s, x, y)
                .reshape(b, ws, ws), ((0, 0), (0, cs - ws), (0, cs - ws))
            ).reshape(b, cs * cs) * 1e-20, canvas), 5)
        results["device_read_fwd_pallas_ms"] = round(device_time(
            lambda c: c + jnp.pad(
                pallas_read(images + c.ravel()[0] * 1e-20, s, x, y)
                .reshape(b, ws, ws), ((0, 0), (0, cs - ws), (0, cs - ws))
            ).reshape(b, cs * cs) * 1e-20, canvas), 5)
        results["device_read_fwd_inline_ms"] = round(device_time(
            lambda c: c + jnp.pad(
                inline_read(images + c.ravel()[0] * 1e-20, s, x, y)
                .reshape(b, ws, ws), ((0, 0), (0, cs - ws), (0, cs - ws))
            ).reshape(b, cs * cs) * 1e-20, canvas), 5)

        print(json.dumps(results))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
