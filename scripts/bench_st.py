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


def timeit(fn, *args, steps=200, warmup=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3   # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from air_tpu.ops.transformer import attention_write, attention_read
    from air_tpu.kernels.st_fused import fused_write_accumulate
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

        results = {"case": name, "batch": b, "canvas": cs, "window": ws,
                   "platform": jax.devices()[0].platform}
        for label, fn in (("xla", xla_wacc), ("pallas", pallas_wacc)):
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
        for label, fn in (("xla", xla_read), ("pallas", pallas_read)):
            f = jax.jit(fn)
            results[f"read_fwd_{label}_ms"] = round(
                timeit(f, images, s, x, y, steps=args.steps), 4)

        print(json.dumps(results))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
