#!/usr/bin/env python
"""Profile one AIR train step: XLA cost analysis + optional device trace.

Prints a JSON summary (FLOPs, bytes, measured step time, implied
FLOP/s and HBM bandwidth) and, with --trace DIR, captures a
perfetto/TensorBoard-readable device trace of 20 steady-state steps.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--config", default="default",
                   choices=["default", "scaled", "harder"])
    p.add_argument("--trace", default=None,
                   help="directory for a jax.profiler device trace")
    p.add_argument("--steps", type=int, default=50)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from bench import get_config, slope_time, _fetch
    from air_tpu.train.state import create_train_state
    from air_tpu.train.steps import make_train_step
    from air_tpu.utils.profiling import (
        compiled_cost_analysis, profile_trace, trace_annotation)

    CFG = get_config(args.config)
    rng = np.random.default_rng(0)
    # device-resident inputs: feeding numpy would time the host->device
    # transfer over the tunnel (~27 ms for the scaled batch), not the step
    images = jnp.asarray(rng.uniform(
        size=(args.batch_size, CFG.canvas_size ** 2)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 3, args.batch_size)
                          .astype(np.int32))
    state = create_train_state(CFG, rng=0)
    step_fn = make_train_step(CFG, donate=False)

    costs = compiled_cost_analysis(
        lambda st, im, tg: step_fn(st, im, tg), state, images, targets)

    # slope-timed (value-fetch-terminated chains — block_until_ready does
    # not await device completion over the axon tunnel, RESULTS.md)
    box = [state]

    def run_once(i):
        box[0], m = step_fn(box[0], images, targets)
        return m["loss"]

    _fetch(run_once(0))
    for i in range(5):
        out = run_once(i)
    _fetch(out)
    per_step = slope_time(run_once, max(args.steps // 5, 5), args.steps, 3)
    state = box[0]
    summ = {"mean_step_ms": per_step * 1e3,
            "items_per_sec": args.batch_size / per_step}

    if args.trace:
        with profile_trace(args.trace):
            for i in range(20):
                with trace_annotation(f"train_step_{i}"):
                    state, out = step_fn(state, images, targets)
            jax.block_until_ready(out["loss"])
        print(f"trace written to {args.trace} (open in TensorBoard "
              f"profile plugin or perfetto)", file=sys.stderr)

    step_s = summ["mean_step_ms"] / 1e3
    report = {
        "config": args.config,
        "batch_size": args.batch_size,
        "device": str(jax.devices()[0]),
        "mean_step_ms": round(summ["mean_step_ms"], 4),
        "images_per_sec": round(summ["items_per_sec"], 1),
    }
    if "flops" in costs:
        report["xla_flops_per_step"] = costs["flops"]
        report["achieved_tflops"] = round(costs["flops"] / step_s / 1e12, 3)
    if "bytes_accessed" in costs:
        report["xla_bytes_per_step"] = costs["bytes_accessed"]
        report["achieved_hbm_gbps"] = round(
            costs["bytes_accessed"] / step_s / 1e9, 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
