#!/usr/bin/env python
"""Benchmark: AIR training throughput (images/sec) on the current device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

``vs_baseline`` divides by the reference-stand-in CPU throughput of the
same training step (the reference publishes no throughput numbers —
BASELINE.md: the CPU denominator must be measured locally; the TF1
reference itself cannot run in this image, so the semantically-identical
JAX step on one CPU host is the stand-in). The CPU number is cached in
baseline_cpu.json; pass --measure-cpu to refresh it (runs a subprocess
pinned to the CPU platform).

Config: the reference default training config (batch 64, 50x50 canvas,
3 steps, 256-LSTM — reference training.py:100-123). --batch-size to probe
other sizes; --eval to benchmark inference instead of training.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(HERE, "baseline_cpu.json")
REFERENCE_BATCH = 64       # the reference's batch (its training.py:14)


ST_IMPL = "xla"
# extra AIRConfig overrides applied by get_config (set from CLI flags:
# --adam-dtype, --unroll)
CFG_OVERRIDES = {}


def get_config(name: str):
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG
    DEFAULT_TRAINING_CONFIG = DEFAULT_TRAINING_CONFIG.replace(
        st_impl=ST_IMPL, **CFG_OVERRIDES)
    if name == "default":
        return DEFAULT_TRAINING_CONFIG
    if name == "scaled":
        # BASELINE.json config 4: 100x100 canvas, 512-LSTM, 100-dim VAE
        # latent, 28x28 window, batch 1024 on a single chip
        return DEFAULT_TRAINING_CONFIG.replace(
            canvas_size=100, rnn_units=512, vae_latent_dimensions=100)
    if name == "harder":
        # BASELINE.json config 3: 0-3 digits, max 5 steps, backgrounds
        return DEFAULT_TRAINING_CONFIG.replace(max_steps=5, max_digits=3)
    raise SystemExit(f"unknown --config {name}")


def analytic_flops_per_image(cfg, train: bool) -> float:
    """Analytic matmul FLOPs per image (2 x MACs) on the MINIMAL-work
    basis (the standard MFU convention): the recurrent input (raw image
    or CNN features) is re-fed UNCHANGED every scan step (reference
    air/air_model.py:286), so the input half of the LSTM gate matmul —
    by far the largest op — NEED only run once per image, and is counted
    once. Round-5 correction: XLA does NOT perform this hoist itself
    (the full concat-dot sits inside the compiled while body — optimized
    HLO inspection); the executed-FLOP count matches this model only
    under ``AIRConfig.rnn_input_hoist``, which performs the split
    explicitly (nn/lstm.py lstm_input_proj). Without the hoist the
    hardware does more work than counted here, so reported MFU
    understates device utilization but honestly states useful-work
    utilization.

    Training factors: hoisted terms whose input is DATA (the LSTM gate
    input half; the first CNN conv) run fwd + dW only (dX is not needed
    for input data) = 2x fwd; interior CNN convs (layers 2-3) must also
    backprop dX to the previous layer = 3x fwd; per-step terms run
    fwd + dX + dW = 3x fwd. Elementwise ops ignored (noise next to the
    matmuls)."""
    H = cfg.rnn_units
    cs, ws = cfg.canvas_size, cfg.windows_size
    # -- loop-invariant (once per image) --
    inv_macs = cfg.rnn_input_dim * 4 * H          # input part of the gates
    inv3_macs = 0.0           # hoisted terms that DO need dX in training
    if cfg.cnn:
        f = cfg.cnn_filters
        inv_macs += 25 * cs * cs * 1 * f                  # conv1 (on data)
        inv3_macs += 25 * ((cs // 2) ** 2 * f * f         # conv2
                           + (cs // 4) ** 2 * f * f)      # conv3
    # -- per scan step --
    macs = H * 4 * H                              # recurrent part of gates
    for hidden, out in ((cfg.scale_hidden_units, 1),
                        (cfg.scale_hidden_units, 1),
                        (cfg.shift_hidden_units, 2),
                        (cfg.shift_hidden_units, 2),
                        (cfg.z_pres_hidden_units, 1)):
        macs += H * hidden + hidden * out
    dims = [ws * ws, *cfg.vae_recognition_units]
    macs += sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    macs += 2 * dims[-1] * cfg.vae_latent_dimensions        # mean + logvar
    dims = [cfg.vae_latent_dimensions, *cfg.vae_generative_units, ws * ws]
    macs += sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    # separable ST: read Wy[ws,cs]@im[cs,cs] + tmp[ws,cs]@Wx^T[cs,ws];
    # write is the mirror image (ws<->cs swapped on the output side)
    macs += ws * cs * cs + ws * cs * ws        # read
    macs += cs * ws * ws + cs * ws * cs        # write
    inv_factor = 2.0 if train else 1.0
    step_factor = 3.0 if train else 1.0
    return 2.0 * (inv_macs * inv_factor
                  + inv3_macs * step_factor
                  + macs * cfg.max_steps * step_factor)


# Dense peak FLOP/s per chip for MFU. XLA executes fp32 dots as
# single-pass bf16 on TPU at default precision (verified: the dominant
# matmul slope-times at ~165 TF/s, 84% of the v5e bf16 peak — impossible
# on the fp32 path), so the bf16 peak is the honest denominator.
PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e11}


def _fetch(x):
    """Force REAL device completion by materializing a value on the host.
    On the axon-tunneled TPU, jax.block_until_ready acks BEFORE compute
    finishes (RESULTS.md round-2 measurement note) — naive block-based
    timing reports impossible speeds. Every timed window must end here.
    Accepts any pytree; fetches one scalar of its first leaf (device
    programs are single sequential streams, so one output's completion
    implies the dispatch chain ran)."""
    import numpy as np
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf)).ravel()[0]


def slope_time(run_once, k1: int, k2: int, repeats: int) -> float:
    """Steady-state seconds per call via the two-length slope method:
    time chains of k1 and k2 calls (each ended by a value fetch) and
    divide the difference — the tunnel's ~30-50 ms dispatch+readback
    base latency cancels. MEDIAN of ``repeats`` slopes (the jitter can
    produce negative single draws; a min would be biased fast); if even
    the median is non-positive the chain is noise-dominated and the
    conservative whole-chain mean T(k2)/k2 (base latency included) is
    returned instead."""
    if k2 <= k1:
        k1 = max(k2 // 2, 1)

    def chain(k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = run_once(i)
        _fetch(out)
        return time.perf_counter() - t0

    if k2 <= k1:
        # degenerate request (e.g. --steps 1): no slope possible — the
        # conservative whole-chain mean is the documented fallback
        return chain(k2) / k2
    slopes, t2_last = [], None
    for _ in range(max(1, repeats)):
        t1 = chain(k1)
        t2 = chain(k2)
        t2_last = t2
        slopes.append((t2 - t1) / (k2 - k1))
    slopes.sort()
    med = slopes[len(slopes) // 2]
    return med if med > 0 else t2_last / k2


def measure(batch_size: int, steps: int, warmup: int, eval_mode: bool,
            seed: int = 0, config: str = "default",
            repeats: int = 3) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from air_tpu.train.state import create_train_state
    from air_tpu.train.steps import make_train_step, make_eval_step
    CFG = get_config(config)

    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.uniform(
        size=(batch_size, CFG.canvas_size ** 2)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 3, batch_size).astype(np.int32))

    state = create_train_state(CFG, rng=seed)
    k1 = max(steps // 5, 5)
    if eval_mode:
        eval_step = make_eval_step(CFG)
        # constant key/step: per-call eager fold_in/zeros dispatches would
        # land in the slope and inflate a sub-ms eval step (review r3);
        # the program still executes every call — JAX does not memoize
        # dispatches — and the key only varies sampled noise
        key = jax.random.PRNGKey(0)
        step0 = jnp.zeros((), jnp.int32)

        def run_once(i):
            return eval_step(state.params, images, targets, key,
                             step0).per_example_loss
        tc0 = time.perf_counter()
        _fetch(run_once(0))
        compile_time = time.perf_counter() - tc0
        for i in range(warmup):
            _fetch(run_once(i)) if i == warmup - 1 else run_once(i)
        per_call = slope_time(run_once, k1, steps, repeats)
    else:
        train_step = make_train_step(CFG, donate=True)
        box = [state]

        def run_once(i):
            box[0], m = train_step(box[0], images, targets)
            return m["loss"]
        tc0 = time.perf_counter()
        _fetch(run_once(0))
        compile_time = time.perf_counter() - tc0
        for i in range(warmup):
            _fetch(run_once(i)) if i == warmup - 1 else run_once(i)
        per_call = slope_time(run_once, k1, steps, repeats)

    elapsed = per_call * steps
    ips = batch_size * steps / elapsed
    platform = jax.devices()[0].platform
    flops_im = analytic_flops_per_image(CFG, train=not eval_mode)
    achieved = ips * flops_im
    peak = PEAK_FLOPS.get(platform)
    return {
        "images_per_sec": ips,
        "step_ms": 1000.0 * elapsed / steps,
        "compile_s": compile_time,
        "platform": platform,
        "device": str(jax.devices()[0]),
        "batch_size": batch_size,
        "flops_per_image": flops_im,
        "achieved_tflops": achieved / 1e12,
        "mfu": (achieved / peak) if peak else None,
    }


def measure_fused(batch_size: int, K: int, warmup: int, seed: int = 0,
                  config: str = "default", repeats: int = 3,
                  pipeline_unroll: int = 1) -> dict:
    """The REAL training hot path: device-resident dataset with K steps
    fused per dispatch (air_tpu/train/fast_pipeline — what --device-data
    training runs). Per-step time = per-dispatch slope / K; dispatch
    overhead is amortized K-fold, so this is the framework's true
    steady-state training throughput."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from air_tpu.train.state import create_train_state
    from air_tpu.train.fast_pipeline import make_multi_step
    CFG = get_config(config)

    rng = np.random.default_rng(seed)
    n = batch_size * K
    images = jnp.asarray(rng.uniform(
        size=(n, CFG.canvas_size ** 2)).astype(np.float32))
    digits = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    perm = jnp.arange(n)
    state = create_train_state(CFG, rng=seed)
    multi = make_multi_step(CFG, K, batch_size,
                            pipeline_unroll=pipeline_unroll)
    box = [state]

    def run_once(i):
        box[0], m = multi(box[0], images, digits, perm,
                          jnp.asarray(0, jnp.int32))
        return m["loss"]

    tc0 = time.perf_counter()
    _fetch(run_once(0))
    compile_time = time.perf_counter() - tc0
    for i in range(warmup):
        _fetch(run_once(i)) if i == warmup - 1 else run_once(i)
    per_dispatch = slope_time(run_once, 4, 16, repeats)
    per_step = per_dispatch / K
    flops_im = analytic_flops_per_image(CFG, train=True)
    ips = batch_size / per_step
    platform = jax.devices()[0].platform
    peak = PEAK_FLOPS.get(platform)
    out = {
        "images_per_sec": ips,
        "step_ms": 1000.0 * per_step,
        "compile_s": compile_time,
        "multi_step": K,
        "platform": platform,
        "flops_per_image": flops_im,
        "achieved_tflops": ips * flops_im / 1e12,
        "mfu": (ips * flops_im / peak) if peak else None,
    }
    # NOTE: no cost-analysis-based HBM roofline here — XLA's
    # bytes-accessed counts scan bodies ONCE (ignoring trip counts), so
    # for this scan-of-scans program the estimate is off by the trip
    # count and not honest enough to report (see utils/profiling
    # compiled_cost_analysis caveat).
    return out


def measure_multi_seed(n_seeds: int, batch_size: int, K: int,
                       warmup: int, seed: int = 0,
                       config: str = "default", repeats: int = 3) -> dict:
    """Seed-parallel training throughput: S vmapped model replicas on one
    chip, K steps fused per dispatch — exactly how
    scripts/seed_sweep_vmap.py runs. Aggregate images/sec counts every
    replica's batch; the robustness-sweep speedup is this divided by the
    fused single-seed number (apples to apples: both sides K-fused)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from air_tpu.train.multi_seed import (
        create_multi_seed_state, make_multi_seed_step, multi_seed_perms)
    CFG = get_config(config)

    rng = np.random.default_rng(seed)
    n = batch_size * K
    images = jnp.asarray(rng.uniform(
        size=(n, CFG.canvas_size ** 2)).astype(np.float32))
    digits = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    seeds = list(range(n_seeds))
    state = create_multi_seed_state(CFG, seeds)
    perms = multi_seed_perms(n, seeds, 0)
    multi = make_multi_seed_step(CFG, K, batch_size, donate=True)

    box = [state]

    def run_once(i):
        box[0], m = multi(box[0], images, digits, perms,
                          jnp.asarray(0, jnp.int32))
        return m["loss"]

    tc0 = time.perf_counter()
    _fetch(run_once(0))
    compile_time = time.perf_counter() - tc0
    for i in range(warmup):
        _fetch(run_once(i)) if i == warmup - 1 else run_once(i)
    per_dispatch = slope_time(run_once, 4, 16, repeats)
    per_step = per_dispatch / K
    ips = n_seeds * batch_size / per_step
    return {
        "images_per_sec": ips,
        "step_ms": 1000.0 * per_step,
        "compile_s": compile_time,
        "n_seeds": n_seeds,
        "multi_step": K,
        "platform": jax.devices()[0].platform,
    }


def measure_dp(n_devices: int, per_device_batch: int, steps: int,
               warmup: int, seed: int = 0, config: str = "default") -> dict:
    """Weak-scaling DP measurement over an n-device mesh (state sharded
    per the parallel layer's rules, batch sharded on the data axis)."""
    import numpy as np
    import jax
    from air_tpu.parallel.mesh import make_mesh, shard_state
    from air_tpu.parallel.train_parallel import (
        make_parallel_train_step, shard_batch)
    from air_tpu.train.state import create_train_state
    CFG = get_config(config)

    mesh = make_mesh(n_devices)
    batch = per_device_batch * n_devices
    rng = np.random.default_rng(seed)
    images = rng.uniform(size=(batch, CFG.canvas_size ** 2)).astype(
        np.float32)
    targets = rng.integers(0, 3, batch).astype(np.int32)

    state = shard_state(mesh, create_train_state(CFG, rng=seed))
    step_fn = make_parallel_train_step(CFG, mesh, donate=True)
    si, st = shard_batch(mesh, images, targets)
    tc0 = time.perf_counter()
    state, m = step_fn(state, si, st)
    jax.block_until_ready(m["loss"])
    compile_time = time.perf_counter() - tc0
    for _ in range(warmup):
        state, m = step_fn(state, si, st)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, si, st)
    jax.block_until_ready(m["loss"])
    elapsed = time.perf_counter() - t0
    return {
        "images_per_sec": batch * steps / elapsed,
        "step_ms": 1000.0 * elapsed / steps,
        "compile_s": compile_time,
        "n_devices": n_devices,
        "global_batch": batch,
        "platform": jax.devices()[0].platform,
    }


def measure_dp_subprocess(n_devices: int, per_device_batch: int,
                          steps: int = 20, warmup: int = 3) -> dict:
    """Run the DP measurement on a virtual n-device CPU mesh in a child
    process (the bench box has one real TPU chip; DP weak scaling is the
    correctness-side evidence, BASELINE config 5)."""
    code = (
        "import jax, json, sys; jax.config.update('jax_platforms','cpu'); "
        f"sys.path.insert(0, {HERE!r}); "
        "import bench; from bench import measure_dp; "
        # pin the SAME numerics as the CPU denominator (fp32 moments,
        # rolled scan): the dp ratio is documented as pure SPMD overhead
        # and must not be confounded by a numerics-config delta
        "bench.CFG_OVERRIDES.update(adam_storage_dtype='float32', "
        "scan_unroll=1); "
        f"print('DPRESULT' + json.dumps(measure_dp({n_devices}, "
        f"{per_device_batch}, {steps}, {warmup})))"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={n_devices}"
    env["XLA_FLAGS"] = flags.strip()
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("DPRESULT"):
            return json.loads(line[len("DPRESULT"):])
    raise RuntimeError(f"dp measurement failed: {out.stderr[-2000:]}")


def measure_cpu_subprocess(batch_size: int, steps: int = 10) -> dict:
    """Run the same measurement pinned to CPU in a child process."""
    code = (
        "import jax, json, sys; jax.config.update('jax_platforms','cpu'); "
        f"sys.path.insert(0, {HERE!r}); "
        "import bench; "
        # the baseline is a stand-in for the TF1 reference (BASELINE.md):
        # pin reference semantics — fp32 optimizer state, rolled attention
        # loop — so shipped TPU-side defaults never touch the denominator
        "bench.CFG_OVERRIDES.update(adam_storage_dtype='float32', "
        "scan_unroll=1); "
        f"print('CPURESULT' + json.dumps(bench.measure({batch_size}, "
        f"{steps}, 2, False)))"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("CPURESULT"):
            return json.loads(line[len("CPURESULT"):])
    raise RuntimeError(f"cpu measurement failed: {out.stderr[-2000:]}")


def metric_suffix(args) -> str:
    """Non-default knob suffix for the JSON metric name, shared by every
    bench mode so a bf16c/pu/st-impl row is never indistinguishable from
    the fp32 baseline row in the ledger (advisor r4)."""
    suffix = "" if args.config == "default" else f"_{args.config}"
    if args.st_impl != "xla":
        suffix += f"_{args.st_impl}"
    if getattr(args, "pipeline_unroll", 1) != 1:
        suffix += f"_pu{args.pipeline_unroll}"
    if args.compute_dtype == "bfloat16":
        suffix += "_bf16c"
    if args.decoder_layout == "stepparallel":
        suffix += "_sp"
    if getattr(args, "rnn_input_hoist", False):
        suffix += "_hx"
    return suffix


def main():
    # amortize repeat-mode compiles across bench processes (the timing
    # slopes themselves exclude compile, so caching never skews them)
    from air_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--repeats", type=int, default=3,
                        help="timing windows; the median of N slopes is "
                             "reported (suppresses tunnel-latency noise)")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--config", default="default",
                        choices=["default", "scaled", "harder"])
    parser.add_argument("--measure-cpu", action="store_true")
    parser.add_argument("--st-impl", default="xla",
                        choices=["xla", "pallas", "inline"],
                        help="spatial-transformer implementation for the "
                             "measured step")
    parser.add_argument("--fused", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="measure the device-resident K-fused "
                             "multi-step pipeline (the --device-data "
                             "training hot path). DEFAULT when neither "
                             "--eval nor another mode is given; "
                             "--no-fused selects the single-dispatch "
                             "step measurement")
    parser.add_argument("--multi-step", type=int, default=50,
                        help="K for --fused")
    parser.add_argument("--multi-seed", type=int, default=0,
                        help="seed-parallel mode: train S vmapped model "
                             "replicas at once and report aggregate img/s "
                             "plus the sweep speedup vs one replica")
    parser.add_argument("--data-parallel", action="store_true",
                        help="DP weak scaling over a virtual 8-CPU mesh "
                             "vs 1-CPU throughput at the same per-device "
                             "batch")
    parser.add_argument("--n-devices", type=int, default=8)
    parser.add_argument("--adam-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Adam moment STORAGE dtype (bfloat16 halves "
                             "optimizer-state HBM traffic; update math "
                             "stays fp32 — state.scale_by_adam_stored). "
                             "Default: the shipped config default")
    parser.add_argument("--unroll", type=int, default=None,
                        help="unroll factor for the max_steps attention "
                             "scan (AIRConfig.scan_unroll). Default: the "
                             "shipped config default")
    parser.add_argument("--compute-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="mixed-precision compute dtype for the "
                             "CNN/LSTM/heads/VAE matmuls "
                             "(AIRConfig.compute_dtype; sampling/KL/ST/"
                             "canvas/BCE stay fp32). Default: the shipped "
                             "config default (float32)")
    parser.add_argument("--pipeline-unroll", type=int, default=1,
                        help="unroll factor for the K-step fused-pipeline "
                             "scan (fuses across optimizer steps; attacks "
                             "the batch-independent param/moment HBM "
                             "round-trip per inner step)")
    parser.add_argument("--decoder-layout", default=None,
                        choices=["scan", "stepparallel"],
                        help="AIR decoder layout: 'stepparallel' runs the "
                             "heads/STs/VAE vmapped over attention steps "
                             "(only the tiny LSTM chain is sequential — "
                             "AIRConfig.decoder_layout). Default: the "
                             "shipped config default (scan)")
    parser.add_argument("--rnn-input-hoist", action="store_true",
                        help="hoist the invariant input half of the LSTM "
                             "gate matmul out of the attention recurrence "
                             "(AIRConfig.rnn_input_hoist; nn/lstm.py "
                             "lstm_input_proj)")
    args = parser.parse_args()
    global ST_IMPL
    ST_IMPL = args.st_impl
    if args.adam_dtype is not None:
        CFG_OVERRIDES["adam_storage_dtype"] = args.adam_dtype
    if args.unroll is not None:
        CFG_OVERRIDES["scan_unroll"] = args.unroll
    if args.compute_dtype is not None:
        CFG_OVERRIDES["compute_dtype"] = args.compute_dtype
    if args.decoder_layout is not None:
        CFG_OVERRIDES["decoder_layout"] = args.decoder_layout
    if args.rnn_input_hoist:
        CFG_OVERRIDES["rnn_input_hoist"] = True

    if args.fused and (args.eval or args.multi_seed or args.data_parallel):
        parser.error("--fused conflicts with --eval/--multi-seed/"
                     "--data-parallel (it would silently measure fused "
                     "training instead)")
    if args.pipeline_unroll != 1 and (args.eval or args.multi_seed
                                      or args.data_parallel
                                      or args.fused is False):
        parser.error("--pipeline-unroll only applies to the fused training "
                     "pipeline (the other modes would silently ignore it "
                     "while the metric name claimed it)")

    # refresh/create the CPU baseline FIRST — every mode's vs_baseline
    # divides by it (and --measure-cpu must work regardless of mode).
    # ALWAYS measured at the reference's own batch 64 / default config
    # (reference training.py:14), whatever this run benches: vs_baseline
    # is "times the reference's actual CPU step", a fixed denominator
    # that never silently shifts with --batch-size/--config (review r3).
    need = args.measure_cpu or not os.path.exists(BASELINE_FILE)
    if not need:
        try:
            with open(BASELINE_FILE) as f:
                need = json.load(f)["train_b64"].get(
                    "batch_size", REFERENCE_BATCH) != REFERENCE_BATCH
        except (KeyError, ValueError):
            need = True
    if not args.data_parallel and need:
        print("measuring CPU baseline...", file=sys.stderr)
        cpu = measure_cpu_subprocess(REFERENCE_BATCH)
        cpu["batch_size"] = REFERENCE_BATCH
        with open(BASELINE_FILE, "w") as f:
            json.dump({"train_b64": cpu}, f, indent=1)
        print(f"cpu baseline: {cpu['images_per_sec']:.1f} images/sec",
              file=sys.stderr)

    if args.fused is None:
        # the device-resident fused pipeline IS this framework's training
        # path — measure it by default (single-dispatch via --no-fused)
        args.fused = not (args.eval or args.data_parallel
                          or args.multi_seed)
    if args.fused:
        r = measure_fused(args.batch_size, args.multi_step, args.warmup,
                          config=args.config, repeats=args.repeats,
                          pipeline_unroll=args.pipeline_unroll)
        mfu_s = f"{r['mfu']:.3f}" if r["mfu"] is not None else "n/a"
        print(f"fused K={r['multi_step']}: {r['images_per_sec']:.0f} "
              f"img/s ({r['step_ms']:.3f} ms/step, mfu {mfu_s})",
              file=sys.stderr)
        baseline = 598.0
        if os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                baseline = json.load(f)["train_b64"]["images_per_sec"]
        suffix = metric_suffix(args)
        print(json.dumps({
            "metric": f"multi_mnist_train_fused{r['multi_step']}"
                      f"_images_per_sec_b{args.batch_size}{suffix}",
            "value": round(r["images_per_sec"], 1),
            "unit": "images/sec (device-resident pipeline, "
                    f"{r['multi_step']} steps/dispatch)",
            "vs_baseline": round(r["images_per_sec"] / baseline, 2),
            "mfu": round(r["mfu"], 4) if r["mfu"] is not None else None,
            "baseline_note": "JAX-CPU stand-in of the reference's b64 "
                             "default step (fixed denominator); "
                             "lower-bounds the speedup vs the TF1 "
                             "reference (BASELINE.md)",
        }))
        return

    if args.multi_seed:
        S = args.multi_seed
        single = measure_fused(args.batch_size, args.multi_step,
                               args.warmup, config=args.config,
                               repeats=args.repeats)
        multi = measure_multi_seed(S, args.batch_size, args.multi_step,
                                   args.warmup, config=args.config,
                                   repeats=args.repeats)
        speedup = multi["images_per_sec"] / single["images_per_sec"]
        print(f"1 seed (fused K={args.multi_step}): "
              f"{single['images_per_sec']:.0f} img/s "
              f"({single['step_ms']:.2f} ms); {S} seeds: "
              f"{multi['images_per_sec']:.0f} img/s aggregate "
              f"({multi['step_ms']:.2f} ms) -> sweep speedup "
              f"{speedup:.2f}x of {S}x ideal", file=sys.stderr)
        print(json.dumps({
            "metric": f"multi_mnist_train_seedparallel{S}_images_per_sec"
                      f"_b{args.batch_size}{metric_suffix(args)}",
            "value": round(multi["images_per_sec"], 1),
            "unit": f"aggregate images/sec across {S} vmapped replicas "
                    f"(sweep speedup {speedup:.2f}x vs sequential)",
            "vs_baseline": round(speedup, 2),
        }))
        return

    if args.data_parallel:
        # Correctness-side DP evidence (BASELINE config 5): this box has
        # ONE physical core, so the n virtual devices timeshare it — true
        # weak-scaling efficiency is unmeasurable here. What IS meaningful:
        # the DP program at n-times the global batch should approach the
        # single-device throughput (ratio -> 1 means the SPMD partitioning
        # + grad all-reduce add little overhead beyond the serialized
        # compute).
        n = args.n_devices
        print(f"measuring DP overhead on {n} virtual CPU devices...",
              file=sys.stderr)
        dp = measure_dp_subprocess(n, args.batch_size)
        single = measure_cpu_subprocess(args.batch_size, steps=20)
        ratio = dp["images_per_sec"] / single["images_per_sec"]
        print(f"dp{n}: {dp['images_per_sec']:.0f} img/s "
              f"({dp['step_ms']:.1f} ms/step, global batch "
              f"{dp['global_batch']}); 1-dev: "
              f"{single['images_per_sec']:.0f} img/s", file=sys.stderr)
        print(json.dumps({
            "metric": f"multi_mnist_train_dp{n}_cpu_throughput_ratio",
            "value": round(ratio, 3),
            "unit": (f"dp{n} img/s / 1-device img/s on a single-core host "
                     "(1.0 = zero SPMD overhead; virtual devices share "
                     "one core)"),
            "vs_baseline": round(ratio, 2),
        }))
        return

    with open(BASELINE_FILE) as f:
        baseline = json.load(f)["train_b64"]["images_per_sec"]

    result = measure(args.batch_size, args.steps, args.warmup, args.eval,
                     config=args.config, repeats=args.repeats)
    line = (f"device={result['device']} step={result['step_ms']:.2f}ms "
            f"compile={result['compile_s']:.1f}s "
            f"achieved={result['achieved_tflops']:.2f}TFLOP/s")
    if result["mfu"] is not None:
        line += f" mfu={result['mfu']:.3f}"
    print(line, file=sys.stderr)

    mode = "infer" if args.eval else "train"
    suffix = metric_suffix(args)
    out = {
        "metric": f"multi_mnist_{mode}_images_per_sec_b{args.batch_size}{suffix}",
        "value": round(result["images_per_sec"], 1),
        "unit": "images/sec",
        "vs_baseline": round(result["images_per_sec"] / baseline, 2),
    }
    if result["mfu"] is not None:
        out["mfu"] = round(result["mfu"], 4)
        out["achieved_tflops"] = round(result["achieved_tflops"], 2)
    out["baseline_note"] = ("JAX-CPU stand-in step; lower-bounds the "
                            "speedup vs the TF1 reference (BASELINE.md)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
