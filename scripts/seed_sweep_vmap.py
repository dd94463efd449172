#!/usr/bin/env python
"""Seed-parallel robustness sweep: train S seeds SIMULTANEOUSLY on one chip
(air_tpu.train.multi_seed — vmap over the fused multi-step pipeline).

The reference's 10/10-runs claim (reference README.md:18) costs 10
sequential runs; here the whole table is one process at roughly
single-run wall-clock (the default config is latency-bound, so batching
model replicas fattens the matmuls nearly for free).

Per-replica stall auto-recovery: a replica flat below the stall accuracy
past --stall-restart is re-initialized (new param seed AND new data-order
seed) without disturbing healthy replicas.

Usage: python scripts/seed_sweep_vmap.py 0 1 2 3 4 5 6 7 8 9 \
           --data multi_mnist_data --out sweep_vmap --hold 15000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("seeds", type=int, nargs="+")
    p.add_argument("--data", default="multi_mnist_data")
    p.add_argument("--out", default="sweep_vmap")
    p.add_argument("--hold", type=int, default=15000)
    p.add_argument("--cnn", action="store_true")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--multi-step", type=int, default=50)
    p.add_argument("--max-iters", type=int, default=150000)
    p.add_argument("--stop-acc", type=float, default=0.98)
    p.add_argument("--eval-every", type=int, default=2500)
    p.add_argument("--eval-batch", type=int, default=500)
    p.add_argument("--stall-restart", type=int, default=60000,
                   help="replica step from which a flat sub-threshold "
                        "replica is re-seeded (0 = off)")
    p.add_argument("--stall-accuracy", type=float, default=0.95)
    p.add_argument("--stall-window", type=int, default=20000)
    p.add_argument("--stall-min-progress", type=float, default=0.01)
    p.add_argument("--stall-spare", type=float, default=0.85,
                   help="a replica at/above this accuracy is in the good "
                        "basin (slow, not degenerate) and is never "
                        "re-seeded — throwing away a 0.93-and-climbing "
                        "model for a fresh init is strictly worse "
                        "(observed r3: seed 3 restarted at 0.9+); 0 = off")
    p.add_argument("--max-restarts", type=int, default=3)
    p.add_argument("--attempt-stride", type=int, default=1009,
                   help="attempt_seed stride: restart n of a replica "
                        "trains at seed + stride*n (nonzero). A rescue "
                        "campaign that exhausted the default attempt "
                        "sequence can pass a different stride to explore "
                        "fresh (init, data-order) attempts")
    p.add_argument("--post-restart-iters", type=int, default=80000,
                   help="guarantee a re-seeded replica at least this many "
                        "further shared steps before the sweep ends (the "
                        "shared --max-iters clock would otherwise cut "
                        "late restart attempts short); hard cap 2x "
                        "--max-iters")
    p.add_argument("--scale-curriculum", action="store_true",
                   help="overlay the scale-prior curriculum on the BASE "
                        "attempt (prior mean walks 0 -> -1 over ~5k iters "
                        "after each anneal start) — the round-2 stall "
                        "matrix's remedy for the scale-degenerate counting "
                        "basin, promoted per VERDICT r2 #2")
    p.add_argument("--rotate", type=int, choices=[0, 1], default=1,
                   help="rotate bootstrap-schedule VARIANTS across "
                        "restarts per replica (the sequential Trainer's "
                        "DEFAULT_RESTART_ROTATION, expressed as traced "
                        "schedule knobs — multi_seed.vmap_rotation_"
                        "variant); 0 = re-seed only (the round-2/3 "
                        "behavior, too weak at raw-pixel)")
    p.add_argument("--adam-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="Adam moment storage dtype override (default: the "
                        "shipped config default) — used for convergence "
                        "attribution A/Bs")
    p.add_argument("--unroll", type=int, default=None,
                   help="scan_unroll override (default: the shipped "
                        "config default) — attribution A/Bs")
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="mixed-precision compute dtype override "
                        "(AIRConfig.compute_dtype: bf16 CNN/LSTM/heads/"
                        "VAE, fp32 sampling/KL/ST/canvas) — convergence "
                        "sweeps for the round-4 mixed-precision evidence")
    p.add_argument("--pipeline-unroll", type=int, default=1,
                   help="unroll the K-step fused scan across optimizer "
                        "steps (same fusion-scope knob as training.py "
                        "--pipeline-unroll; NOT convergence-neutral — "
                        "RESULTS.md round-4 pipeline_unroll)")
    p.add_argument("--decoder-layout", default=None,
                   choices=["scan", "stepparallel"],
                   help="AIR decoder layout (AIRConfig.decoder_layout): "
                        "'stepparallel' vmaps heads/STs/VAE over attention "
                        "steps — scan_unroll-class fusion numerics")
    p.add_argument("--rnn-input-hoist", action="store_true",
                   help="hoist the invariant LSTM gate-input projection "
                        "out of the recurrence (AIRConfig.rnn_input_hoist "
                        "— scan_unroll-class fusion numerics)")
    p.add_argument("--anneal-iters", type=int, default=None,
                   help="decade length (iterations per 10x decay) of the "
                        "z_pres prior log-odds schedule; default keeps the "
                        "reference 3000 (slower decay = a gentler "
                        "bootstrap, a raw-pixel-on-real remedy arm)")
    p.add_argument("--tag", default=None)
    args = p.parse_args()
    if args.attempt_stride == 0:
        # fail fast like TrainerConfig.__post_init__ — stride 0 would make
        # every restart reuse the base seed, burning the budget on
        # identical attempts (and would otherwise only raise mid-sweep at
        # the first stall)
        p.error("--attempt-stride must be nonzero")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from air_tpu.models.config import (
        DEFAULT_TRAINING_CONFIG, pin_raw_pixel_numerics)
    from air_tpu.data.records import read_records
    from air_tpu.data.loader import load_test_data
    from air_tpu.train.multi_seed import (
        create_multi_seed_state, make_multi_seed_step, make_multi_seed_eval,
        multi_seed_perms, reinit_replica, evaluate_replicas,
        rotation_knobs, vmap_rotation_variant, rotation_variant_index,
        stack_knobs, set_replica_knobs)
    from air_tpu.train.trainer import is_stalled, attempt_seed

    sched = DEFAULT_TRAINING_CONFIG.schedules
    if args.hold:
        sched["z_pres_prior_log_odds"]["hold"] = args.hold
    if args.anneal_iters:
        sched["z_pres_prior_log_odds"]["iters"] = args.anneal_iters
    if args.scale_curriculum and not args.rotate:
        # same overlay as trainer.DEFAULT_RESTART_ROTATION[1], but on the
        # base attempt; delayed by the hold so the coarse->fine walk spans
        # the period when z_pres decisions are actually being annealed
        # (with --rotate the knob-based schedules carry this instead)
        sched["scale_prior_mean"] = {"init": 1.0, "min": 0.0, "factor": 0.5,
                                     "iters": 5000, "offset": -1.0,
                                     "hold": args.hold}
    cfg = DEFAULT_TRAINING_CONFIG.replace(
        annealing_schedules=sched, cnn=args.cnn,
        # raw-pixel runs pin rolled scan + fp32 moments unless overridden
        # (RESULTS.md round-3 unroll attribution)
        **pin_raw_pixel_numerics(args.cnn, args.adam_dtype, args.unroll),
        **({"compute_dtype": args.compute_dtype}
           if args.compute_dtype else {}),
        **({"decoder_layout": args.decoder_layout}
           if args.decoder_layout else {}),
        **({"rnn_input_hoist": True} if args.rnn_input_hoist else {}))
    tag = args.tag or ("vmap_hold%d%s%s%s%s%s%s%s%s%s%s" % (
        args.hold, "_cnn" if args.cnn else "",
        "_scalecur" if args.scale_curriculum else "",
        "_rot" if args.rotate else "",
        "_" + args.adam_dtype if args.adam_dtype else "",
        "_unroll%d" % args.unroll if args.unroll is not None else "",
        "_bf16c" if args.compute_dtype == "bfloat16" else "",
        "_pu%d" % args.pipeline_unroll
        if args.pipeline_unroll != 1 else "",
        "_ai%d" % args.anneal_iters if args.anneal_iters else "",
        "_sp" if args.decoder_layout == "stepparallel" else "",
        "_hx" if args.rnn_input_hoist else ""))

    rec = read_records(os.path.join(args.data, "common.airrec"))
    images = jax.device_put(np.asarray(rec["images"], np.float32)
                            .reshape(len(rec["images"]), -1))
    digits = jax.device_put(np.asarray(rec["digits"], np.int32))
    test_images, test_digits = load_test_data(
        os.path.join(args.data, "test.airrec"),
        shift_zero_digits_images=True)
    n = len(images)
    B = args.batch_size
    batches_per_epoch = n // B
    # a K above batches_per_epoch would make the off-cadence single-step
    # path the steady state, forfeiting the fusion this script exists for
    K = min(args.multi_step, batches_per_epoch)
    if K < args.multi_step:
        print(f"clamping K {args.multi_step} -> {K} "
              f"(only {batches_per_epoch} batches/epoch)")

    S = len(args.seeds)
    seeds = list(args.seeds)           # current data/param seed per replica
    state = create_multi_seed_state(cfg, seeds)
    multi = make_multi_seed_step(cfg, K, B, knob_schedules=bool(args.rotate),
                                 pipeline_unroll=args.pipeline_unroll)
    eval_fn = make_multi_seed_eval(cfg, knob_schedules=bool(args.rotate))
    knobs_S = None
    if args.rotate:
        base_knobs = rotation_knobs(args.hold,
                                    scale_curriculum=args.scale_curriculum)
        knobs_S = stack_knobs([base_knobs] * S)

    print(f"seed-parallel sweep: S={S} seeds={args.seeds} batch={B} K={K} "
          f"tag={tag}")

    # in-flight markers at sweep start: a round cut / crash leaves visible
    # ledger rows instead of silently vanishing (summarize_sweep drops
    # them once the real result rows land)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.jsonl"), "a") as f:
        for sd in args.seeds:
            f.write(json.dumps({
                "seed": sd, "tag": tag, "in_flight": True,
                "final_step": 0, "test_accuracy": 0.0, "converged": False,
                "restarts": 0, "wall_minutes": 0.0}) + "\n")

    restarts = [0] * S
    conv_step = [None] * S             # replica-clock step at convergence
    final_acc = [0.0] * S
    best_acc = [0.0] * S               # across ALL attempts (never reset)
    history = [[] for _ in range(S)]   # (replica_step, acc)
    epoch, index = 0, 0
    perms = multi_seed_perms(n, seeds, epoch)
    step = 0                           # shared wall clock (loop steps)
    max_iters = args.max_iters         # extended on late restarts
    hard_cap = 2 * args.max_iters
    t0 = time.time()

    def replica_steps():
        return np.asarray(jax.device_get(state.step))

    def retry(fn, *fargs, _donated=None, **fkw):
        """Run a device call, retrying transient tunnel failures (the axon
        TPU tunnel can drop a remote_compile response mid-read — observed
        killing a 45-min sweep at its rescue phase). Probe with a trivial
        op after a pause; if the device (and the sweep's resident buffers)
        survived, the retried call succeeds, else the original error
        propagates to the crash-ledger path below.

        _donated: an array donated to fn (the train steps donate the state,
        donate_argnums=(0,)). If the failure happened AFTER dispatch the
        donated buffers are already consumed — a re-invoke cannot succeed
        and would mask the original error with a deleted-array error, so
        re-raise the original immediately."""
        for attempt in range(4):
            try:
                return fn(*fargs, **fkw)
            except jax.errors.JaxRuntimeError as e:
                if attempt == 3:
                    raise
                if _donated is not None and _donated.is_deleted():
                    raise
                print(f"  [retry] device call failed ({e}); probing in 60s",
                      flush=True)
                time.sleep(60)
                jax.block_until_ready(
                    jnp.dot(jnp.ones((8, 8)), jnp.ones((8, 8))))

    def run_eval():
        """Eval + convergence bookkeeping; True once all replicas done."""
        rsteps = replica_steps()
        # step=None: each replica's annealed hparams resolve at its OWN
        # clock (+ its knob variant), so loss is computed under the values
        # it trained with even after restarts/rotation
        acc, _ = evaluate_replicas(cfg, state, test_images, test_digits,
                                   jax.random.fold_in(
                                       jax.random.PRNGKey(0x5EED), step),
                                   batch_size=args.eval_batch,
                                   eval_fn=eval_fn, knobs_S=knobs_S)
        line = " ".join(f"s{sd}:{a:.3f}" for sd, a in zip(args.seeds, acc))
        print(f"[eval @ {step}] {line}", flush=True)
        for r in range(S):
            # freeze final_acc once the replica has converged: it keeps
            # training with the pack, and a later regression would
            # otherwise overwrite the accuracy that conv_step describes
            # (ADVICE r2)
            if conv_step[r] is None:
                final_acc[r] = float(acc[r])
            best_acc[r] = max(best_acc[r], float(acc[r]))
            history[r].append((int(rsteps[r]), float(acc[r])))
            if conv_step[r] is None and acc[r] >= args.stop_acc:
                conv_step[r] = int(rsteps[r])
                print(f"  seed {args.seeds[r]} converged at replica "
                      f"step {conv_step[r]} ({acc[r]:.3f})")
        return all(c is not None for c in conv_step)

    def write_rows(crashed=False, error=None):
        """Final (or crash-time) ledger rows. On a crash the device may be
        unreachable, so replica steps come from the eval history rather
        than a device fetch; rows carry "crashed": true, best-so-far
        accuracy (best across all attempts — the strongest evidence the
        died sweep actually produced), and the exception text (the round-5
        pu4 crash left 10 rows with no diagnostic at all)."""
        wall = time.time() - t0
        if crashed:
            rsteps = [history[r][-1][0] if history[r] else 0
                      for r in range(S)]
        else:
            rsteps = replica_steps()
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "results.jsonl"), "a") as f:
            for r in range(S):
                rec_out = {
                    "seed": args.seeds[r], "tag": tag,
                    "final_step": int(conv_step[r]
                                      if conv_step[r] is not None
                                      else rsteps[r]),
                    "test_accuracy": (best_acc[r] if crashed
                                      else final_acc[r]),
                    "converged": conv_step[r] is not None
                    or final_acc[r] >= args.stop_acc,
                    "restarts": restarts[r],
                    # which bootstrap-schedule variant the final attempt
                    # ran: "base" or the DEFAULT_RESTART_ROTATION index
                    "variant": ("base" if not args.rotate
                                or restarts[r] == 0
                                else rotation_variant_index(restarts[r])),
                    "wall_minutes": round(wall / 60, 1),
                }
                if crashed:
                    rec_out["crashed"] = True
                    if error:
                        rec_out["error"] = error
                f.write(json.dumps(rec_out) + "\n")
                print("SWEEPRESULT " + json.dumps(rec_out))
        agg = sum(1 for r in range(S)
                  if conv_step[r] is not None or final_acc[r] >= args.stop_acc)
        print(f"{agg}/{S} converged in {wall / 60:.1f} min total "
              f"({wall / 60 / S:.1f} min/seed equivalent)"
              + (" [CRASHED]" if crashed else ""))

    last_eval = -1
    single_step = None                 # off-cadence 1-step program
    try:
        while step < max_iters:
            if step % args.eval_every == 0:
                last_eval = step
                if retry(run_eval):
                    print("all replicas converged")
                    break
                # per-replica stall recovery
                if args.stall_restart:
                    for r in range(S):
                        if conv_step[r] is not None or \
                                restarts[r] >= args.max_restarts:
                            continue
                        rs, a = history[r][-1]
                        # same slope-based policy as Trainer auto-recovery
                        if not is_stalled(history[r], rs, a,
                                          args.stall_restart,
                                          args.stall_accuracy,
                                          args.stall_window,
                                          args.stall_min_progress,
                                          args.stall_spare):
                            continue
                        restarts[r] += 1
                        new_seed = attempt_seed(args.seeds[r], restarts[r],
                                                args.attempt_stride)
                        variant = ""
                        if knobs_S is not None:
                            vk = vmap_rotation_variant(restarts[r],
                                                       args.hold)
                            knobs_S = set_replica_knobs(knobs_S, r, vk)
                            variant = (
                                " variant "
                                f"{rotation_variant_index(restarts[r])}"
                                f" {vk}")
                        print(f"  [stall] seed {args.seeds[r]} flat at "
                              f"{a:.3f} (replica step {rs}) -> reinit "
                              f"with seed {new_seed} (restart "
                              f"{restarts[r]}/{args.max_restarts})"
                              f"{variant}")
                        state = retry(reinit_replica, state, cfg, r,
                                      new_seed)
                        seeds[r] = new_seed
                        perms = perms.at[r].set(
                            multi_seed_perms(n, [new_seed], epoch)[0])
                        history[r] = []
                        max_iters = min(hard_cap,
                                        max(max_iters,
                                            step + args.post_restart_iters))

            remaining = batches_per_epoch - index
            if remaining <= 0:
                epoch += 1
                index = 0
                perms = multi_seed_perms(n, seeds, epoch)
                remaining = batches_per_epoch
            k = min(K, remaining,
                    ((step // args.eval_every) + 1) * args.eval_every - step,
                    max_iters - step)
            extra = () if knobs_S is None else (knobs_S,)
            if k == K:
                state, _ = retry(multi, state, images, digits, perms,
                                 jnp.asarray(index, jnp.int32), *extra,
                                 _donated=state.step)
                index += K
                step += K
            else:
                # off-cadence remainder: run single steps
                if single_step is None:
                    single_step = make_multi_seed_step(
                        cfg, 1, B, knob_schedules=knobs_S is not None)
                for _ in range(k):
                    state, _ = retry(single_step, state, images, digits,
                                     perms, jnp.asarray(index, jnp.int32),
                                     *extra, _donated=state.step)
                    index += 1
                    step += 1

        if last_eval != step and not all(c is not None for c in conv_step):
            # the loop exited at max_iters up to eval_every-1 steps after
            # the last eval: refresh the accuracy at the true final step
            retry(run_eval)
    except BaseException as e:
        write_rows(crashed=True,
                   error=f"{type(e).__name__}: {e}"[:300])
        raise
    write_rows()


if __name__ == "__main__":
    main()
