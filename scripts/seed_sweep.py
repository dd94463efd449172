#!/usr/bin/env python
"""Robustness sweep: train one seed at a single fixed configuration and
append the outcome to a JSONL ledger.

Addresses the reference's reproducibility claim (reference README.md:18:
10/10 runs converge to 98%): run ``for s in $(seq 0 9); do python
scripts/seed_sweep.py $s --out DIR; done`` and read DIR/results.jsonl.

The configuration under test is the repo's default-candidate: reference
hyperparameters (reference training.py:100-123) plus the hold-then-decay
z_pres prior schedule (RESULTS.md stall analysis) when --hold > 0.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("seed", type=int)
    p.add_argument("--data", default="/root/data/multi_mnist_data")
    p.add_argument("--out", default="/root/data/sweep_r2")
    p.add_argument("--hold", type=int, default=15000)
    p.add_argument("--max-iters", type=int, default=250000)
    p.add_argument("--stop-acc", type=float, default=0.98)
    p.add_argument("--eval-every", type=int, default=2500)
    p.add_argument("--temp-anneal", action="store_true",
                   help="also anneal z_pres temperature 5 -> 1 over the "
                        "hold window (stall-basin remedy candidate)")
    p.add_argument("--scale-prior-curriculum", action="store_true",
                   help="anneal scale_prior_mean 0 -> -1 over 30k steps")
    p.add_argument("--stall-restart", type=int, default=0,
                   help="enable auto-recovery: restart re-seeded if "
                        "accuracy < 0.75 at this step (0 = off)")
    p.add_argument("--rotate", type=int, choices=[0, 1], default=1,
                   help="rotate the bootstrap schedule across restart "
                        "attempts (DEFAULT_RESTART_ROTATION)")
    p.add_argument("--max-restarts", type=int, default=3)
    p.add_argument("--attempt-stride", type=int, default=1009,
                   help="attempt_seed stride: restart n trains at seed + "
                        "stride*n. A rescue campaign that exhausted the "
                        "default sequence can pass a different stride to "
                        "explore fresh (init, data-order) attempts")
    p.add_argument("--cnn", action="store_true",
                   help="train with the CNN encoder (the reference "
                        "CONSTRUCTOR default, air/air_model.py:17; its "
                        "training driver overrides to False)")
    p.add_argument("--adam-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="Adam moment storage override (default: shipped "
                        "config default)")
    p.add_argument("--unroll", type=int, default=None,
                   help="scan_unroll override (default: shipped config "
                        "default). The raw-pixel bootstrap is sensitive "
                        "to unrolled-fusion numerics (RESULTS.md r3) — "
                        "pass 1 for reference-exact runs")
    p.add_argument("--tag", default=None)
    args = p.parse_args()

    from air_tpu.models.config import (
        DEFAULT_TRAINING_CONFIG, pin_raw_pixel_numerics)
    from air_tpu.train.trainer import (
        Trainer, TrainerConfig, DEFAULT_RESTART_ROTATION)
    from air_tpu.data.loader import load_test_data

    sched = DEFAULT_TRAINING_CONFIG.schedules
    if args.hold:
        sched["z_pres_prior_log_odds"]["hold"] = args.hold
    if args.temp_anneal:
        sched["z_pres_temperature"] = {
            "init": 5.0, "min": 1.0, "factor": 0.5,
            "iters": max(args.hold // 3, 3000), "log": False}
    if args.scale_prior_curriculum:
        # big windows early -> reference prior late: mean decays 0 -> -1
        # (init 1 with offset -1; halves every 5k steps)
        sched["scale_prior_mean"] = {
            "init": 1.0, "min": 0.0, "factor": 0.5, "iters": 5000,
            "offset": -1.0}
    cfg = DEFAULT_TRAINING_CONFIG.replace(
        annealing_schedules=sched, cnn=args.cnn,
        # raw-pixel runs pin rolled scan + fp32 moments unless overridden
        # (RESULTS.md round-3 unroll attribution)
        **pin_raw_pixel_numerics(args.cnn, args.adam_dtype, args.unroll))

    tag = args.tag or (f"hold{args.hold}"
                       + ("_cnn" if args.cnn else "")
                       + ("_temp" if args.temp_anneal else "")
                       + ("_spc" if args.scale_prior_curriculum else ""))
    folder = os.path.join(args.out, f"seed{args.seed}_{tag}")
    tcfg = TrainerConfig(
        results_folder=folder, overwrite_results=True,
        batch_size=64, epochs=None, max_iterations=args.max_iters,
        stop_at_accuracy=args.stop_acc,
        num_summaries_every=args.eval_every,
        img_summaries_every=10 ** 9, grad_summaries_every=0,
        var_summaries_every=10 ** 9,
        save_params_every=10 ** 9, eval_batch_size=1000,
        seed=args.seed, log_every=args.eval_every * 10,
        source_snapshot=False, device_data=True, multi_step=50,
        stall_detect_step=args.stall_restart or None,
        max_restarts=args.max_restarts,
        attempt_seed_stride=args.attempt_stride,
        restart_schedule_rotation=(
            DEFAULT_RESTART_ROTATION if args.rotate else ()))

    # in-flight marker at campaign start: a round cut / crash leaves a
    # visible ledger row instead of silently vanishing (summarize_sweep
    # drops it once the real result row lands)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.jsonl"), "a") as f:
        f.write(json.dumps({
            "seed": args.seed, "tag": tag, "in_flight": True,
            "final_step": 0, "test_accuracy": 0.0, "converged": False,
            "restarts": 0, "wall_minutes": 0.0}) + "\n")

    test = load_test_data(os.path.join(args.data, "test.airrec"))
    t0 = time.time()
    trainer = Trainer(cfg, tcfg, os.path.join(args.data, "common.airrec"),
                      test)
    result = trainer.train()
    rec = {
        "seed": args.seed, "tag": tag,
        "final_step": result["step"],
        "test_accuracy": result["test_accuracy"],
        "converged": result["test_accuracy"] >= args.stop_acc,
        "restarts": result.get("restarts", 0),
        "wall_minutes": round((time.time() - t0) / 60, 1),
    }
    with open(os.path.join(args.out, "results.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("SWEEPRESULT " + json.dumps(rec))


if __name__ == "__main__":
    main()
