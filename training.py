#!/usr/bin/env python
"""AIR training driver CLI.

Parity surface with the reference driver (reference training.py:35-39):
``-r/--results-folder``, ``-o/--overwrite-results``, ``-t/--reader-threads``,
plus TPU-era extensions (step cap, data/config overrides, resume).

Default behavior mirrors the reference exactly: 300 epochs x batch 64 over
multi_mnist_data/common.airrec with the reference hyperparameters
(reference training.py:100-123), tiered test-set summaries, checkpoints
every 10k iterations.
"""

import argparse
import os
import sys


def main():
    # amortize the minutes-long fused-pipeline compile across campaign
    # launches (air_tpu/utils/cache.py; harmless where unsupported)
    from air_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-r", "--results-folder", default="air_results")
    parser.add_argument("-o", "--overwrite-results", type=int,
                        choices=[0, 1], default=0)
    parser.add_argument("-t", "--reader-threads", type=int, default=4)
    parser.add_argument("--train-data",
                        default="multi_mnist_data/common.airrec")
    parser.add_argument("--test-data", default="multi_mnist_data/test.airrec")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--steps", type=int, default=None,
                        help="cap on training iterations (default: epochs)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--eval-every", type=int, default=50)
    parser.add_argument("--img-every", type=int, default=500)
    parser.add_argument("--save-every", type=int, default=10000)
    parser.add_argument("--grad-every", type=int, default=100)
    parser.add_argument("--log-every", type=int, default=1)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--device-data", action="store_true",
                        help="device-resident dataset + K fused steps per "
                             "dispatch (fastest on TPU)")
    parser.add_argument("--multi-step", type=int, default=50)
    parser.add_argument("--pipeline-unroll", type=int, default=1,
                        help="unroll the K-step fused-pipeline scan "
                             "(fuses across optimizer steps; bench-"
                             "validated perf knob, 1 = rolled)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard batches over all devices' data axis")
    parser.add_argument("--n-devices", type=int, default=None)
    parser.add_argument("--synthetic-data", type=int, default=0,
                        help="if no dataset exists, generate one with N "
                             "images per digit stratum first")
    # model overrides
    parser.add_argument("--max-steps", type=int, default=3)
    parser.add_argument("--max-digits", type=int, default=2)
    parser.add_argument("--rnn-units", type=int, default=256)
    parser.add_argument("--canvas-size", type=int, default=50)
    parser.add_argument("--windows-size", type=int, default=28)
    parser.add_argument("--vae-latent", type=int, default=50)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--stopping-threshold", type=float, default=0.99)
    parser.add_argument("--cnn", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="CNN encoder (default ON — the robust-default "
                             "configuration, 10/10 seeds on the synthetic "
                             "set, RESULTS.md; also the reference "
                             "CONSTRUCTOR default, air/air_model.py:17. "
                             "--no-cnn selects the reference training "
                             "driver's raw-pixel encoder)")
    parser.add_argument("--adam-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Adam moment storage dtype (bfloat16 halves "
                             "optimizer-state HBM traffic; fp32 math). "
                             "Default: the shipped config default "
                             "(DEFAULT_TRAINING_CONFIG)")
    parser.add_argument("--unroll", type=int, default=None,
                        help="attention-scan unroll factor "
                             "(AIRConfig.scan_unroll). Default: the "
                             "shipped config default")
    parser.add_argument("--compute-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="mixed-precision compute dtype for the "
                             "CNN/LSTM/heads/VAE matmuls (AIRConfig."
                             "compute_dtype; sampling/KL/ST/canvas/BCE "
                             "and the optimizer stay fp32). Default: "
                             "float32 — the bootstrap-critical numerics "
                             "policy; see RESULTS.md round-4 before "
                             "flipping this on")
    parser.add_argument("--decoder-layout", default=None,
                        choices=["scan", "stepparallel"],
                        help="AIR decoder layout (AIRConfig."
                             "decoder_layout): 'stepparallel' runs heads/"
                             "STs/VAE vmapped over attention steps — a "
                             "throughput knob with scan_unroll-class "
                             "fusion numerics. Default: scan")
    parser.add_argument("--rnn-input-hoist", action="store_true",
                        help="hoist the invariant input half of the LSTM "
                             "gate matmul out of the attention recurrence "
                             "(AIRConfig.rnn_input_hoist — a throughput "
                             "knob with scan_unroll-class fusion numerics)")
    parser.add_argument("--stop-at-accuracy", type=float, default=None,
                        help="stop once test accuracy reaches this value")
    parser.add_argument("--stall-restart-step", type=int, default=60000,
                        help="auto-restart from a re-seeded init (with "
                             "schedule rotation) when test accuracy is "
                             "below --stall-accuracy AND flat (< "
                             "--stall-min-progress improvement over "
                             "--stall-window steps) from this step on "
                             "(0 = off; device-data loop only; default ON "
                             "— part of the robust-default configuration)")
    parser.add_argument("--stall-accuracy", type=float, default=0.95)
    parser.add_argument("--stall-window", type=int, default=20000)
    parser.add_argument("--stall-min-progress", type=float, default=0.01)
    parser.add_argument("--stall-spare-accuracy", type=float, default=0.85,
                        help="a run at/above this accuracy is never "
                             "restarted or abandoned by the stall policy "
                             "(it is in the good basin, merely slow); "
                             "0 disables")
    parser.add_argument("--max-restarts", type=int, default=3)
    parser.add_argument("--attempt-stride", type=int, default=1009,
                        help="attempt_seed stride: auto-restart n trains "
                             "at seed + stride*n. Restart seeds are "
                             "DERIVED, so a rescue campaign that exhausted "
                             "one attempt sequence can pass a different "
                             "stride to explore fresh (init, data-order) "
                             "attempts (RESULTS.md seed-8); nonzero")
    parser.add_argument("--restart-rotation", type=int, choices=[0, 1],
                        default=1,
                        help="rotate the bootstrap schedule across "
                             "auto-restart attempts (temp-anneal / "
                             "reference / long-hold variants — see "
                             "trainer.DEFAULT_RESTART_ROTATION); the base "
                             "attempt always uses the configured schedule")
    parser.add_argument("--learn-background", action="store_true",
                        help="model a learned static background canvas "
                             "(harder scenes; models/config.py: "
                             "learn_background)")
    parser.add_argument("--bg-init", choices=["data", "none"],
                        default="data",
                        help="learned-background init (with "
                             "--learn-background): 'data' estimates the "
                             "texture from the train set (mean of 0-digit "
                             "scenes — exactly the composited background) "
                             "so the bootstrap never has to discover it; "
                             "'none' starts from a blank sigmoid(-4) "
                             "canvas (the round-2 behavior)")
    parser.add_argument("--bg-freeze", action="store_true",
                        help="freeze the learned background at its init "
                             "(oracle attribution: with --bg-init data on "
                             "a deterministic-compositing dataset the init "
                             "IS the exact texture, so training runs "
                             "against a perfect immovable background — "
                             "AIRConfig.freeze_background)")
    parser.add_argument("--bg-composite-kind", default="",
                        help="background-intensity curriculum: composite "
                             "this procedural texture (noise/gradient/"
                             "stripes/blobs/checker) into each TRAIN batch "
                             "on device at an annealed intensity; train "
                             "data should be the CLEAN dataset variant and "
                             "test data the composited one")
    parser.add_argument("--bg-composite-path", default="",
                        help="background-intensity curriculum from a REAL "
                             "texture image (e.g. the reference's "
                             "backgrounds/ PNGs): composite this file "
                             "into each TRAIN batch on device at an "
                             "annealed intensity (prepared exactly like "
                             "the generator's --bg-path — "
                             "data.multi_mnist.prepare_background)")
    parser.add_argument("--bg-composite-seed", type=int, default=0,
                        help="texture seed (must match the dataset "
                             "generator's --seed for equivalence)")
    parser.add_argument("--bg-target", type=float, default=0.3,
                        help="final composite intensity (the dataset's "
                             "--bg-max-intensity)")
    parser.add_argument("--bg-start", type=int, default=10000,
                        help="step at which the intensity ramp begins")
    parser.add_argument("--bg-ramp", type=int, default=40000,
                        help="ramp length in steps (0 = jump to target)")
    parser.add_argument("--anneal-hold", type=int, default=15000,
                        help="hold the z_pres prior at its init value for N "
                             "steps before decaying (default 15000 — part "
                             "of the robust-default configuration, rescues "
                             "seeds that stall on hard/synthetic data, "
                             "RESULTS.md; 0 = the reference schedule)")
    parser.add_argument("--anneal-iters", type=int, default=0,
                        help="iterations per z_pres-prior decay decade "
                             "(0 = the reference 3000, training.py:102 of "
                             "the reference). The reference schedule is "
                             "defined in ITERATIONS at batch 64; a run at "
                             "batch B sees B/64 times more data per "
                             "iteration, so large-batch configs must "
                             "shrink this to anneal at the same pace in "
                             "epochs (e.g. ~190 at batch 1024; RESULTS.md "
                             "round-4 scaled-config attribution)")
    parser.add_argument("--scale-curriculum",
                        action=argparse.BooleanOptionalAction, default=None,
                        help="anneal the scale prior mean 0 -> -1 "
                             "(coarse-to-fine windows) over ~5k steps after "
                             "the anneal hold — the round-2 stall-matrix "
                             "remedy for the degenerate-counting basin. "
                             "Default: ON for the raw-pixel encoder "
                             "(--no-cnn, where ~40%% of attempts stall "
                             "without it), OFF for the CNN default")
    args = parser.parse_args()

    from air_tpu.models.config import (
        DEFAULT_TRAINING_CONFIG, pin_raw_pixel_numerics)
    from air_tpu.train.trainer import (
        Trainer, TrainerConfig, DEFAULT_RESTART_ROTATION)
    from air_tpu.data.loader import load_test_data

    # generate a dataset on the fly if asked and absent
    if args.synthetic_data and not os.path.exists(args.train_data):
        print(f"generating synthetic dataset "
              f"({args.synthetic_data} images/stratum)...")
        from air_tpu.data import get_mnist, generate_dataset, MultiMNISTConfig
        digits, labels, source = get_mnist("mnist_data")
        print(f"digit source: {source}")
        out_dir = os.path.dirname(args.train_data) or "."
        cfg = MultiMNISTConfig(
            max_digits=args.max_digits, max_in_common=args.max_digits,
            images_per_digit=args.synthetic_data,
            test_set_size=min(1000, args.synthetic_data),
            canvas_size=args.canvas_size, seed=args.seed)
        generate_dataset(digits, labels, cfg, out_dir=out_dir,
                         progress=lambda d, n: print(f"  {d}-digit: {n}"))
        # the generator writes canonical names; honor a custom
        # --train-data filename by pointing at what was produced
        gen_train = os.path.join(out_dir, "common.airrec")
        if not os.path.exists(args.train_data) and os.path.exists(gen_train):
            print(f"synthetic data written as {gen_train}; using it "
                  f"(and {out_dir}/test.airrec) instead of "
                  f"{args.train_data}")
            args.train_data = gen_train
            args.test_data = os.path.join(out_dir, "test.airrec")

    if not os.path.exists(args.train_data):
        sys.exit(f"training data not found: {args.train_data} "
                 f"(run scripts/generate_multi_mnist.py or pass "
                 f"--synthetic-data N)")

    model_config = DEFAULT_TRAINING_CONFIG.replace(
        max_steps=args.max_steps, max_digits=args.max_digits,
        rnn_units=args.rnn_units, canvas_size=args.canvas_size,
        windows_size=args.windows_size,
        vae_latent_dimensions=args.vae_latent,
        learning_rate=args.learning_rate,
        stopping_threshold=args.stopping_threshold,
        cnn=args.cnn,
        learn_background=args.learn_background,
        freeze_background=args.bg_freeze,
        # raw-pixel runs pin reference-exact numerics (rolled scan, fp32
        # moments) unless overridden — RESULTS.md round-3 unroll attribution
        **pin_raw_pixel_numerics(args.cnn, args.adam_dtype, args.unroll),
        **({"compute_dtype": args.compute_dtype}
           if args.compute_dtype else {}),
        **({"decoder_layout": args.decoder_layout}
           if args.decoder_layout else {}),
        **({"rnn_input_hoist": True} if args.rnn_input_hoist else {}),
    )
    bg_image, bg_schedule = None, None
    if args.bg_composite_kind or args.bg_composite_path:
        from air_tpu.data.multi_mnist import prepare_background
        bg_image = prepare_background(
            args.canvas_size, bg_path=args.bg_composite_path,
            bg_kind=args.bg_composite_kind, max_intensity=1.0,
            seed=args.bg_composite_seed).reshape(-1)
        bg_schedule = {"target": args.bg_target, "start": args.bg_start,
                       "ramp": args.bg_ramp}
    scale_curriculum = (not args.cnn if args.scale_curriculum is None
                        else args.scale_curriculum)
    if args.anneal_hold or args.anneal_iters or scale_curriculum:
        sched = model_config.schedules
        if args.anneal_hold:
            sched["z_pres_prior_log_odds"]["hold"] = args.anneal_hold
        if args.anneal_iters:
            sched["z_pres_prior_log_odds"]["iters"] = args.anneal_iters
        if scale_curriculum:
            # prior mean walks 0 -> -1 (25px -> ~15px windows) across ~5
            # half-life decades once z_pres annealing starts; same overlay
            # as DEFAULT_RESTART_ROTATION[1] but on the base attempt
            # (promoted from the round-2 stall remedy matrix, RESULTS.md)
            sched["scale_prior_mean"] = {
                "init": 1.0, "min": 0.0, "factor": 0.5, "iters": 5000,
                "offset": -1.0, "hold": args.anneal_hold}
        model_config = model_config.replace(annealing_schedules=sched)
    trainer_config = TrainerConfig(
        results_folder=args.results_folder,
        overwrite_results=bool(args.overwrite_results),
        batch_size=args.batch_size,
        epochs=args.epochs,
        max_iterations=args.steps,
        num_summaries_every=args.eval_every,
        var_summaries_every=max(args.eval_every * 5, 1),
        img_summaries_every=args.img_every,
        grad_summaries_every=args.grad_every,
        save_params_every=args.save_every,
        log_every=args.log_every,
        seed=args.seed,
        resume=not args.no_resume,
        tensorboard=args.tensorboard,
        device_data=args.device_data,
        multi_step=args.multi_step,
        pipeline_unroll=args.pipeline_unroll,
        data_parallel=args.data_parallel,
        n_devices=args.n_devices,
        reader_threads=args.reader_threads,
        stop_at_accuracy=args.stop_at_accuracy,
        stall_detect_step=args.stall_restart_step or None,
        stall_accuracy=args.stall_accuracy,
        stall_window=args.stall_window,
        stall_min_progress=args.stall_min_progress,
        stall_spare_accuracy=args.stall_spare_accuracy,
        max_restarts=args.max_restarts,
        attempt_seed_stride=args.attempt_stride,
        restart_schedule_rotation=(
            DEFAULT_RESTART_ROTATION if args.restart_rotation else ()),
        bg_image=bg_image,
        bg_schedule=bg_schedule,
        background_init="data" if args.bg_init == "data" else None,
    )

    test_data = load_test_data(args.test_data, shift_zero_digits_images=True)
    trainer = Trainer(model_config, trainer_config, args.train_data,
                      test_data)
    trainer.train()


if __name__ == "__main__":
    main()
