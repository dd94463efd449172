#!/usr/bin/env python
"""Evaluate a checkpoint on a test set: digit-count accuracy + sliced
metrics (the reference's test-model summary pass as a standalone CLI).

Architecture flags must match how the checkpoint was trained (same flags
as training.py)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", default="model")
    parser.add_argument("--test-data", default="multi_mnist_data/test.airrec")
    parser.add_argument("--batch-size", type=int, default=1000)
    # architecture flags (must match training.py's)
    parser.add_argument("--max-steps", type=int, default=3)
    parser.add_argument("--max-digits", type=int, default=2)
    parser.add_argument("--rnn-units", type=int, default=256)
    parser.add_argument("--canvas-size", type=int, default=50)
    parser.add_argument("--windows-size", type=int, default=28)
    parser.add_argument("--vae-latent", type=int, default=50)
    parser.add_argument("--cnn", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="default: auto-detected from checkpoint keys")
    args = parser.parse_args()

    import jax
    import numpy as np
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG
    from air_tpu.train.checkpoint import (
        load_params, latest_checkpoint, checkpoint_arch)
    from air_tpu.train.steps import make_eval_step
    from air_tpu.train.evaluate import evaluate_params
    from air_tpu.train.metrics import summarize_outputs
    from air_tpu.data.loader import load_test_data

    path = args.model_path
    if os.path.isdir(path):
        path = latest_checkpoint(path)
        if path is None:
            sys.exit(f"no checkpoints in {args.model_path}")
    arch = checkpoint_arch(path)
    if args.cnn is not None:
        arch["cnn"] = args.cnn
    cfg = DEFAULT_TRAINING_CONFIG.replace(
        max_steps=args.max_steps, max_digits=args.max_digits,
        rnn_units=args.rnn_units, canvas_size=args.canvas_size,
        windows_size=args.windows_size,
        vae_latent_dimensions=args.vae_latent, train=False, **arch)
    params = load_params(path)
    images, digits = load_test_data(args.test_data)

    merged = evaluate_params(
        make_eval_step(cfg), params, images, digits,
        batch_size=args.batch_size, key=jax.random.PRNGKey(0),
        step=jax.numpy.zeros((), jax.numpy.int32))
    summ = summarize_outputs(merged, digits, cfg.max_steps, cfg.max_digits)
    print(json.dumps({
        "checkpoint": path,
        "n": len(images),
        "accuracy": round(float(merged.accuracy), 4),
        **{k: round(float(v), 3) for k, v in summ.items()
           if k.startswith(("digit_acc", "steps_", "rec_loss"))
           and not np.isnan(float(v))},
    }, indent=1))


if __name__ == "__main__":
    main()
