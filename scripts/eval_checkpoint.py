#!/usr/bin/env python
"""Evaluate a checkpoint on a test set: digit-count accuracy + sliced
metrics (the reference's test-model summary pass as a standalone CLI)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-path", default="model")
    parser.add_argument("--test-data", default="multi_mnist_data/test.airrec")
    parser.add_argument("--max-steps", type=int, default=3)
    parser.add_argument("--max-digits", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=1000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG
    from air_tpu.train.checkpoint import load_params, latest_checkpoint
    from air_tpu.train.steps import make_eval_step
    from air_tpu.train.metrics import summarize_outputs
    from air_tpu.data.loader import load_test_data

    cfg = DEFAULT_TRAINING_CONFIG.replace(
        max_steps=args.max_steps, max_digits=args.max_digits, train=False)
    path = args.model_path
    if os.path.isdir(path):
        path = latest_checkpoint(path)
        if path is None:
            sys.exit(f"no checkpoints in {args.model_path}")
    params = load_params(path)
    images, digits = load_test_data(args.test_data)

    ev = make_eval_step(cfg)
    outs = []
    n = len(images)
    eb = args.batch_size
    for lo in range(0, n, eb):
        im = images[lo:lo + eb]
        dg = digits[lo:lo + eb]
        pad = eb - len(im)
        if pad:
            im = np.concatenate([im, np.zeros((pad, im.shape[1]), im.dtype)])
            dg = np.concatenate([dg, np.zeros(pad, dg.dtype)])
        out = ev(params, jnp.asarray(im), jnp.asarray(dg),
                 jax.random.fold_in(jax.random.PRNGKey(0), lo),
                 jnp.zeros((), jnp.int32))
        outs.append(jax.device_get(out))
    merged = jax.tree_util.tree_map(
        lambda *xs: (np.concatenate(xs)[:n] if np.ndim(xs[0]) > 0
                     else xs[0]), *outs)
    acc = float(np.mean(merged.rec_num_digits == digits.astype(np.int32)))
    summ = summarize_outputs(merged, digits, cfg.max_steps, cfg.max_digits)
    print(json.dumps({
        "checkpoint": path,
        "n": n,
        "accuracy": round(acc, 4),
        **{k: round(float(v), 3) for k, v in summ.items()
           if k.startswith(("digit_acc", "steps_", "rec_loss"))
           and not np.isnan(float(v))},
    }, indent=1))


if __name__ == "__main__":
    main()
