"""Shared full-test-set evaluation: chunk, pad, merge, trim.

Used by Trainer.evaluate and scripts/eval_checkpoint.py — the reference's
feed-the-whole-test-set pass (training.py:169-200) with static-shape
chunking for jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_params(eval_step, params, images, digits, *, batch_size: int,
                    key, step):
    """Run ``eval_step`` over the full set in fixed-size chunks.

    Returns AIROutputs with per-example fields concatenated and trimmed to
    len(images), and loss/accuracy recomputed from the trimmed arrays.
    """
    n = len(images)
    outs = []
    for lo in range(0, n, batch_size):
        im = images[lo:lo + batch_size]
        dg = digits[lo:lo + batch_size]
        pad = batch_size - len(im)
        if pad:
            im = np.concatenate([im, np.zeros((pad, im.shape[1]), im.dtype)])
            dg = np.concatenate([dg, np.zeros(pad, dg.dtype)])
        out = eval_step(params, jnp.asarray(im), jnp.asarray(dg),
                        jax.random.fold_in(key, lo), step)
        outs.append(jax.device_get(out))
    merged = jax.tree_util.tree_map(
        lambda *xs: (np.concatenate(xs)[:n] if np.ndim(xs[0]) > 0
                     else xs[0]), *outs)
    return merged._replace(
        loss=np.mean(merged.per_example_loss),
        accuracy=np.mean(
            (merged.rec_num_digits == np.asarray(digits, np.int32))
            .astype(np.float32)))
