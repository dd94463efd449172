#!/usr/bin/env python
"""Mechanistic probe: do rolled and unrolled attention scans produce the
same loss/gradients on the REAL TPU?

Context (round-3 attribution): three 10-seed raw-pixel sweeps with
scan_unroll=3 collapsed to 0-1/10 converged while the rolled control hit
5/10; unroll is the epidemiological suspect. Unrolling must be
semantically identical — this probe checks whether TPU XLA fusion across
unrolled iterations changes the actual numbers (e.g. reassociating the
log(x + eps) BCE protection, README round-1 find), or whether the
per-step numerics are fine and the divergence is trajectory-level.

Runs a handful of (init, hparam-regime) combinations; prints max |rel
diff| of loss and per-tensor gradients, plus any non-finite counts.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from air_tpu.models.config import DEFAULT_TRAINING_CONFIG
from air_tpu.models.air import air_forward
from air_tpu.ops.schedules import resolve_annealed


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    # raw-pixel encoder: the collapse is specific to this config
    base = DEFAULT_TRAINING_CONFIG.replace(adam_storage_dtype="float32",
                                           cnn=False)
    sched = base.schedules
    sched["z_pres_prior_log_odds"]["hold"] = 15000
    base = base.replace(annealing_schedules=sched)

    from air_tpu.train.state import create_train_state
    data_key = jax.random.PRNGKey(123)
    images = jax.random.uniform(data_key, (64, base.canvas_size ** 2))
    # make it MNIST-ish sparse: mostly background
    images = jnp.where(images > 0.8, images, 0.0)
    targets = jnp.zeros((64,), jnp.int32).at[::3].set(1).at[::7].set(2)

    def loss_and_grads(cfg, params, step, key):
        hp = resolve_annealed(cfg.schedules, cfg.annealable_defaults(), step)

        def loss_fn(p):
            out = air_forward(p, cfg, images, targets, key, train=True,
                              hparams=hp)
            return out.loss
        return jax.value_and_grad(loss_fn)(params)

    for seed in (0, 1):
        params = create_train_state(base, rng=seed).params
        for step in (0, 15000, 17500, 20000, 40000):
            key = jax.random.fold_in(jax.random.PRNGKey(7), step)
            cfg_r = base.replace(scan_unroll=1)
            cfg_u = base.replace(scan_unroll=3)
            lr, gr = jax.jit(lambda p: loss_and_grads(cfg_r, p, step, key))(
                params)
            lu, gu = jax.jit(lambda p: loss_and_grads(cfg_u, p, step, key))(
                params)
            lr, lu = float(lr), float(lu)
            flat_r = jax.tree_util.tree_leaves_with_path(gr)
            flat_u = jax.tree_util.tree_leaves(gu)
            # elementwise max-rel is dominated by near-zero elements
            # (catastrophic cancellation on ~1e-12 grads is harmless);
            # the magnitude-weighted per-tensor rel-L2 is the signal.
            worst_l2, worst_name, nonfinite = 0.0, "", 0
            for (path, a), b in zip(flat_r, flat_u):
                a = np.asarray(a, np.float64)
                b = np.asarray(b, np.float64)
                nonfinite += int((~np.isfinite(a)).sum())
                nonfinite += int((~np.isfinite(b)).sum())
                rel_l2 = (np.linalg.norm(a - b)
                          / max(np.linalg.norm(a), 1e-30))
                if rel_l2 > worst_l2:
                    worst_l2 = float(rel_l2)
                    worst_name = "/".join(
                        str(getattr(p, "key", p)) for p in path)
            print(f"seed {seed} step {step:>6}: loss rolled {lr:.6f} "
                  f"unrolled {lu:.6f} rel {abs(lr - lu) / max(abs(lr), 1e-12):.2e}"
                  f"  grad max relL2 {worst_l2:.2e} ({worst_name})"
                  f"  nonfinite {nonfinite}", flush=True)


if __name__ == "__main__":
    main()
