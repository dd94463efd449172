"""Data-parallel training over a device mesh.

Design (SURVEY.md §2c): params/opt-state replicated, batch sharded on the
``data`` axis, single ``jit`` over the mesh — XLA inserts the gradient
all-reduce over ICI from the sharding constraints (scaling-book recipe:
annotate shardings, let the compiler place collectives). No hand-written
pmap/NCCL-style code.

The loss is a mean over the (sharded) batch, so its gradient contracts the
batch axis; with replicated outputs requested, XLA lowers that contraction
to an ``all-reduce`` over the ``data`` axis — numerically the same
grad-pmean a hand-rolled DP implementation would issue.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from air_tpu.models.config import AIRConfig
from air_tpu.parallel.mesh import batch_sharding, replicated, state_sharding
from air_tpu.train.steps import make_train_step, make_eval_step
from air_tpu.train.state import abstract_train_state


def shard_batch(mesh: Mesh, images, targets):
    """Place a host batch onto the mesh, sharded along the data axis."""
    sharding = batch_sharding(mesh)
    return (jax.device_put(images, sharding),
            jax.device_put(targets, sharding))


def make_parallel_train_step(config: AIRConfig, mesh: Mesh, donate=True,
                             with_grad_stats=False,
                             bg_image=None, bg_schedule=None):
    """Jitted DP(+TP) train step: batch sharded on ``data``; params and
    optimizer state sharded per ``mesh.state_sharding`` (column-split big
    kernels on the ``model`` axis, replicated when model axis is size 1).

    Signature matches the single-device step:
    ``(state, images, targets) -> (state, metrics)``.
    """
    step_fn = make_train_step(config, with_grad_stats=with_grad_stats,
                              jit=False,
                              bg_image=bg_image, bg_schedule=bg_schedule)
    state_sh = state_sharding(mesh, abstract_train_state(config))
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, data),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_eval_step(config: AIRConfig, mesh: Mesh):
    """Jitted DP eval forward: params replicated, batch data-sharded,
    per-example outputs returned data-sharded (gather on host as needed);
    the scalar aggregates (loss, accuracy) come back replicated."""
    from air_tpu.models.air import AIROutputs
    step_fn = make_eval_step(config, jit=False)
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    params_sh = state_sharding(mesh, abstract_train_state(config).params)
    out_shardings = AIROutputs(
        **{f: (rep if f in ("loss", "accuracy") else data)
           for f in AIROutputs._fields})
    return jax.jit(step_fn,
                   in_shardings=(params_sh, data, data, rep, rep),
                   out_shardings=out_shardings)
