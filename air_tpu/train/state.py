"""Train state + optimizer construction.

Optimizer parity with the reference training op (reference
air/air_model.py:651-694): Adam at ``learning_rate`` with optional
``clip_by_global_norm`` — expressed as an optax chain. ``learning_rate``
may carry an annealing schedule (reference training.py:116-120 shows the
schema); it becomes an optax schedule of the global step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from air_tpu.models.config import AIRConfig
from air_tpu.models.air import init_air_params
from air_tpu.ops.schedules import annealed_value


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray          # [] int32 — the reference's global_step
    key: jax.Array             # base PRNG key; per-step keys fold in step

    def replace(self, **kw) -> "TrainState":
        return self._replace(**kw)


def make_optimizer(config: AIRConfig) -> optax.GradientTransformation:
    schedules = config.schedules
    if "learning_rate" in schedules:
        sched = schedules["learning_rate"]
        lr = lambda step: annealed_value(sched, step)  # noqa: E731
    else:
        lr = config.learning_rate
    parts = []
    if config.gradient_clipping_norm is not None:
        parts.append(optax.clip_by_global_norm(config.gradient_clipping_norm))
    parts.append(optax.adam(lr))
    return optax.chain(*parts)


def abstract_train_state(config: AIRConfig) -> TrainState:
    """Shape/dtype skeleton of the initial TrainState (no compute) — used
    by the parallel layer to derive sharding pytrees before init."""
    optimizer = make_optimizer(config)

    def _init(rng):
        k_init, k_train = jax.random.split(rng)
        params = init_air_params(k_init, config)
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=jnp.zeros((), jnp.int32), key=k_train)

    return jax.eval_shape(_init, jax.random.PRNGKey(0))


def create_train_state(config: AIRConfig, rng: jax.Array | int = 0,
                       params: Any | None = None) -> TrainState:
    """Build the initial TrainState as ONE jitted program.

    Eager init dispatches ~100 tiny ops (weight inits + Adam slots), each
    paying a full compile round-trip on remote-tunneled TPUs (minutes);
    fused under jit it is a single compile.
    """
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    optimizer = make_optimizer(config)

    if params is not None:
        @jax.jit
        def _init_opt(params):
            return optimizer.init(params)
        k_init, k_train = jax.random.split(rng)
        return TrainState(params=params, opt_state=_init_opt(params),
                          step=jnp.zeros((), jnp.int32), key=k_train)

    @jax.jit
    def _init(rng):
        k_init, k_train = jax.random.split(rng)
        params = init_air_params(k_init, config)
        opt_state = optimizer.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32), key=k_train)

    return _init(rng)
