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


class AdamStoredState(NamedTuple):
    """scale_by_adam_stored state: moments in a compact storage dtype."""
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_stored(b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         storage_dtype=jnp.bfloat16):
    """Adam whose first AND second moments are STORED in ``storage_dtype``
    (optax.adam's ``mu_dtype`` only covers mu). Per-step math runs in
    fp32 — moments are promoted on read and demoted on write — so only
    the HBM-resident representation changes. Motivation: the b64 fused
    step is bound by batch-independent weight/optimizer HBM traffic
    (RESULTS.md batch-scaling analysis); bf16 moments remove 16 MB of
    read+write per step at the 4M-param default config."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=storage_dtype)  # noqa: E731
        return AdamStoredState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu32 = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1.0 - b1) * g,
            state.mu, grads)
        nu32 = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g),
            state.nu, grads)
        c1 = 1.0 - jnp.power(b1, t)
        c2 = 1.0 - jnp.power(b2, t)
        updates = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32)
        demote = lambda x: x.astype(storage_dtype)  # noqa: E731
        return updates, AdamStoredState(
            count=count,
            mu=jax.tree_util.tree_map(demote, mu32),
            nu=jax.tree_util.tree_map(demote, nu32))

    return optax.GradientTransformation(init, update)


def make_optimizer(config: AIRConfig) -> optax.GradientTransformation:
    schedules = config.schedules
    if "learning_rate" in schedules:
        sched = schedules["learning_rate"]
        lr = lambda step: annealed_value(sched, step)  # noqa: E731
    else:
        lr = config.learning_rate
    parts = []
    if getattr(config, "freeze_background", False):
        if not config.learn_background:
            raise ValueError("freeze_background requires learn_background")
        # zero the background gradient FIRST so the frozen parameter
        # neither moves nor skews the global-norm clip of the live ones
        parts.append(optax.masked(
            optax.set_to_zero(),
            lambda params: {k: k == "background" for k in params}))
    if config.gradient_clipping_norm is not None:
        parts.append(optax.clip_by_global_norm(config.gradient_clipping_norm))
    if getattr(config, "adam_storage_dtype", "float32") == "bfloat16":
        parts.append(scale_by_adam_stored(storage_dtype=jnp.bfloat16))
        parts.append(optax.scale_by_learning_rate(lr))
    else:
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
                       params: Any | None = None,
                       background_init=None) -> TrainState:
    """Build the initial TrainState as ONE jitted program.

    Eager init dispatches ~100 tiny ops (weight inits + Adam slots), each
    paying a full compile round-trip on remote-tunneled TPUs (minutes);
    fused under jit it is a single compile.

    ``background_init``: pixel-space background estimate forwarded to
    :func:`air_tpu.models.air.init_air_params` (learn_background configs).
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
    def _init(rng, bg):
        k_init, k_train = jax.random.split(rng)
        params = init_air_params(k_init, config, background_init=bg)
        opt_state = optimizer.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32), key=k_train)

    if background_init is None:
        return _init(rng, None)
    return _init(rng, jnp.asarray(background_init, jnp.float32).reshape(-1))
