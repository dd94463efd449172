"""Hyperparameter annealing schedules as pure functions of the global step.

Parity target: the reference's ``_create_annealed_tensor``
(reference air/air_model.py:94-121), which wraps
``tf.train.exponential_decay`` with optional min/max clamping and a final
log transform. Schedule spec is the same dict-of-knobs schema:
``{"init", "iters", "factor", "staircase"?, "min"?, "max"?, "log"?}``
(consumed at reference training.py:110-121).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 10e-10


def exponential_decay(init, step, decay_steps, decay_rate,
                      staircase: bool = False):
    """init * decay_rate ** (step / decay_steps); staircase floors the
    exponent (tf.train.exponential_decay semantics)."""
    exponent = jnp.asarray(step, jnp.float32) / decay_steps
    if staircase:
        exponent = jnp.floor(exponent)
    return init * jnp.power(jnp.asarray(decay_rate, jnp.float32), exponent)


def annealed_value(schedule: dict, step):
    """Resolve one annealing-schedule dict at ``step`` (traceable).

    Supersets of the reference schema (each absent = reference behavior):
      * ``hold`` keeps the value at ``init`` for the first ``hold`` steps
        before the decay clock starts (grace-window extension);
      * ``offset`` is added last — lets a positive exponential decay
        express curricula over signed quantities (e.g. scale_prior_mean
        0 -> -1 via init=1, offset=-1).
    """
    decay_step = jnp.maximum(jnp.asarray(step, jnp.float32)
                             - schedule.get("hold", 0), 0.0)
    value = exponential_decay(
        schedule["init"], decay_step, schedule["iters"], schedule["factor"],
        staircase=schedule.get("staircase", False),
    )
    if "min" in schedule:
        value = jnp.maximum(value, schedule["min"])
    if "max" in schedule:
        value = jnp.minimum(value, schedule["max"])
    if schedule.get("log", False):
        value = jnp.log(value + EPS)
    return value + schedule.get("offset", 0.0)


def resolve_annealed(annealing_schedules: dict | None, defaults: dict, step):
    """Resolve every annealed hyperparameter at ``step``.

    Returns a dict mapping each parameter name in ``defaults`` to either its
    static default or its annealed (traced) value — the scan-time equivalent
    of the reference's setattr loop (air/air_model.py:76-82).
    """
    resolved = dict(defaults)
    if annealing_schedules:
        for name, schedule in annealing_schedules.items():
            if name not in defaults:
                raise KeyError(f"unknown annealed hyperparameter: {name!r}")
            resolved[name] = annealed_value(schedule, step)
    return resolved
