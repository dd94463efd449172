"""Binary Concrete (Gumbel-Sigmoid) distribution ops.

Functional parity with reference air/concrete.py:
  * ``concrete_binary_pre_sigmoid_sample``  (reference air/concrete.py:20-27)
  * ``concrete_binary_kl_mc_sample``        (reference air/concrete.py:30-43)
  * ``concrete_binary_sample``              (reference air/concrete.py:4-17;
    the straight-through ``hard`` option exists but is unused by the model)

Differences from the reference are purely JAX-idiomatic: explicit PRNG keys
instead of TF's stateful RNG. The epsilon 10e-10 (== 1e-9) matches the
reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 10e-10


def _logistic_noise(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """log(u + eps) - log(1 - u + eps), u ~ U(0,1) — the reference's noise
    construction (air/concrete.py:7-8,23-24)."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return jnp.log(u + EPS) - jnp.log(1.0 - u + EPS)


def concrete_binary_pre_sigmoid_sample(key: jax.Array, log_odds: jnp.ndarray,
                                       temperature) -> jnp.ndarray:
    """Pre-sigmoid Concrete sample: (log_odds + logistic noise) / temperature."""
    noise = _logistic_noise(key, jnp.shape(log_odds), jnp.result_type(log_odds))
    return (log_odds + noise) / temperature


def concrete_binary_sample(key: jax.Array, log_odds: jnp.ndarray, temperature,
                           hard: bool = False):
    """Returns (pre-sigmoid y, sigmoid sample); optional straight-through hard
    rounding (reference air/concrete.py:13-15)."""
    noise = _logistic_noise(key, jnp.shape(log_odds), jnp.result_type(log_odds))
    y = log_odds + noise
    sig_y = jax.nn.sigmoid(y / temperature)
    if hard:
        sig_y_hard = jnp.round(sig_y)
        sig_y = jax.lax.stop_gradient(sig_y_hard - sig_y) + sig_y
    return y, sig_y


def _concrete_log_density(y: jnp.ndarray, log_odds, temperature) -> jnp.ndarray:
    """log-density of a binary Concrete distribution at pre-sigmoid sample y
    (reference air/concrete.py:35-41)."""
    y_times_temp = y * temperature
    return (jnp.log(temperature + EPS) - y_times_temp + log_odds
            - 2.0 * jnp.log(1.0 + jnp.exp(-y_times_temp + log_odds) + EPS))


def concrete_binary_kl_mc_sample(y: jnp.ndarray,
                                 prior_log_odds, prior_temperature,
                                 posterior_log_odds, posterior_temperature
                                 ) -> jnp.ndarray:
    """Single-sample MC estimate of KL(posterior || prior) at pre-sigmoid y."""
    log_prior = _concrete_log_density(y, prior_log_odds, prior_temperature)
    log_posterior = _concrete_log_density(y, posterior_log_odds,
                                          posterior_temperature)
    return log_posterior - log_prior
