"""Diagonal-Gaussian sampling and closed-form KL.

Parity targets:
  * ``sample_from_mvn``: reference air/air_model.py:123-128
    (mean + standard_normal * sqrt(diag_variance)).
  * ``gaussian_kl``: the closed-form KL the reference inlines three times
    (scale: air/air_model.py:443-447, shift: 462-466, VAE: 481-485):
    0.5 * sum(prior_logvar - logvar - 1 + var/prior_var
              + (mean - prior_mean)^2 / prior_var).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_from_mvn(key: jax.Array, mean: jnp.ndarray,
                    diag_variance: jnp.ndarray) -> jnp.ndarray:
    """Reparameterized sample from N(mean, diag(diag_variance))."""
    eps = jax.random.normal(key, jnp.shape(mean), jnp.result_type(mean))
    return mean + eps * jnp.sqrt(diag_variance)


def gaussian_kl(mean: jnp.ndarray, log_variance: jnp.ndarray,
                prior_mean, prior_variance, prior_log_variance=None
                ) -> jnp.ndarray:
    """KL(N(mean, exp(log_variance)) || N(prior_mean, prior_variance)),
    summed over the trailing axis. Returns shape mean.shape[:-1]."""
    if prior_log_variance is None:
        prior_log_variance = jnp.log(prior_variance)
    variance = jnp.exp(log_variance)
    return 0.5 * jnp.sum(
        prior_log_variance - log_variance - 1.0
        + variance / prior_variance
        + jnp.square(mean - prior_mean) / prior_variance,
        axis=-1,
    )
