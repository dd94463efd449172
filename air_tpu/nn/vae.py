"""Single-window VAE.

Functional parity with reference air/vae.py:5-43:
  * softplus recognition MLP -> diag-Gaussian (mean, log_variance)
  * reparameterized latent sample feeds the generative path
  * softplus generative MLP -> Gaussian likelihood with fixed std
    (noise added pre-sigmoid, even at eval: reference air/vae.py:36-41)
  * returns (reconstruction, recognition_mean, recognition_log_variance,
    latent) where the exposed latent is the recognition *mean*, not the
    sample — a reference quirk preserved on purpose (air/vae.py:43).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from air_tpu.nn.layers import dense_init, dense_apply, mlp_init


def vae_init(key: jax.Array, input_dim: int, rec_hidden_units,
             latent_dim: int, gen_hidden_units, dtype=jnp.float32) -> dict:
    k_rec, k_mean, k_logvar, k_gen, k_gmean = jax.random.split(key, 5)
    rec_dims = list(rec_hidden_units)
    gen_dims = list(gen_hidden_units)
    return {
        "rec": mlp_init(k_rec, input_dim, rec_dims, dtype),
        "rec_mean": dense_init(k_mean, rec_dims[-1], latent_dim, dtype),
        "rec_log_variance": dense_init(k_logvar, rec_dims[-1], latent_dim, dtype),
        "gen": mlp_init(k_gen, latent_dim, gen_dims, dtype),
        "gen_mean": dense_init(k_gmean, gen_dims[-1], input_dim, dtype),
    }


def vae_apply(params: dict, key: jax.Array, inputs: jnp.ndarray,
              likelihood_std: float = 0.0, activation=jax.nn.softplus):
    """Returns (reconstruction, rec_mean, rec_log_variance, latent)."""
    k_latent, k_out = jax.random.split(key)

    h = inputs
    for layer in params["rec"]:
        h = dense_apply(layer, h, activation)
    rec_mean = dense_apply(params["rec_mean"], h, None)
    rec_log_variance = dense_apply(params["rec_log_variance"], h, None)

    eps = jax.random.normal(k_latent, rec_mean.shape, rec_mean.dtype)
    rec_sample = rec_mean + eps * jnp.sqrt(jnp.exp(rec_log_variance))

    h = rec_sample
    for layer in params["gen"]:
        h = dense_apply(layer, h, activation)
    gen_mean = dense_apply(params["gen_mean"], h, None)

    noise = jax.random.normal(k_out, gen_mean.shape, gen_mean.dtype)
    reconstruction = jax.nn.sigmoid(gen_mean + noise * likelihood_std)

    # the exposed latent is the recognition mean (reference air/vae.py:43)
    return reconstruction, rec_mean, rec_log_variance, rec_mean
