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

    # the MLPs run at the params'/inputs' compute dtype (bf16 under
    # AIRConfig.compute_dtype="bfloat16"); ALL sampling math — eps draw,
    # exp/sqrt of the log-variance, the reparameterized sum, and the
    # likelihood noise — is promoted to fp32 (no-ops at the fp32
    # default), with the sample cast back down only to feed the
    # generative matmuls.
    cdt = inputs.dtype

    h = inputs
    for layer in params["rec"]:
        h = dense_apply(layer, h, activation)
    rec_mean = dense_apply(params["rec_mean"], h, None).astype(jnp.float32)
    rec_log_variance = dense_apply(
        params["rec_log_variance"], h, None).astype(jnp.float32)

    eps = jax.random.normal(k_latent, rec_mean.shape, jnp.float32)
    rec_sample = rec_mean + eps * jnp.sqrt(jnp.exp(rec_log_variance))

    h = rec_sample.astype(cdt)
    for layer in params["gen"]:
        h = dense_apply(layer, h, activation)
    gen_mean = dense_apply(params["gen_mean"], h, None).astype(jnp.float32)

    noise = jax.random.normal(k_out, gen_mean.shape, jnp.float32)
    reconstruction = jax.nn.sigmoid(gen_mean + noise * likelihood_std)

    # the exposed latent is the recognition mean (reference air/vae.py:43)
    return reconstruction, rec_mean, rec_log_variance, rec_mean
