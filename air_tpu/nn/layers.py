"""Dense / MLP primitives with explicit param pytrees.

Initialization mirrors the reference's tf.contrib.layers.fully_connected
defaults closely enough to train (glorot-uniform weights, zero biases —
xavier_initializer is contrib's default). Exact bit parity with TF's RNG is
neither required nor attempted (SURVEY.md §7 stage 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def glorot_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def dense_init(key: jax.Array, in_dim: int, out_dim: int,
               dtype=jnp.float32) -> dict:
    return {
        "w": glorot_uniform(key, (in_dim, out_dim), dtype),
        "b": jnp.zeros((out_dim,), dtype),
    }


def dense_apply(params: dict, x: jnp.ndarray, activation=None) -> jnp.ndarray:
    y = jnp.dot(x, params["w"], preferred_element_type=x.dtype) + params["b"]
    if activation is not None:
        y = activation(y)
    return y


def mlp_init(key: jax.Array, in_dim: int, hidden_dims, dtype=jnp.float32):
    """Stack of dense layers; returns a list of per-layer param dicts."""
    params = []
    dims = [in_dim, *hidden_dims]
    keys = jax.random.split(key, len(hidden_dims))
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        params.append(dense_init(k, d_in, d_out, dtype))
    return params


def mlp_apply(params, x: jnp.ndarray, activation=jax.nn.relu,
              final_activation="same") -> jnp.ndarray:
    """Apply an MLP. ``final_activation="same"`` applies ``activation`` on
    every layer (contrib fully_connected defaults to relu on hidden stacks);
    pass None for a linear final layer."""
    for i, layer in enumerate(params):
        last = i == len(params) - 1
        act = activation if (not last or final_activation == "same") \
            else final_activation
        x = dense_apply(layer, x, act)
    return x


def two_layer_head_init(key: jax.Array, in_dim: int, hidden: int,
                        out_dim: int, dtype=jnp.float32) -> dict:
    """hidden(relu) -> linear output: the reference's per-quantity head shape
    (e.g. scale mean head, reference air/air_model.py:290-294)."""
    k1, k2 = jax.random.split(key)
    return {
        "hidden": dense_init(k1, in_dim, hidden, dtype),
        "out": dense_init(k2, hidden, out_dim, dtype),
    }


def two_layer_head_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = dense_apply(params["hidden"], x, jax.nn.relu)
    return dense_apply(params["out"], h, None)
