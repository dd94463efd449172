"""Optional CNN encoder for the AIR recurrent input.

Parity target: reference air/air_model.py:510-533 — three 5x5 same-padded
relu convs with two 2x2 max-pools after conv1 and conv2, flattened to
``12 * 12 * filters`` features for a 50x50 canvas.

TPU notes: implemented with ``jax.lax.conv_general_dilated`` (NHWC) and
``reduce_window`` max-pooling — both native XLA TPU kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_init(key: jax.Array, kh: int, kw: int, c_in: int, c_out: int,
               dtype=jnp.float32) -> dict:
    fan_in = kh * kw * c_in
    fan_out = kh * kw * c_out
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return {
        "w": jax.random.uniform(key, (kh, kw, c_in, c_out), dtype,
                                -limit, limit),
        "b": jnp.zeros((c_out,), dtype),
    }


def cnn_init(key: jax.Array, filters: int, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _conv_init(k1, 5, 5, 1, filters, dtype),
        "conv2": _conv_init(k2, 5, 5, filters, filters, dtype),
        "conv3": _conv_init(k3, 5, 5, filters, filters, dtype),
    }


def _conv2d_same_relu(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b"]
    return jax.nn.relu(y)


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def cnn_apply(params: dict, images: jnp.ndarray, canvas_size: int,
              filters: int) -> jnp.ndarray:
    """[B, canvas_size**2] flat images -> [B, feat] CNN features."""
    x = images.reshape(-1, canvas_size, canvas_size, 1)
    x = _conv2d_same_relu(params["conv1"], x)
    x = _max_pool_2x2(x)
    x = _conv2d_same_relu(params["conv2"], x)
    x = _max_pool_2x2(x)
    x = _conv2d_same_relu(params["conv3"], x)
    out_hw = canvas_size // 4
    return x.reshape(-1, out_hw * out_hw * filters)
