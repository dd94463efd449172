"""Fused LSTM cell.

Semantics of TF1's ``rnn.BasicLSTMCell`` (the reference's recurrent core,
reference air/air_model.py:537-542): a single fused kernel
``[x, h] @ W + b`` split into (i, j, f, o) gates, ``forget_bias = 1.0``
added to the forget gate pre-activation, tanh cell nonlinearity.

TPU notes: one [B, in+units] @ [in+units, 4*units] matmul per step — the
dominant matmul of the AIR scan body; kept as a single fused kernel so XLA
tiles it onto the MXU in one shot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from air_tpu.nn.layers import glorot_uniform


def lstm_init(key: jax.Array, input_dim: int, units: int,
              dtype=jnp.float32) -> dict:
    return {
        "kernel": glorot_uniform(key, (input_dim + units, 4 * units), dtype),
        "bias": jnp.zeros((4 * units,), dtype),
    }


def lstm_zero_state(batch_size: int, units: int, dtype=jnp.float32):
    return (jnp.zeros((batch_size, units), dtype),
            jnp.zeros((batch_size, units), dtype))


def lstm_apply(params: dict, state, x: jnp.ndarray, forget_bias: float = 1.0):
    """One LSTM step. state = (c, h); returns (output h', new_state)."""
    c, h = state
    gates = jnp.dot(jnp.concatenate([x, h], axis=-1), params["kernel"],
                    preferred_element_type=x.dtype) + params["bias"]
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_h, (new_c, new_h)
