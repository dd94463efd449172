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
    return _gates_to_state(gates, c, forget_bias)


def _gates_to_state(gates, c, forget_bias):
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_h, (new_c, new_h)


def lstm_input_proj(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Hoisted input half of the fused gate matmul: ``x @ W[:x_dim] + b``.

    AIR's recurrence is autonomous — ``x`` (the image encoding) is
    re-fed UNCHANGED every attention step (reference
    air/air_model.py:284-286) — yet XLA does NOT split the concat-dot to
    hoist the invariant half out of the scan (verified on the optimized
    HLO: the full ``[B, in+units] @ [in+units, 4u]`` dot sits inside the
    while body). Computing this projection once per image and feeding
    :func:`lstm_apply_hoisted` removes the dominant weight stream (the
    ``in x 4u`` kernel half, ~41M params in the scaled config) from the
    recurrence: it is read once per optimizer step instead of
    ``max_steps`` times forward plus ``max_steps`` times for dW.
    Same algebra as the fused form up to float reassociation
    (``x@Wx + b + h@Wh`` vs ``concat@W + b``) — the scan_unroll numerics
    class (AIRConfig.rnn_input_hoist)."""
    in_dim = x.shape[-1]
    return (jnp.dot(x, params["kernel"][:in_dim],
                    preferred_element_type=x.dtype) + params["bias"])


def lstm_apply_hoisted(params: dict, state, x_proj: jnp.ndarray,
                       forget_bias: float = 1.0):
    """One LSTM step from a precomputed :func:`lstm_input_proj` (which
    already carries the bias). Only the ``[units, 4u]`` recurrent kernel
    half is read per step."""
    c, h = state
    units = h.shape[-1]
    gates = x_proj + jnp.dot(h, params["kernel"][-units:],
                             preferred_element_type=h.dtype)
    return _gates_to_state(gates, c, forget_bias)
