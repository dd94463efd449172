"""Fused Pallas kernel: attention-write + z_pres-masked canvas accumulate.

The reference composes these as separate graph ops — backward spatial
transform (reference air/air_model.py:362-366) followed by the masked
canvas update ``canvas += z_pres * window_recon`` (air/air_model.py:429-439).
The XLA separable path mirrors that: two batched einsums materialize
``tmp = Wy @ win`` and ``window_recon`` in HBM, then a masked
multiply-add reads them back (SURVEY.md §7.7 named this composite the
fusion target). This kernel runs the whole chain per batch element inside
VMEM:

    canvas_out[b] = canvas[b] + coeff[b] * (Wy[b] @ win[b] @ Wx[b]^T)

where ``coeff = alive * z_pres`` (the continuous-relaxation canvas gate)
and Wy/Wx are the per-axis bilinear weight matrices of the backward ST
mapping (pad_mode="zeros" semantics, air_tpu/ops/transformer.py). The
intermediates never touch HBM — vs the XLA path this removes the
write+read of both ``tmp`` [B, cs, ws] and ``window_recon`` [B, cs, cs].

Backward is ONE Pallas kernel per batch block computing all four input
cotangents with shared VMEM intermediates (gwx = g @ Wx and tmp = Wy @ win
each feed two cotangents):

    d_canvas = g                       (identity, no kernel)
    d_Wy   = coeff * (g @ Wx) @ win^T
    d_win  = coeff * Wy^T @ (g @ Wx)
    d_Wx   = coeff * g^T @ (Wy @ win)
    d_coeff= sum(g * (Wy @ win) @ Wx^T)

Gradients w.r.t. (s, x, y) flow through the weight-matrix construction
outside the kernel (XLA one_hot VJP — sparse scatter, not FLOPs-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from air_tpu.ops.transformer import _axis_weight_matrix
from air_tpu.kernels.st_pallas import pallas_available


def _pick_block(batch: int, limit: int = 8) -> int:
    for bb in range(min(limit, batch), 0, -1):
        if batch % bb == 0:
            return bb
    return 1


def _fwd_kernel(wy_ref, win_ref, wx_ref, coeff_ref, canvas_ref, out_ref):
    bb = wy_ref.shape[0]
    for b in range(bb):                       # static unroll over the block
        tmp = jnp.dot(wy_ref[b], win_ref[b],
                      preferred_element_type=jnp.float32)       # [cs, ws]
        recon = jax.lax.dot_general(
            tmp, wx_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [cs, cs]
        out_ref[b] = canvas_ref[b] + coeff_ref[b, 0] * recon


def _bwd_kernel(wy_ref, win_ref, wx_ref, coeff_ref, g_ref,
                dwy_ref, dwin_ref, dwx_ref, dcoeff_ref):
    bb = wy_ref.shape[0]
    for b in range(bb):
        c = coeff_ref[b, 0]
        g = g_ref[b]                                             # [cs, cs]
        # shared intermediates (VMEM-resident)
        gwx = jnp.dot(g, wx_ref[b],
                      preferred_element_type=jnp.float32)        # [cs, ws]
        tmp = jnp.dot(wy_ref[b], win_ref[b],
                      preferred_element_type=jnp.float32)        # [cs, ws]
        # d_wy = c * gwx @ win^T
        dwy_ref[b] = c * jax.lax.dot_general(
            gwx, win_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # d_win = c * wy^T @ gwx
        dwin_ref[b] = c * jax.lax.dot_general(
            wy_ref[b], gwx, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # d_wx = c * g^T @ tmp
        dwx_ref[b] = c * jax.lax.dot_general(
            g, tmp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # d_coeff = <g, tmp @ wx^T>
        recon = jax.lax.dot_general(
            tmp, wx_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # rank-2 store: Mosaic rejects scalar stores to VMEM
        dcoeff_ref[b:b + 1, :] = jnp.sum(g * recon).reshape(1, 1)


def _block_specs(bb, shapes):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return [pl.BlockSpec((bb, *s), lambda i, n=len(s): (i, *([0] * n)),
                         memory_space=pltpu.VMEM) for s in shapes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _wmac_core(canvas, win, wy, wx, coeff, interpret):
    """canvas + coeff * (wy @ win @ wx^T), fused. canvas: [B, cs, cs]."""
    return _wmac_fwd_call(canvas, win, wy, wx, coeff, interpret)


def _wmac_fwd_call(canvas, win, wy, wx, coeff, interpret):
    from jax.experimental import pallas as pl

    b, cs, _ = canvas.shape
    ws = win.shape[-1]
    bb = _pick_block(b)
    coeff2 = coeff.reshape(b, 1).astype(jnp.float32)
    in_specs = _block_specs(bb, [(cs, ws), (ws, ws), (cs, ws), (1,),
                                 (cs, cs)])
    (out_spec,) = _block_specs(bb, [(cs, cs)])
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cs, cs), jnp.float32),
        # the canvas buffer is accumulated in place (input 4 -> output 0):
        # no fresh [B, cs, cs] allocation per scan step
        input_output_aliases={4: 0},
        interpret=interpret,
    )(wy.astype(jnp.float32), win.astype(jnp.float32),
      wx.astype(jnp.float32), coeff2, canvas.astype(jnp.float32))


def _wmac_fwd(canvas, win, wy, wx, coeff, interpret):
    out = _wmac_fwd_call(canvas, win, wy, wx, coeff, interpret)
    return out, (win, wy, wx, coeff)


def _wmac_bwd(interpret, res, g):
    from jax.experimental import pallas as pl

    win, wy, wx, coeff = res
    b, cs, ws = wy.shape
    bb = _pick_block(b)
    coeff2 = coeff.reshape(b, 1).astype(jnp.float32)
    in_specs = _block_specs(bb, [(cs, ws), (ws, ws), (cs, ws), (1,),
                                 (cs, cs)])
    out_specs = _block_specs(bb, [(cs, ws), (ws, ws), (cs, ws), (1,)])
    dwy, dwin, dwx, dcoeff = pl.pallas_call(
        _bwd_kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, cs, ws), jnp.float32),
            jax.ShapeDtypeStruct((b, ws, ws), jnp.float32),
            jax.ShapeDtypeStruct((b, cs, ws), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(wy.astype(jnp.float32), win.astype(jnp.float32),
      wx.astype(jnp.float32), coeff2, g.astype(jnp.float32))
    return (g, dwin.astype(win.dtype), dwy.astype(wy.dtype),
            dwx.astype(wx.dtype), dcoeff.reshape(coeff.shape))


_wmac_core.defvjp(_wmac_fwd, _wmac_bwd)


def fused_write_accumulate(canvas_flat: jnp.ndarray, windows: jnp.ndarray,
                           s: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                           coeff: jnp.ndarray, canvas_size: int,
                           interpret: bool | None = None) -> jnp.ndarray:
    """``canvas + coeff * attention_write(windows, s, x, y)`` in one fused
    Pallas launch (+ its all-Pallas VJP).

    canvas_flat: [B, cs*cs]; windows: [B, ws, ws] (or [B, ws*ws]);
    coeff: [B] — the ``alive * z_pres`` canvas gate. Returns [B, cs*cs].
    Value-equivalent to the XLA composite in models/air.py (pad_mode
    "zeros"); asserted in tests/test_pallas.py.
    """
    if interpret is None:
        interpret = not pallas_available()
    b = canvas_flat.shape[0]
    cs = canvas_size
    windows = windows.reshape(b, -1)
    ws = int(round(windows.shape[-1] ** 0.5))
    windows = windows.reshape(b, ws, ws)
    inv_s = 1.0 / s
    wy = _axis_weight_matrix(inv_s, -y * inv_s, cs, ws, pad_mode="zeros")
    wx = _axis_weight_matrix(inv_s, -x * inv_s, cs, ws, pad_mode="zeros")
    out = _wmac_core(canvas_flat.reshape(b, cs, cs), windows, wy, wx,
                     coeff, interpret)
    return out.reshape(b, cs * cs)
