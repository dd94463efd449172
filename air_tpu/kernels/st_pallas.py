"""Fused Pallas TPU kernels for the AIR spatial-attention resample.

The XLA separable path (air_tpu/ops/transformer.py) lowers to two batched
matmuls with the [B, out_h, in_w] intermediate round-tripping HBM; this
kernel fuses both contractions per batch element, keeping the intermediate
in VMEM. The per-axis bilinear weight matrices are built by XLA on the VPU
(cheap, fuses into the producers) and streamed in as blocks.

Semantics identical to ``attention_read`` / ``attention_write`` at their
defaults (reference air/transformer.py coordinate map incl. the
(dim-1.001)/2 quirk, with ``pad_mode="zeros"`` true zero padding — NOT the
reference's clamp-cancel quirk; models/air.py requires zeros for this
path) — asserted against the XLA path in tests/test_pallas.py at batch
sizes up to 1024.

Grads: ``custom_vjp`` — forward runs the Pallas kernel, backward reuses the
XLA separable path's VJP (bilinear resampling is linear in the image and
piecewise-smooth in s/x/y; the XLA VJP is exact and already MXU-friendly).

Enable per-model with ``AIRConfig(st_impl="pallas")``. Falls back to
interpret mode off-TPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from air_tpu.ops.transformer import separable_transform, _axis_weight_matrix


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fused_dots_kernel(wy_ref, img_ref, wx_ref, out_ref):
    """out = Wy @ img @ Wx^T for one batch element, intermediate in VMEM."""
    tmp = jnp.dot(wy_ref[0], img_ref[0], preferred_element_type=jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        tmp, wx_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _resample_pallas(images, sx, sy, tx, ty, out_size, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, in_h, in_w = images.shape
    out_h, out_w = out_size
    wy = _axis_weight_matrix(sy, ty, out_h, in_h)     # [B, oh, ih]
    wx = _axis_weight_matrix(sx, tx, out_w, in_w)     # [B, ow, iw]

    return pl.pallas_call(
        _fused_dots_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, out_h, in_h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, in_h, in_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_w, in_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_h, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.float32),
        interpret=interpret,
    )(wy.astype(jnp.float32), images.astype(jnp.float32),
      wx.astype(jnp.float32))


def _make_op(invert: bool):
    """Build the custom-vjp op for one direction. ``invert=True`` applies
    the backward (write) mapping theta' = [[1/s,0,-x/s],[0,1/s,-y/s]]
    (reference air/air_model.py:351-366)."""

    def _params(s, x, y):
        if invert:
            inv_s = 1.0 / s
            return inv_s, inv_s, -x * inv_s, -y * inv_s
        return s, s, x, y

    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
    def op(images, s, x, y, out_size, interpret):
        sx, sy, tx, ty = _params(s, x, y)
        return _resample_pallas(images, sx, sy, tx, ty, out_size, interpret)

    def _xla_equiv(images, s, x, y, out_size):
        sx, sy, tx, ty = _params(s, x, y)
        return separable_transform(images, sx, sy, tx, ty, out_size)

    def fwd(images, s, x, y, out_size, interpret):
        return op(images, s, x, y, out_size, interpret), (images, s, x, y)

    def bwd(out_size, interpret, res, g):
        images, s, x, y = res
        _, vjp = jax.vjp(
            lambda im, ss, xx, yy: _xla_equiv(im, ss, xx, yy, out_size),
            images, s, x, y)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


_read_op = _make_op(invert=False)
_write_op = _make_op(invert=True)


def pallas_attention_read(images, s, x, y, window_size: int,
                          interpret: bool | None = None):
    """Fused canvas->window resample (drop-in for ops.attention_read)."""
    if interpret is None:
        interpret = not pallas_available()
    return _read_op(images, s, x, y, (window_size, window_size), interpret)


def pallas_attention_write(windows, s, x, y, canvas_size: int,
                           interpret: bool | None = None):
    """Fused window->canvas resample (drop-in for ops.attention_write)."""
    if interpret is None:
        interpret = not pallas_available()
    return _write_op(windows, s, x, y, (canvas_size, canvas_size), interpret)
