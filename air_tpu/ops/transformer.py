"""Spatial transformer ops, TPU-first.

Functional parity target: the Jaderberg-STN ``transformer(U, theta, out_size)``
vendored by the reference (reference air/transformer.py:18-175), including its
coordinate quirk: normalized coords in [-1, 1] map to pixel coordinates via
``(x + 1) * (dim - 1.001) / 2`` (reference air/transformer.py:75-76), and
out-of-range samples contribute zero (clamped corner indices collapse and the
bilinear weights cancel).

Two execution strategies:

1. ``transformer`` — the general path: affine grid + 4-corner gather, mirrors
   the reference op-for-op in XLA. Handles arbitrary 2x3 thetas (rotation,
   shear). Used for parity tests and ``batch_transformer``.

2. ``separable_transform`` — the TPU-native fast path for *axis-aligned*
   thetas ``[[sx, 0, tx], [0, sy, ty]]`` (the only form AIR ever uses:
   reference air/air_model.py:322-366). Bilinear weights factor per axis, so
   the whole resample becomes two small batched matmuls
   ``out = Wy @ im @ Wx^T`` that run on the MXU instead of scattered gathers.
   Exactly equal to the general path for such thetas (bilinear weights are
   separable: w = wx * wy).

``attention_read`` / ``attention_write`` are the model-facing wrappers for
canvas->window and window->canvas resampling used by the AIR scan body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pixel_coords(coords: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Map normalized [-1, 1] coords to pixel space, reference quirk included.

    Mirrors reference air/transformer.py:75-76: ``(x + 1) * (W - 1.001) / 2``.
    """
    return (coords + 1.0) * (dim - 1.001) / 2.0


def _corner_weights(p: jnp.ndarray, dim: int):
    """CLAMPED floor/ceil corner indices and their linear weights.

    Out-of-range samples produce ``lo == hi`` after clamping, making
    ``w_lo + w_hi == 0`` — i.e. implicit zero padding, exactly like the
    reference's clip-then-weight order (air/transformer.py:79-116).

    Training-dynamics caveat: because the cancellation is built from the
    clamped (constant) indices, the VALUE is zero outside the support AND
    its derivative w.r.t. p is exactly zero there — a sample that has
    slipped off the image gets no coordinate gradient. See
    ``_axis_weight_matrix(pad_mode=...)``.
    """
    p0 = jnp.floor(p)
    lo = jnp.clip(p0.astype(jnp.int32), 0, dim - 1)
    hi = jnp.clip(p0.astype(jnp.int32) + 1, 0, dim - 1)
    lo_f = lo.astype(p.dtype)
    hi_f = hi.astype(p.dtype)
    w_lo = hi_f - p
    w_hi = p - lo_f
    return lo, hi, w_lo, w_hi


def _axis_weight_matrix(scale: jnp.ndarray, shift: jnp.ndarray,
                        out_dim: int, in_dim: int,
                        pad_mode: str = "zeros") -> jnp.ndarray:
    """Per-batch bilinear interpolation matrix for one axis.

    Returns W of shape [B, out_dim, in_dim] with
    ``W[b, i, j] = w_lo * [j == lo] + w_hi * [j == hi]`` for the source
    coordinate of output position i under ``src = scale * t_i + shift``.

    pad_mode:
      * ``"zeros"`` (default): true zero padding — corner indices are NOT
        clamped; an out-of-range corner contributes nothing (``one_hot`` of
        an out-of-range index is the zero vector), so the value decays
        linearly to zero over the one-pixel band outside the support and
        carries a nonzero coordinate gradient there. This gradient —
        amplified by the BCE's 1/eps at unexplained ink — is the force that
        pulls AIR's attention windows toward objects; without it training
        collapses to the blank-canvas optimum (verified empirically against
        an independent torch/grid_sample implementation).
      * ``"clamp_cancel"``: the reference's clip-then-weight quirk
        (air/transformer.py:79-116) — identical values except inside that
        one-pixel band (where it is exactly 0), but zero gradient off the
        support. Kept for value-parity testing.
    """
    t = jnp.linspace(-1.0, 1.0, out_dim)                       # [out]
    src = scale[:, None] * t[None, :] + shift[:, None]         # [B, out]
    p = _pixel_coords(src, in_dim)
    if pad_mode == "clamp_cancel":
        lo, hi, w_lo, w_hi = _corner_weights(p, in_dim)
        w = (jax.nn.one_hot(lo, in_dim, dtype=p.dtype) * w_lo[..., None]
             + jax.nn.one_hot(hi, in_dim, dtype=p.dtype) * w_hi[..., None])
    elif pad_mode == "zeros":
        # closed "hat" form: one_hot(lo)*w_lo + one_hot(hi)*w_hi with
        # unclamped corners collapses to W[b,i,j] = relu(1 - |p_bi - j|)
        # (the bilinear tent centered at p; out-of-range corners drop out
        # automatically). Identical values to the explicit construction
        # and — crucially — a purely ELEMENTWISE VJP: the one_hot form's
        # cotangent lowers to gathers/scatters over [B, out, in], the hat
        # form's to a mask-multiply-reduce the TPU vectorizes flat.
        # Derivative w.r.t. p differs only at integer p (measure zero).
        j = jnp.arange(in_dim, dtype=p.dtype)                  # [in]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - j))
    else:
        raise ValueError(f"unknown pad_mode: {pad_mode!r}")
    return w                                                    # [B, out, in]


def separable_transform(images: jnp.ndarray,
                        sx: jnp.ndarray, sy: jnp.ndarray,
                        tx: jnp.ndarray, ty: jnp.ndarray,
                        out_size: tuple[int, int],
                        pad_mode: str = "zeros") -> jnp.ndarray:
    """Resample [B, H, W] images under theta = [[sx,0,tx],[0,sy,ty]].

    MXU path: builds per-axis interpolation matrices and contracts
    ``out = Wy @ im @ Wx^T``. Differentiable w.r.t. images and all of
    sx/sy/tx/ty (gradients flow through the bilinear weights; see
    ``_axis_weight_matrix`` for the off-support gradient semantics of
    ``pad_mode``).
    """
    _, in_h, in_w = images.shape
    out_h, out_w = out_size
    wy = _axis_weight_matrix(sy, ty, out_h, in_h, pad_mode)  # [B, oh, ih]
    wx = _axis_weight_matrix(sx, tx, out_w, in_w, pad_mode)  # [B, ow, iw]
    # [B,out_h,in_h] @ [B,in_h,in_w] -> [B,out_h,in_w]; then @ [B,in_w,out_w]
    tmp = jnp.einsum("bij,bjk->bik", wy, images,
                     preferred_element_type=images.dtype)
    out = jnp.einsum("bik,blk->bil", tmp, wx,
                     preferred_element_type=images.dtype)
    return out


def attention_read(images: jnp.ndarray, s: jnp.ndarray,
                   x: jnp.ndarray, y: jnp.ndarray,
                   window_size: int, pad_mode: str = "zeros") -> jnp.ndarray:
    """Canvas -> attention window under forward theta [[s,0,x],[0,s,y]].

    Value-equivalent to reference air/air_model.py:322-333 (transformer
    with the forward ST theta) except in the one-pixel off-support band —
    see ``_axis_weight_matrix`` for why ``pad_mode="zeros"`` is the
    training default.
    """
    return separable_transform(images, s, s, x, y,
                               (window_size, window_size), pad_mode)


def attention_write(windows: jnp.ndarray, s: jnp.ndarray,
                    x: jnp.ndarray, y: jnp.ndarray,
                    canvas_size: int, pad_mode: str = "zeros") -> jnp.ndarray:
    """Window -> canvas under backward theta [[1/s,0,-x/s],[0,1/s,-y/s]].

    Value-equivalent to reference air/air_model.py:351-366 (same band
    caveat as ``attention_read``).
    """
    inv_s = 1.0 / s
    return separable_transform(windows, inv_s, inv_s, -x * inv_s, -y * inv_s,
                               (canvas_size, canvas_size), pad_mode)


def affine_grid(theta: jnp.ndarray, out_size: tuple[int, int]) -> jnp.ndarray:
    """Source sampling grid for arbitrary 2x3 thetas.

    Returns (x_s, y_s) stacked as [B, 2, out_h*out_w] — the reference's
    ``theta @ meshgrid`` (air/transformer.py:119-161).
    """
    out_h, out_w = out_size
    xs = jnp.linspace(-1.0, 1.0, out_w)
    ys = jnp.linspace(-1.0, 1.0, out_h)
    x_t, y_t = jnp.meshgrid(xs, ys)                     # [out_h, out_w]
    ones = jnp.ones_like(x_t)
    grid = jnp.stack([x_t.ravel(), y_t.ravel(), ones.ravel()], axis=0)  # [3, N]
    theta = theta.reshape(-1, 2, 3).astype(grid.dtype)
    return jnp.einsum("bij,jn->bin", theta, grid)       # [B, 2, N]


def _bilinear_gather(images: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     out_size: tuple[int, int]) -> jnp.ndarray:
    """4-corner gather interpolation; general-path twin of the reference's
    ``_interpolate`` (air/transformer.py:56-117). images: [B, H, W, C],
    x/y: [B, N] normalized coords."""
    _, in_h, in_w, _ = images.shape
    px = _pixel_coords(x, in_w)
    py = _pixel_coords(y, in_h)
    x0, x1, wx0, wx1 = _corner_weights(px, in_w)
    y0, y1, wy0, wy1 = _corner_weights(py, in_h)

    def gather(yi, xi):
        # vmap over batch: per-image fancy gather of N points
        return jax.vmap(lambda im, yy, xx: im[yy, xx])(images, yi, xi)

    ia = gather(y0, x0)
    ib = gather(y1, x0)
    ic = gather(y0, x1)
    id_ = gather(y1, x1)
    wa = (wx0 * wy0)[..., None]
    wb = (wx0 * wy1)[..., None]
    wc = (wx1 * wy0)[..., None]
    wd = (wx1 * wy1)[..., None]
    out = wa * ia + wb * ib + wc * ic + wd * id_
    out_h, out_w = out_size
    return out.reshape(images.shape[0], out_h, out_w, images.shape[3])


def transformer(images: jnp.ndarray, theta: jnp.ndarray,
                out_size: tuple[int, int]) -> jnp.ndarray:
    """General spatial transformer: [B, H, W, C] x [B, 2, 3] -> [B, oh, ow, C].

    API/semantic parity with reference air/transformer.py:18-175 (any 2x3
    affine). AIR's hot path should use ``attention_read``/``attention_write``.
    """
    grid = affine_grid(theta, out_size)
    x_s = grid[:, 0, :]
    y_s = grid[:, 1, :]
    return _bilinear_gather(images, x_s, y_s, out_size)


def batch_transformer(images: jnp.ndarray, thetas: jnp.ndarray,
                      out_size: tuple[int, int]) -> jnp.ndarray:
    """Apply N thetas per image (reference air/transformer.py:178-195).

    images: [B, H, W, C]; thetas: [B, N, 6] or [B, N, 2, 3].
    Returns [B*N, out_h, out_w, C].
    """
    b = images.shape[0]
    n = thetas.shape[1]
    rep = jnp.repeat(images, n, axis=0)
    return transformer(rep, thetas.reshape(b * n, 2, 3), out_size)
