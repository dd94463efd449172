"""Pallas ST kernels with IN-KERNEL bilinear-weight construction.

The round-2 fused kernels (st_pallas / st_fused) stream the per-axis
bilinear weight matrices W [B, out, in] from XLA — at the scaled config
([1024, 100, 28] fp32) that is ~11.5 MB per matrix per direction per scan
step of HBM traffic, and their cotangents flow back through XLA's
construction (VERDICT r2 #5 named this the last untried fusion).

This module removes the streams entirely using the closed hat form of the
zeros-pad weight matrix (ops/transformer.py:_axis_weight_matrix):

    W[i, j] = relu(1 - |p_i - j|),   p_i = (a * t_i + c + 1) * (in-1.001)/2

which is computable from TWO SCALARS (a, c) per batch element per axis —
so the kernel inputs shrink from [B, out, in] matrices to [B] scalars, and
the backward pass contracts the weight cotangents down to scalar
cotangents (d_a, d_c) INSIDE the kernel via

    dW/dp_i[j] = -sign(p_i - j) * 1{|p_i - j| < 1}    (a.e.)

Forward (write+accumulate, the AIR canvas update — air/air_model.py:429-439
composed with the backward ST :362-366):

    out[b] = canvas[b] + coeff[b] * (Wy(a_y,c_y) @ win[b] @ Wx(a_x,c_x)^T)

Backward is ONE Pallas kernel producing d_win [B, ws, ws] and the five
per-batch scalars (d_ay, d_cy, d_ax, d_cx, d_coeff); gradients w.r.t.
(s, x, y) are chained through the tiny scalar map outside. d_canvas = g.

The read direction (canvas -> window) is the mirror image with the roles
of out/in swapped and d_images [B, cs, cs] = Wy^T @ g @ Wx as the only
matrix cotangent.

Gradient caveat (shared with the hat-form XLA path): at integer p the
sub-gradient choice differs from the two-one-hot construction on a
measure-zero set; the (dim-1.001)/2 quirk keeps training off those points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from air_tpu.kernels.st_pallas import pallas_available


def _pick_block(batch: int, limit: int = 8) -> int:
    for bb in range(min(limit, batch), 0, -1):
        if batch % bb == 0:
            return bb
    return 1


def _hat(a, c, out_dim: int, in_dim: int):
    """W[i,j] = relu(1 - |p_i - j|) built from scalars inside the kernel."""
    # Mosaic requires integer iota (tpu.iota); cast to f32 after
    row = jax.lax.broadcasted_iota(
        jnp.int32, (out_dim, in_dim), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(
        jnp.int32, (out_dim, in_dim), 1).astype(jnp.float32)
    t = -1.0 + 2.0 * row / (out_dim - 1)          # linspace(-1, 1, out)
    p = (a * t + c + 1.0) * ((in_dim - 1.001) / 2.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(p - col)), p, col


# -------------------- write + masked accumulate -----------------------------

def _wr_fwd_kernel(ay_ref, cy_ref, ax_ref, cx_ref, coeff_ref,
                   win_ref, canvas_ref, out_ref, *, cs: int, ws: int):
    bb = win_ref.shape[0]
    for b in range(bb):
        wy, _, _ = _hat(ay_ref[b, 0], cy_ref[b, 0], cs, ws)
        wx, _, _ = _hat(ax_ref[b, 0], cx_ref[b, 0], cs, ws)
        tmp = jnp.dot(wy, win_ref[b], preferred_element_type=jnp.float32)
        recon = jax.lax.dot_general(
            tmp, wx, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [cs, cs]
        out_ref[b] = canvas_ref[b] + coeff_ref[b, 0] * recon


def _wr_bwd_kernel(ay_ref, cy_ref, ax_ref, cx_ref, coeff_ref,
                   win_ref, g_ref,
                   dwin_ref, day_ref, dcy_ref, dax_ref, dcx_ref,
                   dcoeff_ref, *, cs: int, ws: int):
    bb = win_ref.shape[0]
    kpix = (ws - 1.001) / 2.0
    for b in range(bb):
        c = coeff_ref[b, 0]
        g = g_ref[b]                                             # [cs, cs]
        wy, py, jy = _hat(ay_ref[b, 0], cy_ref[b, 0], cs, ws)
        wx, px, jx = _hat(ax_ref[b, 0], cx_ref[b, 0], cs, ws)
        gwx = jnp.dot(g, wx, preferred_element_type=jnp.float32)  # [cs, ws]
        tmp = jnp.dot(wy, win_ref[b],
                      preferred_element_type=jnp.float32)         # [cs, ws]
        # d_win = c * wy^T @ gwx
        dwin_ref[b] = c * jax.lax.dot_general(
            wy, gwx, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dWy = c * gwx @ win^T ; dWx = c * g^T @ tmp    (both [cs, ws])
        dwy = c * jax.lax.dot_general(
            gwx, win_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwx = c * jax.lax.dot_general(
            g, tmp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # contract weight cotangents to per-axis scalars:
        # dp_i = sum_j dW[i,j] * (-sign(p_i - j)) * 1{|p_i - j| < 1}
        # d_a = k * sum_i t_i dp_i ; d_c = k * sum_i dp_i
        row = jax.lax.broadcasted_iota(
            jnp.int32, (cs, ws), 0).astype(jnp.float32)
        t = -1.0 + 2.0 * row / (cs - 1)                       # [cs, ws]
        my = (jnp.abs(py - jy) < 1.0).astype(jnp.float32)
        dpy = dwy * (-jnp.sign(py - jy)) * my
        day_ref[b:b + 1, :] = (kpix * jnp.sum(t * dpy)).reshape(1, 1)
        dcy_ref[b:b + 1, :] = (kpix * jnp.sum(dpy)).reshape(1, 1)
        mx = (jnp.abs(px - jx) < 1.0).astype(jnp.float32)
        dpx = dwx * (-jnp.sign(px - jx)) * mx
        dax_ref[b:b + 1, :] = (kpix * jnp.sum(t * dpx)).reshape(1, 1)
        dcx_ref[b:b + 1, :] = (kpix * jnp.sum(dpx)).reshape(1, 1)
        # d_coeff = <g, recon>
        recon = jax.lax.dot_general(
            tmp, wx, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dcoeff_ref[b:b + 1, :] = jnp.sum(g * recon).reshape(1, 1)


def _specs(bb, shapes):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return [pl.BlockSpec((bb, *s), lambda i, n=len(s): (i, *([0] * n)),
                         memory_space=pltpu.VMEM) for s in shapes]


def _col(v):
    return v.reshape(-1, 1).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _write_core(canvas, win, ay, cy, ax, cx, coeff, cs, interpret):
    return _write_fwd_call(canvas, win, ay, cy, ax, cx, coeff, cs, interpret)


def _write_fwd_call(canvas, win, ay, cy, ax, cx, coeff, cs, interpret):
    from jax.experimental import pallas as pl
    b, ws, _ = win.shape
    bb = _pick_block(b)
    in_specs = _specs(bb, [(1,)] * 5 + [(ws, ws), (cs, cs)])
    (out_spec,) = _specs(bb, [(cs, cs)])
    return pl.pallas_call(
        functools.partial(_wr_fwd_kernel, cs=cs, ws=ws),
        grid=(b // bb,),
        in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, cs, cs), jnp.float32),
        input_output_aliases={6: 0},       # canvas accumulated in place
        interpret=interpret,
    )(_col(ay), _col(cy), _col(ax), _col(cx), _col(coeff),
      win.astype(jnp.float32), canvas.astype(jnp.float32))


def _write_fwd(canvas, win, ay, cy, ax, cx, coeff, cs, interpret):
    out = _write_fwd_call(canvas, win, ay, cy, ax, cx, coeff, cs, interpret)
    return out, (win, ay, cy, ax, cx, coeff)


def _write_bwd(cs, interpret, res, g):
    from jax.experimental import pallas as pl
    win, ay, cy, ax, cx, coeff = res
    b, ws, _ = win.shape
    bb = _pick_block(b)
    in_specs = _specs(bb, [(1,)] * 5 + [(ws, ws), (cs, cs)])
    out_specs = _specs(bb, [(ws, ws), (1,), (1,), (1,), (1,), (1,)])
    dwin, day, dcy, dax, dcx, dcoeff = pl.pallas_call(
        functools.partial(_wr_bwd_kernel, cs=cs, ws=ws),
        grid=(b // bb,),
        in_specs=in_specs, out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, ws, ws), jnp.float32),
            *([jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 5),
        ],
        interpret=interpret,
    )(_col(ay), _col(cy), _col(ax), _col(cx), _col(coeff),
      win.astype(jnp.float32), g.astype(jnp.float32))
    return (g, dwin.astype(win.dtype),
            day[:, 0].astype(ay.dtype), dcy[:, 0].astype(cy.dtype),
            dax[:, 0].astype(ax.dtype), dcx[:, 0].astype(cx.dtype),
            dcoeff[:, 0].astype(coeff.dtype))


_write_core.defvjp(_write_fwd, _write_bwd)


def inline_write_accumulate(canvas_flat: jnp.ndarray, windows: jnp.ndarray,
                            s: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                            coeff: jnp.ndarray, canvas_size: int,
                            interpret: bool | None = None) -> jnp.ndarray:
    """``canvas + coeff * attention_write(windows, s, x, y)`` with the
    bilinear weights built INSIDE the kernel from (s, x, y) — no [B, cs, ws]
    weight streams in either direction. Drop-in for
    st_fused.fused_write_accumulate."""
    if interpret is None:
        interpret = not pallas_available()
    b = canvas_flat.shape[0]
    cs = canvas_size
    windows = windows.reshape(b, -1)
    ws = int(round(windows.shape[-1] ** 0.5))
    windows = windows.reshape(b, ws, ws)

    def eff(s, x, y):
        inv_s = 1.0 / s
        return inv_s, -y * inv_s, inv_s, -x * inv_s   # (ay, cy, ax, cx)

    ay, cy, ax, cx = eff(s, x, y)
    out = _write_core(canvas_flat.reshape(b, cs, cs), windows,
                      ay, cy, ax, cx, coeff, cs, interpret)
    return out.reshape(b, cs * cs)


# -------------------- fused read (canvas -> window) -------------------------

def _rd_fwd_kernel(ay_ref, cy_ref, ax_ref, cx_ref, img_ref, out_ref,
                   *, cs: int, ws: int):
    bb = img_ref.shape[0]
    for b in range(bb):
        wy, _, _ = _hat(ay_ref[b, 0], cy_ref[b, 0], ws, cs)
        wx, _, _ = _hat(ax_ref[b, 0], cx_ref[b, 0], ws, cs)
        tmp = jnp.dot(wy, img_ref[b], preferred_element_type=jnp.float32)
        out_ref[b] = jax.lax.dot_general(
            tmp, wx, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [ws, ws]


def _rd_bwd_kernel(ay_ref, cy_ref, ax_ref, cx_ref, img_ref, g_ref,
                   dimg_ref, day_ref, dcy_ref, dax_ref, dcx_ref,
                   *, cs: int, ws: int):
    bb = img_ref.shape[0]
    kpix = (cs - 1.001) / 2.0
    for b in range(bb):
        g = g_ref[b]                                             # [ws, ws]
        wy, py, jy = _hat(ay_ref[b, 0], cy_ref[b, 0], ws, cs)
        wx, px, jx = _hat(ax_ref[b, 0], cx_ref[b, 0], ws, cs)
        gwx = jnp.dot(g, wx, preferred_element_type=jnp.float32)  # [ws, cs]
        tmp = jnp.dot(wy, img_ref[b],
                      preferred_element_type=jnp.float32)         # [ws, cs]
        # d_img = wy^T @ g @ wx = wy^T @ gwx
        dimg_ref[b] = jax.lax.dot_general(
            wy, gwx, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dWy = g @ (img @ wx^T)^T = gwx @ img^T ; dWx = g^T @ tmp
        dwy = jax.lax.dot_general(
            gwx, img_ref[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [ws, cs]
        dwx = jax.lax.dot_general(
            g, tmp, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [ws, cs]
        row = jax.lax.broadcasted_iota(
            jnp.int32, (ws, cs), 0).astype(jnp.float32)
        t = -1.0 + 2.0 * row / (ws - 1)
        my = (jnp.abs(py - jy) < 1.0).astype(jnp.float32)
        dpy = dwy * (-jnp.sign(py - jy)) * my
        day_ref[b:b + 1, :] = (kpix * jnp.sum(t * dpy)).reshape(1, 1)
        dcy_ref[b:b + 1, :] = (kpix * jnp.sum(dpy)).reshape(1, 1)
        mx = (jnp.abs(px - jx) < 1.0).astype(jnp.float32)
        dpx = dwx * (-jnp.sign(px - jx)) * mx
        dax_ref[b:b + 1, :] = (kpix * jnp.sum(t * dpx)).reshape(1, 1)
        dcx_ref[b:b + 1, :] = (kpix * jnp.sum(dpx)).reshape(1, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _read_core(images, ay, cy, ax, cx, ws, interpret):
    return _read_fwd_call(images, ay, cy, ax, cx, ws, interpret)


def _read_fwd_call(images, ay, cy, ax, cx, ws, interpret):
    from jax.experimental import pallas as pl
    b, cs, _ = images.shape
    bb = _pick_block(b)
    in_specs = _specs(bb, [(1,)] * 4 + [(cs, cs)])
    (out_spec,) = _specs(bb, [(ws, ws)])
    return pl.pallas_call(
        functools.partial(_rd_fwd_kernel, cs=cs, ws=ws),
        grid=(b // bb,),
        in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, ws, ws), jnp.float32),
        interpret=interpret,
    )(_col(ay), _col(cy), _col(ax), _col(cx), images.astype(jnp.float32))


def _read_fwd(images, ay, cy, ax, cx, ws, interpret):
    out = _read_fwd_call(images, ay, cy, ax, cx, ws, interpret)
    return out, (images, ay, cy, ax, cx)


def _read_bwd(ws, interpret, res, g):
    from jax.experimental import pallas as pl
    images, ay, cy, ax, cx = res
    b, cs, _ = images.shape
    bb = _pick_block(b)
    in_specs = _specs(bb, [(1,)] * 4 + [(cs, cs), (ws, ws)])
    out_specs = _specs(bb, [(cs, cs), (1,), (1,), (1,), (1,)])
    dimg, day, dcy, dax, dcx = pl.pallas_call(
        functools.partial(_rd_bwd_kernel, cs=cs, ws=ws),
        grid=(b // bb,),
        in_specs=in_specs, out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, cs, cs), jnp.float32),
            *([jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 4),
        ],
        interpret=interpret,
    )(_col(ay), _col(cy), _col(ax), _col(cx),
      images.astype(jnp.float32), g.astype(jnp.float32))
    return (dimg.astype(images.dtype),
            day[:, 0].astype(ay.dtype), dcy[:, 0].astype(cy.dtype),
            dax[:, 0].astype(ax.dtype), dcx[:, 0].astype(cx.dtype))


_read_core.defvjp(_read_fwd, _read_bwd)


def inline_attention_read(images: jnp.ndarray, s: jnp.ndarray,
                          x: jnp.ndarray, y: jnp.ndarray, window_size: int,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Fused canvas->window resample with in-kernel weights + all-Pallas
    VJP (drop-in for ops.attention_read / st_pallas.pallas_attention_read).
    """
    if interpret is None:
        interpret = not pallas_available()
    # forward theta [[s, 0, x], [0, s, y]]: rows (y axis) use (s, y),
    # columns (x axis) use (s, x)
    return _read_core(images, s, y, s, x, window_size, interpret)
