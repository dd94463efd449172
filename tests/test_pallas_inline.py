"""In-kernel weight-construction ST kernels (kernels/st_inline.py) vs the
XLA separable path — values AND the all-Pallas scalar-cotangent VJP
(interpret mode on CPU; the same kernels compile natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from air_tpu.kernels.st_inline import (
    inline_attention_read, inline_write_accumulate)
from air_tpu.ops.transformer import attention_read, attention_write


def _inputs(b=5, cs=30, ws=12, seed=0):
    rng = np.random.default_rng(seed)
    canvas = jnp.asarray(rng.uniform(size=(b, cs * cs)).astype(np.float32))
    windows = jnp.asarray(rng.uniform(size=(b, ws, ws)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.2, 0.9, b).astype(np.float32))
    x = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
    y = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
    coeff = jnp.asarray(rng.uniform(0.0, 1.0, b).astype(np.float32))
    return canvas, windows, s, x, y, coeff


def _xla_write_accumulate(canvas, windows, s, x, y, coeff, cs):
    wr = attention_write(windows, s, x, y, cs)
    return canvas + coeff[:, None] * wr.reshape(canvas.shape[0], cs * cs)


def test_read_matches_xla():
    _, _, s, x, y, _ = _inputs()
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(size=(5, 50, 50)).astype(np.float32))
    got = inline_attention_read(images, s, x, y, 28, interpret=True)
    want = attention_read(images, s, x, y, 28)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_read_grads_match_xla():
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(size=(4, 20, 20)).astype(np.float32))
    _, _, s, x, y, _ = _inputs(b=4, seed=3)

    def loss_inline(im, ss, xx, yy):
        return jnp.sum(
            inline_attention_read(im, ss, xx, yy, 8, interpret=True) ** 2)

    def loss_xla(im, ss, xx, yy):
        return jnp.sum(attention_read(im, ss, xx, yy, 8) ** 2)

    g1 = jax.grad(loss_inline, argnums=(0, 1, 2, 3))(images, s, x, y)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(images, s, x, y)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_write_accumulate_matches_xla():
    canvas, windows, s, x, y, coeff = _inputs()
    got = inline_write_accumulate(canvas, windows, s, x, y, coeff, 30,
                                  interpret=True)
    want = _xla_write_accumulate(canvas, windows, s, x, y, coeff, 30)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_write_accumulate_grads_match_xla():
    """The scalar-cotangent VJP must match the XLA composite for EVERY
    input: canvas, windows, s, x, y, coeff."""
    canvas, windows, s, x, y, coeff = _inputs(b=4, cs=20, ws=8, seed=5)
    cs = 20
    probe = jnp.asarray(np.random.default_rng(9).normal(
        size=(4, cs * cs)).astype(np.float32))

    def loss_inline(*a):
        return jnp.sum(probe * inline_write_accumulate(
            *a, cs, interpret=True))

    def loss_xla(*a):
        return jnp.sum(probe * _xla_write_accumulate(*a, cs))

    g1 = jax.grad(loss_inline, argnums=tuple(range(6)))(
        canvas, windows, s, x, y, coeff)
    g2 = jax.grad(loss_xla, argnums=tuple(range(6)))(
        canvas, windows, s, x, y, coeff)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_odd_batch_and_flat_windows():
    """Any batch size; windows accepted flat [B, ws*ws] like the model
    passes them (fused_write_accumulate drop-in contract)."""
    for b in (1, 3, 7):
        canvas, windows, s, x, y, coeff = _inputs(b=b, seed=b)
        flat = windows.reshape(b, -1)
        got = inline_write_accumulate(canvas, flat, s, x, y, coeff, 30,
                                      interpret=True)
        want = _xla_write_accumulate(canvas, windows, s, x, y, coeff, 30)
        assert got.shape == (b, 900)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_model_with_inline_st():
    """The model forward runs with st_impl='inline' and matches XLA,
    values and training gradients."""
    from air_tpu.models.air import air_forward, init_air_params
    from tests.test_model import SMALL
    cfg_i = SMALL.replace(st_impl="inline")
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (4, SMALL.canvas_size ** 2))
    targets = jnp.array([1, 1, 2, 0], jnp.int32)
    k = jax.random.PRNGKey(2)
    out_x = air_forward(params, SMALL, images, targets, k, train=True)
    out_i = air_forward(params, cfg_i, images, targets, k, train=True)
    np.testing.assert_allclose(float(out_i.loss), float(out_x.loss),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_i.reconstruction),
                               np.asarray(out_x.reconstruction), atol=1e-4)

    def grads(cfg):
        def f(p):
            return air_forward(p, cfg, images, targets, k, train=True).loss
        return jax.grad(f)(params)

    gx, gi = grads(SMALL), grads(cfg_i)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(a)) + 1e-8)), gx, gi)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3
