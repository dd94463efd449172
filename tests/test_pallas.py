"""Pallas fused ST kernels vs the XLA separable path (interpret mode on
CPU; the same kernels compile natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from air_tpu.kernels.st_pallas import (
    pallas_attention_read, pallas_attention_write)
from air_tpu.ops.transformer import attention_read, attention_write


def _inputs(b=5, cs=50, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.uniform(size=(b, cs, cs)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.2, 0.9, b).astype(np.float32))
    x = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
    y = jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32))
    return images, s, x, y


def test_read_matches_xla():
    images, s, x, y = _inputs()
    got = pallas_attention_read(images, s, x, y, 28, interpret=True)
    want = attention_read(images, s, x, y, 28)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_write_matches_xla():
    rng = np.random.default_rng(1)
    windows = jnp.asarray(rng.uniform(size=(5, 28, 28)).astype(np.float32))
    _, s, x, y = _inputs(seed=1)
    got = pallas_attention_write(windows, s, x, y, 50, interpret=True)
    want = attention_write(windows, s, x, y, 50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_odd_batch_sizes():
    """Any batch size works (the grid covers b exactly; the fused kernel
    picks a block size dividing b — no silent padding exists or is
    claimed)."""
    for b in (1, 3, 7):
        images, s, x, y = _inputs(b=b)
        got = pallas_attention_read(images, s, x, y, 12, interpret=True)
        assert got.shape == (b, 12, 12)
        want = attention_read(images, s, x, y, 12)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def _fused_inputs(b=6, cs=30, ws=12, seed=3):
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


def test_fused_write_accumulate_matches_xla():
    from air_tpu.kernels.st_fused import fused_write_accumulate
    canvas, windows, s, x, y, coeff = _fused_inputs()
    cs = 30
    got = fused_write_accumulate(canvas, windows, s, x, y, coeff, cs,
                                 interpret=True)
    want = _xla_write_accumulate(canvas, windows, s, x, y, coeff, cs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_write_accumulate_grads():
    """The all-Pallas VJP must match the XLA composite's gradients for
    EVERY input: canvas, windows, s, x, y, coeff."""
    from air_tpu.kernels.st_fused import fused_write_accumulate
    canvas, windows, s, x, y, coeff = _fused_inputs(b=4, cs=20, ws=8)
    cs = 20
    probe = jnp.asarray(np.random.default_rng(9).normal(
        size=(4, cs * cs)).astype(np.float32))

    def loss_fused(*a):
        return jnp.sum(probe * fused_write_accumulate(
            *a, cs, interpret=True))

    def loss_xla(*a):
        return jnp.sum(probe * _xla_write_accumulate(*a, cs))

    g1 = jax.grad(loss_fused, argnums=tuple(range(6)))(
        canvas, windows, s, x, y, coeff)
    g2 = jax.grad(loss_xla, argnums=tuple(range(6)))(
        canvas, windows, s, x, y, coeff)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_grads_match_xla_path():
    images, s, x, y = _inputs(b=4, cs=20)

    def loss_pallas(im, ss, xx, yy):
        return jnp.sum(
            pallas_attention_read(im, ss, xx, yy, 8, interpret=True) ** 2)

    def loss_xla(im, ss, xx, yy):
        return jnp.sum(attention_read(im, ss, xx, yy, 8) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(images, s, x, y)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(images, s, x, y)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_model_with_pallas_st():
    """The model forward runs with st_impl='pallas' and matches XLA."""
    from air_tpu.models.air import air_forward, init_air_params
    from tests.test_model import SMALL
    cfg_p = SMALL.replace(st_impl="pallas")
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (4, SMALL.canvas_size ** 2))
    targets = jnp.array([1, 1, 2, 0], jnp.int32)
    k = jax.random.PRNGKey(2)
    out_x = air_forward(params, SMALL, images, targets, k, train=True)
    out_p = air_forward(params, cfg_p, images, targets, k, train=True)
    np.testing.assert_allclose(float(out_p.loss), float(out_x.loss),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.reconstruction),
                               np.asarray(out_x.reconstruction), atol=1e-4)
    # training gradients agree between the two implementations
    def loss(cfg):
        def f(p):
            return air_forward(p, cfg, images, targets, k, train=True).loss
        return jax.grad(f)(params)
    gx, gp = loss(SMALL), loss(cfg_p)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(a)) + 1e-8)), gx, gp)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-3
