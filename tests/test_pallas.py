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


def test_batch_padding():
    """Batch not divisible by the tile gets padded and trimmed."""
    images, s, x, y = _inputs(b=3)
    got = pallas_attention_read(images, s, x, y, 12, interpret=True)
    assert got.shape == (3, 12, 12)
    want = attention_read(images, s, x, y, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


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
