"""Spatial transformer ops vs. numpy oracle, incl. the (dim-1.001)/2 quirk."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from air_tpu.ops.transformer import (
    transformer, batch_transformer, separable_transform,
    attention_read, attention_write,
)
from tests.oracles import np_transformer


def make_thetas(rng, b, axis_aligned=True):
    s = rng.uniform(0.2, 1.2, size=b)
    tx = rng.uniform(-0.8, 0.8, size=b)
    ty = rng.uniform(-0.8, 0.8, size=b)
    theta = np.zeros((b, 2, 3))
    theta[:, 0, 0] = s
    theta[:, 1, 1] = s
    theta[:, 0, 2] = tx
    theta[:, 1, 2] = ty
    if not axis_aligned:
        theta[:, 0, 1] = rng.uniform(-0.3, 0.3, size=b)
        theta[:, 1, 0] = rng.uniform(-0.3, 0.3, size=b)
    return theta, s, tx, ty


def test_hat_weight_matrix_equals_one_hot_construction(rng):
    """The closed "hat" form relu(1 - |p - j|) must reproduce the explicit
    one_hot(lo)*w_lo + one_hot(hi)*w_hi construction exactly (values), for
    in-range, boundary, and fully off-support coordinates."""
    from air_tpu.ops.transformer import _axis_weight_matrix, _pixel_coords
    out_dim, in_dim = 28, 50
    scale = jnp.asarray(np.concatenate([
        rng.uniform(0.05, 1.5, 13), [1.0, 0.3]]))       # incl. exact 1.0
    shift = jnp.asarray(np.concatenate([
        rng.uniform(-1.0, 1.0, 13), [0.0, 3.0]]))       # incl. off-support
    got = _axis_weight_matrix(scale, shift, out_dim, in_dim, "zeros")

    # oracle: the explicit unclamped-corner construction
    t = jnp.linspace(-1.0, 1.0, out_dim)
    p = _pixel_coords(scale[:, None] * t[None, :] + shift[:, None], in_dim)
    lo = jnp.floor(p).astype(jnp.int32)
    w_lo = (lo + 1).astype(p.dtype) - p
    w_hi = p - lo.astype(p.dtype)
    want = (jax.nn.one_hot(lo, in_dim, dtype=p.dtype) * w_lo[..., None]
            + jax.nn.one_hot(lo + 1, in_dim, dtype=p.dtype)
            * w_hi[..., None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_general_transformer_matches_oracle(rng):
    b, h, w = 4, 50, 50
    images = rng.uniform(size=(b, h, w, 1)).astype(np.float32)
    theta, *_ = make_thetas(rng, b, axis_aligned=False)
    got = np.asarray(transformer(jnp.asarray(images), jnp.asarray(theta),
                                 (28, 28)))
    want = np_transformer(images, theta, (28, 28))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_separable_matches_general_for_axis_aligned(rng):
    b, h, w = 8, 50, 50
    images = rng.uniform(size=(b, h, w)).astype(np.float32)
    theta, s, tx, ty = make_thetas(rng, b)
    got = np.asarray(separable_transform(
        jnp.asarray(images), jnp.asarray(s), jnp.asarray(s),
        jnp.asarray(tx), jnp.asarray(ty), (28, 28),
        pad_mode="clamp_cancel"))
    want = np_transformer(images, theta, (28, 28))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_zeros_pad_matches_clamp_inside_support(rng):
    """pad_mode='zeros' equals the reference semantics everywhere except
    the 1-px off-support band, and carries a nonzero coordinate gradient
    off-support (the AIR localization bootstrap force — see
    ops/transformer.py)."""
    b = 4
    images = jnp.asarray(rng.uniform(size=(b, 30, 30)).astype(np.float32))
    s = jnp.full((b,), 0.4)
    tx = jnp.full((b,), 0.1)
    ty = jnp.full((b,), -0.2)
    a = separable_transform(images, s, s, tx, ty, (12, 12), "zeros")
    c = separable_transform(images, s, s, tx, ty, (12, 12), "clamp_cancel")
    # fully inside the canvas -> identical
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)

    # a window hanging off the canvas edge: values differ only in the
    # decay band; zeros-mode has nonzero d/dshift there, clamp-mode zero
    tx_edge = jnp.full((b,), 1.05)    # sample band beyond the right edge

    def edge_sum(mode):
        def f(t):
            return jnp.sum(separable_transform(
                images, jnp.full((b,), 0.02), jnp.full((b,), 0.02),
                t, jnp.zeros((b,)), (4, 4), mode))
        return jax.grad(f)(tx_edge)

    g_zeros = np.asarray(edge_sum("zeros"))
    g_clamp = np.asarray(edge_sum("clamp_cancel"))
    assert np.any(g_zeros != 0)
    np.testing.assert_allclose(g_clamp, 0.0, atol=1e-6)


def test_out_of_range_samples_are_zero(rng):
    """Clamped-corner weight cancellation => implicit zero padding
    (reference air/transformer.py:79-116 behavior)."""
    b = 2
    images = np.ones((b, 50, 50), np.float32)
    # scale 3.0 shifts most sample points far outside the canvas
    s = np.full(b, 3.0)
    t = np.zeros(b)
    out = np.asarray(separable_transform(
        jnp.asarray(images), jnp.asarray(s), jnp.asarray(s),
        jnp.asarray(t), jnp.asarray(t), (28, 28)))
    # corners of the window sample far outside -> exactly 0
    assert out[0, 0, 0] == 0.0
    assert out[0, -1, -1] == 0.0
    # center is inside -> ~1
    np.testing.assert_allclose(out[:, 14, 14], 1.0, atol=1e-3)


def test_attention_read_write_roundtrip(rng):
    """Reading a window then writing it back under the inverse theta lands
    in the same canvas region (forward/backward theta pair,
    reference air/air_model.py:322-366)."""
    b, cs, ws = 3, 50, 28
    canvas = np.zeros((b, cs, cs), np.float32)
    canvas[:, 20:30, 15:25] = 1.0
    s = np.full(b, 0.4)
    x = np.full(b, -0.2)
    y = np.full(b, 0.0)
    window = attention_read(jnp.asarray(canvas), jnp.asarray(s),
                            jnp.asarray(x), jnp.asarray(y), ws)
    back = attention_write(window, jnp.asarray(s), jnp.asarray(x),
                           jnp.asarray(y), cs)
    back = np.asarray(back)
    # mass concentrated in the original bright region
    assert back[:, 20:30, 15:25].sum() > 0.5 * back.sum()


def test_batch_transformer_shapes(rng):
    b, n = 2, 3
    images = rng.uniform(size=(b, 28, 28, 1)).astype(np.float32)
    thetas = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
                     (b, n, 1, 1))
    out = batch_transformer(jnp.asarray(images), jnp.asarray(thetas), (14, 14))
    assert out.shape == (b * n, 14, 14, 1)


def test_separable_transform_grads_flow(rng):
    b = 4
    images = jnp.asarray(rng.uniform(size=(b, 50, 50)).astype(np.float32))

    def f(s, tx, ty):
        out = separable_transform(images, s, s, tx, ty, (28, 28))
        return jnp.sum(out ** 2)

    s = jnp.full((b,), 0.5)
    tx = jnp.full((b,), 0.1)
    ty = jnp.full((b,), -0.1)
    gs, gtx, gty = jax.grad(f, argnums=(0, 1, 2))(s, tx, ty)
    for g in (gs, gtx, gty):
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


@pytest.mark.parametrize("seed", [1, 2])
def test_separable_grad_matches_general_grad(rng, seed):
    """The MXU path and the gather path must agree on gradients too."""
    r = np.random.default_rng(seed)
    b = 3
    images = jnp.asarray(r.uniform(size=(b, 20, 20)).astype(np.float32))
    s = jnp.asarray(r.uniform(0.3, 0.9, b).astype(np.float32))
    tx = jnp.asarray(r.uniform(-0.5, 0.5, b).astype(np.float32))
    ty = jnp.asarray(r.uniform(-0.5, 0.5, b).astype(np.float32))

    def loss_sep(s, tx, ty):
        # clamp_cancel: the gather path implements the reference's clipped
        # indexing, so gradients only agree in that mode (zeros-mode adds
        # the off-support decay band on purpose)
        return jnp.sum(separable_transform(images, s, s, tx, ty, (12, 12),
                                           "clamp_cancel") ** 2)

    def loss_gen(s, tx, ty):
        z = jnp.zeros_like(s)
        theta = jnp.stack([jnp.stack([s, z, tx], 1),
                           jnp.stack([z, s, ty], 1)], 1)
        return jnp.sum(transformer(images[..., None], theta, (12, 12)) ** 2)

    g1 = jax.grad(loss_sep, argnums=(0, 1, 2))(s, tx, ty)
    g2 = jax.grad(loss_gen, argnums=(0, 1, 2))(s, tx, ty)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)
