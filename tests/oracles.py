"""Pure-numpy oracles for op-level unit tests.

Each oracle states the *math* of the corresponding reference op
(cited file:line) in plain numpy, written independently of both the
reference's TF graph code and air_tpu's JAX code.
"""

import numpy as np

EPS = 10e-10


def np_transformer(images, theta, out_size):
    """Bilinear affine resampling with the reference coordinate map
    (reference air/transformer.py:56-171): pixel = (coord+1)*(dim-1.001)/2,
    corner indices clamped before the weights are computed (out-of-range
    samples therefore contribute zero). images: [B,H,W] or [B,H,W,C]."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    b, h, w, c = images.shape
    out_h, out_w = out_size
    theta = np.asarray(theta, np.float64).reshape(b, 2, 3)

    xs = np.linspace(-1.0, 1.0, out_w)
    ys = np.linspace(-1.0, 1.0, out_h)
    x_t, y_t = np.meshgrid(xs, ys)
    grid = np.stack([x_t.ravel(), y_t.ravel(), np.ones(out_h * out_w)])

    out = np.zeros((b, out_h, out_w, c))
    for i in range(b):
        src = theta[i] @ grid                    # [2, N]
        px = (src[0] + 1.0) * (w - 1.001) / 2.0
        py = (src[1] + 1.0) * (h - 1.001) / 2.0
        x0 = np.clip(np.floor(px).astype(int), 0, w - 1)
        x1 = np.clip(np.floor(px).astype(int) + 1, 0, w - 1)
        y0 = np.clip(np.floor(py).astype(int), 0, h - 1)
        y1 = np.clip(np.floor(py).astype(int) + 1, 0, h - 1)
        wa = ((x1 - px) * (y1 - py))[:, None]
        wb = ((x1 - px) * (py - y0))[:, None]
        wc = ((px - x0) * (y1 - py))[:, None]
        wd = ((px - x0) * (py - y0))[:, None]
        im = images[i].astype(np.float64)
        val = (wa * im[y0, x0] + wb * im[y1, x0]
               + wc * im[y0, x1] + wd * im[y1, x1])
        out[i] = val.reshape(out_h, out_w, c)
    return out[..., 0] if squeeze else out


def np_gaussian_kl(mean, log_var, prior_mean, prior_var):
    """Closed-form diag-Gaussian KL (reference air/air_model.py:443-447)."""
    mean = np.asarray(mean, np.float64)
    log_var = np.asarray(log_var, np.float64)
    return 0.5 * np.sum(
        np.log(prior_var) - log_var - 1.0 + np.exp(log_var) / prior_var
        + (mean - prior_mean) ** 2 / prior_var, axis=-1)


def np_concrete_log_density(y, log_odds, temp):
    """Binary-Concrete log density at pre-sigmoid y
    (reference air/concrete.py:35-41), including the reference's epsilons."""
    y, log_odds = np.asarray(y, np.float64), np.asarray(log_odds, np.float64)
    yt = y * temp
    return (np.log(temp + EPS) - yt + log_odds
            - 2.0 * np.log(1.0 + np.exp(-yt + log_odds) + EPS))


def np_concrete_kl(y, prior_lo, prior_t, post_lo, post_t):
    return (np_concrete_log_density(y, post_lo, post_t)
            - np_concrete_log_density(y, prior_lo, prior_t))


def np_exponential_decay(init, step, iters, factor, staircase=False,
                         vmin=None, vmax=None, log=False):
    """tf.train.exponential_decay + clamp + log
    (reference air/air_model.py:94-121)."""
    e = step / iters
    if staircase:
        e = np.floor(e)
    v = init * factor ** e
    if vmin is not None:
        v = max(v, vmin)
    if vmax is not None:
        v = min(v, vmax)
    if log:
        v = np.log(v + EPS)
    return v
