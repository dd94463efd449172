"""Reconstruction visualization grids.

Reproduces the reference's image summary (reference air/air_model.py:211-267,
130-158): zoomed original | thin white stripe | zoomed reconstruction, with
per-step red/green/blue attention boxes obtained by pushing a unit window
frame through the *backward* spatial transform — the same trick, on the
separable MXU path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from air_tpu.ops.transformer import separable_transform


def _zoom_nearest(images: jnp.ndarray, zoom: int) -> jnp.ndarray:
    """[B, H, W] -> [B, zoom*H, zoom*W] (resize_images equivalent)."""
    return jnp.repeat(jnp.repeat(images, zoom, axis=1), zoom, axis=2)


def _unit_frame(window_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """A window-sized image with a 1-px border of ones — what
    tf.image.draw_bounding_boxes([[0,0,1,1]]) produces on zeros
    (reference air/air_model.py:238-247)."""
    frame = jnp.zeros((window_size, window_size), dtype)
    frame = frame.at[0, :].set(1.0).at[-1, :].set(1.0)
    frame = frame.at[:, 0].set(1.0).at[:, -1].set(1.0)
    return frame


def attention_boxes(st_back: jnp.ndarray, window_size: int, out_size: int
                    ) -> jnp.ndarray:
    """Render per-step attention boxes on the (zoomed) canvas.

    st_back: [B, T, 2, 3] backward thetas. Returns [B, T, out, out] binary
    box masks (borders sharpened at > 0.01, reference air/air_model.py:253-259).
    """
    b, t = st_back.shape[:2]
    flat = st_back.reshape(b * t, 2, 3)
    sx = flat[:, 0, 0]
    sy = flat[:, 1, 1]
    tx = flat[:, 0, 2]
    ty = flat[:, 1, 2]
    frame = jnp.broadcast_to(_unit_frame(window_size),
                             (b * t, window_size, window_size))
    boxes = separable_transform(frame, sx, sy, tx, ty, (out_size, out_size))
    boxes = jnp.clip(boxes, 0.0, 1.0)
    boxes = jnp.where(boxes > 0.01, 1.0, 0.0)
    return boxes.reshape(b, t, out_size, out_size)


def draw_colored_bounding_boxes(images: jnp.ndarray, boxes: jnp.ndarray,
                                steps: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] gray + [B, T, H, W] boxes -> [B, H, W, 3] RGB with up to
    three step boxes in R, G, B (reference air/air_model.py:130-158)."""
    channels = [images, images, images]
    t = min(3, boxes.shape[1])
    for s in range(t):
        step_box = boxes[:, s]
        active = (steps > s)[:, None, None]
        for c in range(3):
            if s == c:
                channels[c] = jnp.where(
                    active, jnp.minimum(channels[c] + step_box, 1.0),
                    channels[c])
            else:
                channels[c] = jnp.where(
                    active, jnp.maximum(channels[c] - step_box, 0.0),
                    channels[c])
    return jnp.stack(channels, axis=-1)


def visualize_reconstructions(original, reconstruction, st_back, steps,
                              canvas_size: int, window_size: int,
                              zoom: int = 2) -> np.ndarray:
    """[B, canvas^2] x2 + [B, T, 2, 3] + [B] -> [B, zH, 2*zW+4, 3] float grid
    (reference air/air_model.py:211-267)."""
    b = original.shape[0]
    orig = _zoom_nearest(jnp.asarray(original).reshape(
        b, canvas_size, canvas_size), zoom)
    recon = _zoom_nearest(jnp.asarray(reconstruction).reshape(
        b, canvas_size, canvas_size), zoom)
    boxes = attention_boxes(jnp.asarray(st_back), window_size,
                            zoom * canvas_size)
    steps = jnp.asarray(steps)
    left = draw_colored_bounding_boxes(orig, boxes, steps)
    right = draw_colored_bounding_boxes(recon, boxes, steps)
    stripe = jnp.ones((b, zoom * canvas_size, 4, 3), left.dtype)
    return np.asarray(jnp.concatenate([left, stripe, right], axis=2))


def save_grid_png(path: str, grid: np.ndarray, max_rows: int = 60):
    """Stack [B, H, W, 3] vertically into one PNG."""
    from PIL import Image
    grid = np.clip(grid[:max_rows], 0.0, 1.0)
    stacked = grid.reshape(-1, grid.shape[2], 3)
    Image.fromarray((stacked * 255).astype(np.uint8), "RGB").save(path)
    return path
