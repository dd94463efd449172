"""Inference serving facade.

API parity with the reference ``ModelWrapper.infer`` (reference
demo/model_wrapper.py:14-52): takes a list/array of images, returns
``(digits, positions, reconstructions, windows, latents, loss)`` with
per-step outputs trimmed to each item's inferred digit count and
windows/reconstructions reshaped to 2-D.

TPU-native differences: one jitted eval forward (z_pres rounded,
reference air/air_model.py:389-390) compiled per batch shape, batches
padded up to a small set of bucket sizes so interactive serving (the
demo's one-image refresh loop, reference demo/demo_window.py:149-174)
never recompiles.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from air_tpu.models.config import AIRConfig
from air_tpu.train.steps import make_eval_step


def _next_bucket(n: int, buckets=(1, 8, 64, 256, 1024)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(n)))


class ModelWrapper:
    def __init__(self, config: AIRConfig, params, canvas_size: int | None = None,
                 window_size: int | None = None, seed: int = 0):
        self.config = config.replace(train=False)
        self.params = params
        self.canvas_size = canvas_size or config.canvas_size
        self.window_size = window_size or config.windows_size
        self._eval = make_eval_step(self.config)
        self._key = jax.random.PRNGKey(seed)
        self._calls = 0

    def infer_batch(self, images: np.ndarray):
        """Raw batched inference: returns the full AIROutputs on a
        [B, canvas^2] array (padded to a bucket internally)."""
        images = np.asarray(images, np.float32).reshape(
            len(images), -1)
        n = len(images)
        bucket = _next_bucket(n)
        if bucket != n:
            images = np.concatenate(
                [images, np.zeros((bucket - n, images.shape[1]), np.float32)])
        self._calls += 1
        key = jax.random.fold_in(self._key, self._calls)
        out = self._eval(self.params, jnp.asarray(images),
                         jnp.zeros((bucket,), jnp.int32), key,
                         jnp.zeros((), jnp.int32))
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:n] if np.ndim(x) > 0 else np.asarray(x),
            out)

    def infer(self, images):
        """Reference-shaped inference (demo/model_wrapper.py:14-52):
        returns (all_digits, all_positions, all_reconstructions,
        all_windows, all_latents, all_loss), per-step lists trimmed to the
        inferred digit count."""
        out = self.infer_batch(np.asarray(
            [np.ravel(img) for img in images], np.float32))
        cs, ws = self.canvas_size, self.window_size

        all_digits, all_positions = [], []
        all_windows, all_latents = [], []
        all_reconstructions, all_loss = [], []
        for i in range(len(out.rec_num_digits)):
            digits = int(out.rec_num_digits[i])
            all_digits.append(digits)
            all_reconstructions.append(
                out.reconstruction[i].reshape(cs, cs))
            positions, windows, latents = [], [], []
            for j in range(digits):
                positions.append(np.array(
                    [out.rec_scales[i][j][0], *out.rec_shifts[i][j]]))
            for j in range(digits):
                windows.append(out.rec_windows[i][j].reshape(ws, ws))
                latents.append(out.rec_latents[i][j])
            all_positions.append(np.array(positions))
            all_windows.append(np.array(windows))
            all_latents.append(np.array(latents))
            all_loss.append(out.reconstruction_loss[i])
        return (all_digits, all_positions, all_reconstructions,
                all_windows, all_latents, all_loss)
