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


def _pad_to_bucket(batch: np.ndarray):
    """Zero-pad [n, D] up to the next bucket size; returns (padded, n)."""
    n = len(batch)
    if n == 0:
        raise ValueError("infer called with no images")
    bucket = _next_bucket(n)
    if bucket != n:
        batch = np.concatenate(
            [batch, np.zeros((bucket - n, batch.shape[1]), np.float32)])
    return batch, n


class ModelWrapper:
    def __init__(self, config: AIRConfig, params, canvas_size: int | None = None,
                 window_size: int | None = None, seed: int = 0,
                 decoder_layout: str | None = None):
        # Serving defaults to the step-parallel decoder regardless of the
        # layout the checkpoint TRAINED with: params are identical (the
        # layout is a compute-path knob), forward outputs are
        # bit-identical to the scan decoder (per-step RNG keys split the
        # same way; tests/test_model.py::test_stepparallel_forward_parity)
        # and batching the per-step heads/STs/VAE to [T*B] MXU tiles is a
        # measured +27% at the reference's b64 point (RESULTS.md round-5
        # grid) — pure win for inference, where the training-convergence
        # question does not apply. Pass decoder_layout="scan" to force
        # the training layout; Pallas-ST configs keep their own layout
        # (stepparallel requires st_impl="xla").
        if decoder_layout is None:
            decoder_layout = ("stepparallel" if config.st_impl == "xla"
                              else config.decoder_layout)
        self.config = config.replace(train=False,
                                     decoder_layout=decoder_layout)
        self.params = params
        # reference-ctor-parity args; the model geometry comes from the
        # config, so a differing value would silently misalign the packed
        # columns — validate instead
        if canvas_size is not None and canvas_size != config.canvas_size:
            raise ValueError(f"canvas_size {canvas_size} != "
                             f"config.canvas_size {config.canvas_size}")
        if window_size is not None and window_size != config.windows_size:
            raise ValueError(f"window_size {window_size} != "
                             f"config.windows_size {config.windows_size}")
        self.canvas_size = config.canvas_size
        self.window_size = config.windows_size
        self._eval = make_eval_step(self.config)
        self._key = jax.random.PRNGKey(seed)
        self._calls = 0

        # serving fast path: the reference fetches exactly 7 tensors per
        # infer (demo/model_wrapper.py:19-30); on high-RTT links (tunneled
        # TPUs) even 7 device->host transfers dominate latency, so the
        # jitted step packs them into ONE [B, X] array fetched in a single
        # transfer and unpacked host-side.
        cfg = self.config
        T, cs2, ws2, L = (cfg.max_steps, self.canvas_size ** 2,
                          self.window_size ** 2, cfg.vae_latent_dimensions)
        self._packed_cols = {
            "digits": (0, 1), "scales": (1, 1 + T),
            "shifts": (1 + T, 1 + 3 * T),
            "recon": (1 + 3 * T, 1 + 3 * T + cs2),
            "windows": (1 + 3 * T + cs2, 1 + 3 * T + cs2 + T * ws2),
            "latents": (1 + 3 * T + cs2 + T * ws2,
                        1 + 3 * T + cs2 + T * ws2 + T * L),
            "loss": (1 + 3 * T + cs2 + T * ws2 + T * L,
                     2 + 3 * T + cs2 + T * ws2 + T * L),
        }
        eval_fn = make_eval_step(cfg, jit=False)

        def packed(params, images, targets, key, step):
            out = eval_fn(params, images, targets, key, step)
            b = images.shape[0]
            return jnp.concatenate([
                out.rec_num_digits[:, None].astype(jnp.float32),
                out.rec_scales[:, :, 0],
                out.rec_shifts.reshape(b, 2 * cfg.max_steps),
                out.reconstruction,
                out.rec_windows.reshape(b, -1),
                out.rec_latents.reshape(b, -1),
                out.reconstruction_loss[:, None],
            ], axis=1)

        self._packed = jax.jit(packed)

    def infer_batch(self, images: np.ndarray):
        """Raw batched inference: returns the full AIROutputs on a
        [B, canvas^2] array (padded to a bucket internally)."""
        images = np.asarray(images, np.float32).reshape(
            len(images), -1)
        images, n = _pad_to_bucket(images)
        self._calls += 1
        key = jax.random.fold_in(self._key, self._calls)
        out = self._eval(self.params, jnp.asarray(images),
                         jnp.zeros((len(images),), jnp.int32), key,
                         jnp.zeros((), jnp.int32))
        out = jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:n] if np.ndim(x) > 0 else np.asarray(x),
            out)
        # the batch-mean scalars were computed over the padded bucket
        # (blank padding rows predict 0 digits and count as "correct"
        # against the zero targets fed above) — recompute over the n
        # real rows
        return out._replace(
            loss=np.float32(np.mean(out.per_example_loss)),
            accuracy=np.float32(np.mean(out.rec_num_digits == 0)))

    def infer(self, images):
        """Reference-shaped inference (demo/model_wrapper.py:14-52):
        returns (all_digits, all_positions, all_reconstructions,
        all_windows, all_latents, all_loss), per-step lists trimmed to the
        inferred digit count. One device->host transfer per call."""
        batch = np.asarray([np.ravel(img) for img in images], np.float32)
        batch, n = _pad_to_bucket(batch)
        self._calls += 1
        key = jax.random.fold_in(self._key, self._calls)
        packed = np.asarray(self._packed(
            self.params, jnp.asarray(batch),
            jnp.zeros((len(batch),), jnp.int32),
            key, jnp.zeros((), jnp.int32)))[:n]

        cs, ws = self.canvas_size, self.window_size
        T = self.config.max_steps
        L = self.config.vae_latent_dimensions
        col = self._packed_cols
        digits_arr = packed[:, col["digits"][0]].astype(np.int32)
        scales = packed[:, col["scales"][0]:col["scales"][1]]
        shifts = packed[:, col["shifts"][0]:col["shifts"][1]].reshape(n, T, 2)
        recons = packed[:, col["recon"][0]:col["recon"][1]]
        windows = packed[:, col["windows"][0]:col["windows"][1]].reshape(
            n, T, ws, ws)
        latents = packed[:, col["latents"][0]:col["latents"][1]].reshape(
            n, T, L)
        losses = packed[:, col["loss"][0]]

        all_digits, all_positions = [], []
        all_windows, all_latents = [], []
        all_reconstructions, all_loss = [], []
        for i in range(n):
            d = int(digits_arr[i])
            all_digits.append(d)
            all_reconstructions.append(recons[i].reshape(cs, cs))
            # reference builds these from python lists, so zero-digit items
            # come out as empty 1-D arrays (demo/model_wrapper.py:38-49)
            all_positions.append(np.array(
                [[scales[i, j], *shifts[i, j]] for j in range(d)]))
            all_windows.append(windows[i, :d].copy() if d else np.array([]))
            all_latents.append(latents[i, :d].copy() if d else np.array([]))
            all_loss.append(losses[i])
        return (all_digits, all_positions, all_reconstructions,
                all_windows, all_latents, all_loss)
