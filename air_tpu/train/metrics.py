"""Metric taxonomy + writers.

Reproduces the reference's TensorBoard scalar taxonomy with static shapes:
  * per-digit-count slices "<name>_<i>_dig" / "<name>_all_dig"
    (reference air/air_model.py:160-182) — boolean_mask becomes a masked
    mean (sum(x*m)/sum(m)) so everything stays jit-friendly;
  * per-step slices "<name>_<s>_step..." with the same one_more_step /
    all_steps variants (reference air/air_model.py:184-209).

Sinks: JSONL (always), TensorBoard event files via the pure-python
``air_tpu.utils.tb_writer`` (no TensorFlow dependency) — scalars plus TRUE
histograms for variables and pre/post-clip gradients (the reference's
air/air_model.py:643-687 summaries).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax.numpy as jnp


def masked_mean(values, mask):
    values = jnp.asarray(values, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(values * mask) / denom, jnp.nan)


def summarize_by_digit_count(tensor, digits, name: str, max_digits: int
                             ) -> dict:
    """"<name>_<i>_dig" for each digit count i plus "<name>_all_dig"
    (reference air/air_model.py:160-182)."""
    tensor = jnp.asarray(tensor, jnp.float32)
    out = {}
    for i in range(max_digits + 1):
        out[f"{name}_{i}_dig"] = masked_mean(tensor, digits == i)
    out[f"{name}_all_dig"] = jnp.mean(tensor)
    return out


def summarize_by_step(tensor, steps, digits, name: str, max_steps: int,
                      max_digits: int, one_more_step: bool = False,
                      all_steps: bool = False) -> dict:
    """Per-step x per-digit-count slices (reference air/air_model.py:184-209).
    ``tensor``: [B, max_steps]."""
    tensor = jnp.asarray(tensor, jnp.float32)
    out = {}
    for i in range(max_steps):
        step_name = f"{name}_{i + 1}_step"
        if all_steps:
            out.update(summarize_by_digit_count(
                tensor[:, i], digits, step_name, max_digits))
        else:
            mask = steps > (i - 1 if one_more_step else i)
            for d in range(max_digits + 1):
                out[f"{step_name}_{d}_dig"] = masked_mean(
                    tensor[:, i], mask & (digits == d))
            out[f"{step_name}_all_dig"] = masked_mean(tensor[:, i], mask)
    return out


def summarize_outputs(out, targets, max_steps: int, max_digits: int) -> dict:
    """The full post-loop scalar summary set of the reference
    (air/air_model.py:613-625) from one AIROutputs batch."""
    digits = jnp.asarray(targets, jnp.int32)
    steps = out.rec_num_digits
    summ = {}
    summ.update(summarize_by_digit_count(
        out.rec_num_digits, digits, "steps", max_digits))
    summ.update(summarize_by_digit_count(
        out.reconstruction_loss, digits, "rec_loss", max_digits))
    acc = (digits == out.rec_num_digits).astype(jnp.float32)
    summ.update(summarize_by_digit_count(acc, digits, "digit_acc", max_digits))
    summ.update(summarize_by_digit_count(
        out.per_example_loss, digits, "total_loss", max_digits))
    summ.update(summarize_by_step(
        out.rec_scales[:, :, 0], steps, digits, "scale", max_steps,
        max_digits))
    summ.update(summarize_by_step(
        out.z_pres_probs, steps, digits, "z_pres_prob", max_steps, max_digits,
        all_steps=True))
    summ.update(summarize_by_step(
        out.z_pres_kls, steps, digits, "z_pres_kl", max_steps, max_digits,
        one_more_step=True))
    summ.update(summarize_by_step(
        out.scale_kls, steps, digits, "scale_kl", max_steps, max_digits))
    summ.update(summarize_by_step(
        out.shift_kls, steps, digits, "shift_kl", max_steps, max_digits))
    summ.update(summarize_by_step(
        out.vae_kls, steps, digits, "vae_kl", max_steps, max_digits))
    summ["loss"] = out.loss
    summ["accuracy"] = out.accuracy
    return summ


def named_leaves(tree) -> dict:
    """Flatten a pytree to {path-name: numpy array} after ONE bulk
    device_get (per-leaf fetches cost a round-trip each on tunneled TPUs)."""
    import jax
    tree = jax.device_get(tree)
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out[name] = np.asarray(leaf)
    return out


def variable_summaries(params) -> dict:
    """Per-variable distribution stats — the JSONL counterpart of the
    reference's per-variable histograms (reference air/air_model.py:643-649).
    True histograms go to the TB sink via MetricsWriter.write_histograms."""
    out = {}
    for name, leaf in named_leaves(params).items():
        out[f"{name}/norm"] = float(np.linalg.norm(leaf.ravel()))
        out[f"{name}/mean"] = float(leaf.mean())
        out[f"{name}/std"] = float(leaf.std())
        out[f"{name}/min"] = float(leaf.min())
        out[f"{name}/max"] = float(leaf.max())
    return out


class MetricsWriter:
    """JSONL metrics sink with optional TensorBoard mirroring (pure-python
    event writer — works with TensorFlow absent)."""

    def __init__(self, directory: str, tensorboard: bool = False,
                 filename: str = "metrics.jsonl"):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, filename)
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            from air_tpu.utils.tb_writer import EventWriter
            self._tb = EventWriter(directory)

    def write(self, step: int, scalars: dict, prefix: str = ""):
        record = {"step": int(step), "time": time.time()}
        flat = {}
        for k, v in scalars.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    flat[f"{prefix}{k}/{kk}"] = vv
            else:
                flat[f"{prefix}{k}"] = v
        for k, v in flat.items():
            v = np.asarray(v)
            record[k] = float(v) if v.size == 1 else v.tolist()
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            self._tb.add_scalars(
                {k: v for k, v in record.items()
                 if k not in ("step", "time")
                 and isinstance(v, float) and np.isfinite(v)},
                step=step)
            self._tb.flush()

    def write_histograms(self, step: int, arrays: dict, prefix: str = ""):
        """True per-tensor histograms to the TB sink (reference
        air/air_model.py:643-687); no-op without tensorboard=True."""
        if self._tb is None:
            return
        for name, values in arrays.items():
            self._tb.add_histogram(f"{prefix}{name}", values, step=step)
        self._tb.flush()

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
