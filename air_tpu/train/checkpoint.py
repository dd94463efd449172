"""Checkpointing with resume.

The reference only ever *saves* during training (``tf.train.Saver`` every
10k iterations, reference training.py:141,203-207; restore exists only in
demo.py:33/embeddings.py:168 — training cannot resume). Here a checkpoint is
the complete training closure — {params, opt_state, global step, PRNG key,
loader state} — so restart-and-resume is exact (SURVEY.md §5).

Format: a single .npz of path-flattened arrays + a JSON sidecar of metadata.
No framework dependency; loadable with plain numpy.
"""

from __future__ import annotations

import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from air_tpu.train.state import TrainState, create_train_state


def _sidecar(path: str) -> str:
    """The .json metadata path for a .npz checkpoint path (splitext, not
    str.replace — a '.npz' substring in a directory name must not match)."""
    return os.path.splitext(path)[0] + ".json"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "shape"):
        # NOTE: namedtuples flatten by index and rebuild as plain lists
        # (_listify); the params tree is dicts/lists only, and opt_state
        # is rebuilt from a fresh optimizer's structure, so nothing
        # round-trips a namedtuple through this path
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(directory: str, state: TrainState, step: int | None = None,
                    loader_state: dict | None = None,
                    max_to_keep: int = 10000, prefix: str = "air-model",
                    recovery: dict | None = None):
    """Write ``<directory>/<prefix>-<step>.npz`` (+ .json metadata).
    ``recovery``: stall auto-recovery bookkeeping (attempt index, active
    schedule variant, eval history) persisted in the sidecar so a process
    killed mid-rescue resumes the same attempt (trainer.recovery_meta).
    Returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    if step is None:
        step = int(state.step)
    params_flat = _flatten(jax.device_get(state.params), "params/")
    # opt_state is a nested structure of namedtuples/arrays: flatten with
    # tree paths so restore can rebuild by zip (structure comes from a
    # freshly-initialized optimizer).
    opt_leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(jax.device_get(state.opt_state))]
    arrays = dict(params_flat)
    for i, leaf in enumerate(opt_leaves):
        if leaf.dtype == jnp.bfloat16:
            # npz round-trips bf16 as raw void bytes (dtype lost); store a
            # uint16 view under a marked key instead (adam_storage_dtype)
            arrays[f"opt/{i}:bf16"] = leaf.view(np.uint16)
        else:
            arrays[f"opt/{i}"] = leaf
    arrays["step"] = np.asarray(int(state.step), np.int32)
    typed_key = jnp.issubdtype(state.key.dtype, jax.dtypes.prng_key)
    arrays["key"] = np.asarray(jax.device_get(
        jax.random.key_data(state.key) if typed_key else state.key))

    path = os.path.join(directory, f"{prefix}-{step}.npz")
    meta = {"step": step, "loader_state": loader_state,
            "num_opt_leaves": len(opt_leaves),
            # restore the key in the representation it was saved from
            # (raw uint32 PRNGKey vs typed key array) — wrapping a raw
            # key changes the TrainState aval and forces recompiles
            "typed_key": bool(typed_key)}
    if recovery is not None:
        meta["recovery"] = recovery
    # atomic: write to tmp names, rename the sidecar first and the .npz
    # LAST (latest_checkpoint keys on the .npz, so a kill mid-save never
    # exposes a truncated checkpoint or an npz without its sidecar)
    sidecar = _sidecar(path)
    with open(sidecar + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(sidecar + ".tmp", sidecar)
    with open(path + ".tmp", "wb") as f:
        np.savez(f, **arrays)
    os.replace(path + ".tmp", path)

    # prune old checkpoints beyond max_to_keep
    ckpts = sorted_checkpoints(directory, prefix)
    for old in ckpts[:-max_to_keep]:
        for p in (old, _sidecar(old)):
            try:
                os.remove(p)
            except OSError:
                pass
    return path


def sorted_checkpoints(directory: str, prefix: str = "air-model"):
    pat = re.compile(re.escape(prefix) + r"-(\d+)\.npz$")
    found = []
    if os.path.isdir(directory):
        for name in os.listdir(directory):
            m = pat.match(name)
            if m:
                found.append((int(m.group(1)), os.path.join(directory, name)))
    return [p for _, p in sorted(found)]


def latest_checkpoint(directory: str, prefix: str = "air-model"):
    ckpts = sorted_checkpoints(directory, prefix)
    return ckpts[-1] if ckpts else None


def _unflatten_params(arrays: dict) -> dict:
    tree: dict = {}
    for key, value in arrays.items():
        if not key.startswith("params/"):
            continue
        parts = key[len("params/"):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return _listify(tree)


def _listify(node):
    """Convert {'0': ..., '1': ...} dicts (from flattened lists) to lists."""
    if not isinstance(node, dict):
        return node
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        return [_listify(node[str(i)]) for i in range(len(keys))]
    return {k: _listify(v) for k, v in node.items()}


def load_params(path: str) -> dict:
    """Load just the parameter pytree from a checkpoint (works for both
    full training checkpoints and params-only inference checkpoints like
    the shipped model/air-model-*.npz)."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    return _unflatten_params(arrays)


def checkpoint_arch(path: str) -> dict:
    """Architecture flags inferable from a checkpoint's stored keys —
    lets inference tools (demo/embeddings/eval) load checkpoints trained
    at non-default configs without arch flags: {"cnn": bool,
    "learn_background": bool}."""
    with np.load(path) as z:
        keys = set(z.files)
    return {
        "cnn": any(k.startswith("params/cnn/") for k in keys),
        "learn_background": "params/background" in keys,
    }


def checkpoint_meta(path: str) -> dict:
    """The sidecar JSON metadata of a checkpoint ({} if absent) — incl.
    the ``recovery`` bookkeeping persisted by the trainer."""
    meta_path = _sidecar(path)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def load_checkpoint(path: str, config, loader=None, meta=None) -> TrainState:
    """Rebuild a TrainState from a checkpoint file. ``config`` recreates the
    optimizer structure; ``loader`` (optional) is restored in place.
    ``meta`` (optional) is an already-parsed sidecar dict (checkpoint_meta)
    so callers that need the meta themselves don't read it twice."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    params = _unflatten_params(arrays)
    template = create_train_state(config, rng=0, params=params)
    n = sum(1 for k in arrays if k.startswith("opt/"))
    if n == 0:
        # params-only checkpoint: fresh optimizer state
        opt_state = template.opt_state
    else:
        opt_leaves = [
            jnp.asarray(arrays[f"opt/{i}"]) if f"opt/{i}" in arrays
            else jnp.asarray(arrays[f"opt/{i}:bf16"]
                             .view(np.dtype(jnp.bfloat16)))
            for i in range(n)]
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template.opt_state), opt_leaves)
    if meta is None:
        meta = checkpoint_meta(path)
    if "key" in arrays:
        # keep the saved representation: wrap to a typed key array ONLY
        # if the state was saved from one; a raw uint32 PRNGKey (what
        # create_train_state produces) stays raw, so the resumed
        # TrainState matches the fresh-state aval (no recompiles, and
        # stacked [S, 2] sweep keys stay fold_in-compatible)
        key = jnp.asarray(arrays["key"])
        if meta.get("typed_key"):
            key = jax.random.wrap_key_data(key)
    else:
        key = template.key
    state = template.replace(opt_state=opt_state,
                             step=jnp.asarray(arrays["step"], jnp.int32),
                             key=key)
    if loader is not None and meta.get("loader_state"):
        loader.restore(meta["loader_state"])
    return state
