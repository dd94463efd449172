"""Device mesh construction + sharding helpers.

The reference has no distributed capability of any kind (SURVEY.md §2c);
this module adds the framework part: a named ``jax.sharding.Mesh`` with a
``data`` axis for batch parallelism over ICI and a ``model`` axis for
tensor parallelism of the weight matrices (Megatron-style column split of
every large 2-D kernel — LSTM gates, VAE hidden layers) used by the scaled
configs. At AIR's default 4M params the model axis defaults to size 1
(sharding a 4M-param model wastes ICI bandwidth), but when sized >1 the
axis genuinely shards: see ``state_sharding``/``shard_state``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int = 1,
              devices=None) -> Mesh:
    """1-D data x model mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis="
                         f"{model_axis}")
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def leaf_sharding(mesh: Mesh, leaf) -> NamedSharding:
    """Tensor-parallel placement rule for one array (or ShapeDtypeStruct).

    Every 2-D weight whose output (last) dim divides evenly over the
    ``model`` axis — and is big enough for the split to be useful — is
    column-sharded ``P(None, "model")``; everything else (biases, scalars,
    PRNG keys, Adam count) is replicated. Adam's mu/nu mirror the param
    shapes, so the same rule shards the optimizer state consistently.

    XLA GSPMD propagates these constraints through the jitted train step:
    each model shard computes its slice of the gate/hidden matmuls and the
    compiler inserts the activation all-gathers / grad reduce-scatters over
    ICI (scaling-book recipe: annotate params, let the partitioner place
    collectives).
    """
    m = mesh.shape["model"]
    shape = getattr(leaf, "shape", ())
    if (m > 1 and len(shape) == 2 and shape[-1] % m == 0
            and shape[-1] >= 4 * m):
        return NamedSharding(mesh, P(None, "model"))
    return NamedSharding(mesh, P())


def state_sharding(mesh: Mesh, state_like):
    """Pytree of NamedShardings for a TrainState (or any param pytree);
    ``state_like`` may hold concrete arrays or ShapeDtypeStructs."""
    return jax.tree_util.tree_map(lambda l: leaf_sharding(mesh, l),
                                  state_like)


def shard_state(mesh: Mesh, state):
    """Place a concrete TrainState on the mesh under ``state_sharding``."""
    return jax.device_put(state, state_sharding(mesh, state))
