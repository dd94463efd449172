"""Device mesh construction + sharding helpers.

The reference has no distributed capability of any kind (SURVEY.md §2c);
this module adds the framework part: a named ``jax.sharding.Mesh`` with a
``data`` axis for batch parallelism over ICI and a ``model`` axis reserved
for scaled configs (kept size-1 at AIR's 4M params — sharding a 4M-param
model would waste ICI bandwidth, but the axis name keeps every entry point
mesh-polymorphic).
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
