"""Device-resident input pipeline + multi-step fused training.

The reference streams every batch from host queues (reference
multi_mnist.py:240-249) — on a remote/tunneled TPU that per-step host
round-trip costs ~100ms, dwarfing the 0.3ms step. TPU-native alternative:

  * the full train split (59k x 2500 f32 = 590 MB) lives in device HBM;
  * the per-epoch shuffle is a device-side ``jax.random.permutation`` of
    indices, deterministic in (seed, epoch) — same exact-resume contract as
    the host loader (air_tpu/data/loader.py);
  * ONE dispatch runs K training steps under ``lax.scan``, each gathering
    its batch from HBM by dynamic-slicing the permutation — zero host
    traffic in steady state.

Semantics match the single-step path exactly: per-step PRNG keys are
``fold_in(state.key, global_step)`` and annealed hyperparameters are
resolved at each step's own global step, both inside the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from air_tpu.models.config import AIRConfig
from air_tpu.train.steps import make_train_step
from air_tpu.train.state import TrainState


def device_epoch_perm(n: int, seed: int, epoch) -> jnp.ndarray:
    """Deterministic epoch permutation computed on device."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed), epoch)
    return jax.random.permutation(key, n)


def make_parallel_multi_step(config: AIRConfig, num_steps: int,
                             batch_size: int, mesh, donate=True,
                             bg_image=None, bg_schedule=None,
                             pipeline_unroll: int = 1):
    """Sharded (SPMD) variant of ``make_multi_step``: the dataset is
    replicated, each device of the mesh's ``data`` axis gathers and
    processes its slice of every batch, and gradients are pmean'd before
    the optimizer inside the scan — BASELINE config 5 (DP across a v5e
    slice) composed with the device-resident pipeline.

    Same signature/semantics as ``make_multi_step``; ``batch_size`` is the
    GLOBAL batch (must divide by the data-axis size).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape["data"]
    if batch_size % n_data != 0:
        raise ValueError(f"global batch {batch_size} not divisible by "
                         f"data axis size {n_data}")
    local_batch = batch_size // n_data
    single = make_train_step(config, donate=False, jit=False,
                             pmean_axis="data",
                             bg_image=bg_image, bg_schedule=bg_schedule)

    def sharded_body(state, images, digits, perm, start):
        d = jax.lax.axis_index("data")

        def body(state, i):
            base = (start + i) * batch_size + d * local_batch
            idx = jax.lax.dynamic_slice(perm, (base,), (local_batch,))
            state, metrics = single(state, jnp.take(images, idx, axis=0),
                                    jnp.take(digits, idx, axis=0))
            return state, metrics

        return jax.lax.scan(body, state, jnp.arange(num_steps),
                            unroll=pipeline_unroll)

    mapped = shard_map(
        sharded_body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_multi_step(config: AIRConfig, num_steps: int, batch_size: int,
                    donate=True, bg_image=None, bg_schedule=None,
                    pipeline_unroll: int = 1):
    """Build a jitted ``(state, images_dev, digits_dev, perm, start) ->
    (state, metrics[K])`` running ``num_steps`` train steps in one dispatch.

    ``start`` is the batch index within the epoch; batches
    [start, start + num_steps) are consumed. Metrics come back as [K]
    arrays (one entry per inner step).

    ``pipeline_unroll`` unrolls the K-step pipeline scan, letting XLA fuse
    across *optimizer* steps (the param/moment HBM round-trip per inner
    step is the batch-independent fixed cost isolated in RESULTS.md).
    Sequential param dependence means no cross-step math reassociation of
    the kind that broke the raw-pixel attention scan, but it is still a
    fusion-numerics knob — bench-only until convergence-tested.
    """
    single = make_train_step(config, donate=False, jit=False,
                             bg_image=bg_image, bg_schedule=bg_schedule)

    def multi_step(state: TrainState, images, digits, perm, start):
        def body(state, i):
            idx = jax.lax.dynamic_slice(
                perm, ((start + i) * batch_size,), (batch_size,))
            batch_images = jnp.take(images, idx, axis=0)
            batch_digits = jnp.take(digits, idx, axis=0)
            state, metrics = single(state, batch_images, batch_digits)
            return state, metrics

        return jax.lax.scan(body, state, jnp.arange(num_steps),
                            unroll=pipeline_unroll)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


class DeviceDataPipeline:
    """Epoch/index bookkeeping around the device-resident arrays."""

    def __init__(self, images, digits, batch_size: int, seed: int = 0,
                 device=None):
        import numpy as np
        self.n = len(images)
        self.batch_size = batch_size
        self.seed = seed
        self.batches_per_epoch = self.n // batch_size
        if self.batches_per_epoch < 1:
            # a dataset smaller than one batch would make chunk() return
            # 0 forever and spin the training loop at step 0 without ever
            # dispatching (observed: a clobbered 8-image dataset looped a
            # rescue run through thousands of step-0 evals)
            raise ValueError(
                f"dataset has {self.n} examples < batch_size {batch_size}: "
                f"no full batch can be formed")
        device = device or jax.devices()[0]
        self.images = jax.device_put(
            np.asarray(images, np.float32).reshape(self.n, -1), device)
        self.digits = jax.device_put(
            np.asarray(digits, np.int32), device)
        self.epoch = 0
        self.index = 0           # batch index within the epoch
        self._perm = None
        self._perm_epoch = -1

    def state(self) -> dict:
        return {"epoch": self.epoch, "index": self.index * self.batch_size,
                "seed": self.seed, "device_pipeline": True}

    def restore(self, state: dict):
        self.epoch = int(state["epoch"])
        self.index = int(state["index"]) // self.batch_size
        self.seed = int(state["seed"])
        self._perm_epoch = -1     # seed may differ: drop the cached perm

    def reseed(self, seed: int):
        """Fresh data order from the start (stall auto-recovery): rewind
        to epoch 0 and key all future epoch permutations off ``seed``."""
        self.seed = int(seed)
        self.epoch = 0
        self.index = 0
        self._perm_epoch = -1              # drop the cached permutation

    def perm(self) -> jnp.ndarray:
        if self._perm_epoch != self.epoch:
            self._perm = device_epoch_perm(self.n, self.seed, self.epoch)
            self._perm_epoch = self.epoch
        return self._perm

    def gather_batch(self):
        """The next batch as device arrays (without advancing) — used for
        instrumented single steps (e.g. grad summaries)."""
        idx = jax.lax.dynamic_slice(
            self.perm(), (self.index * self.batch_size,), (self.batch_size,))
        return (jnp.take(self.images, idx, axis=0),
                jnp.take(self.digits, idx, axis=0))

    def chunk(self, max_steps: int) -> int:
        """How many steps can run from the current position (0 at epoch
        boundary handling: advances epoch when exhausted)."""
        remaining = self.batches_per_epoch - self.index
        if remaining <= 0:
            self.epoch += 1
            self.index = 0
            remaining = self.batches_per_epoch
        return min(max_steps, remaining)

    def advance(self, steps: int):
        self.index += steps
