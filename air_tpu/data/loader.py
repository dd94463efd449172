"""Host-side training data loader.

TPU-native replacement for the reference's TFRecord queue pipeline
(reference multi_mnist.py:228-251; training.py:74-85): instead of C++ queue
runners feeding a shuffle queue, the (small, ~590 MB) train set lives in
host RAM, each epoch is a seeded permutation, and batches are fed to the
device with a prefetch depth of 2 (``jax.device_put`` overlaps with compute).

Determinism & recovery (SURVEY.md §5 "Failure detection"): the shuffle for
epoch ``e`` is ``PRNG(seed, e)``, so the loader's position is fully
described by ``(epoch, index)`` — checkpoint those two ints and resume is
exact.

An optional native C++ backend (air_tpu.runtime) provides the
shuffle+batch+copy loop off the GIL; the numpy path is the default and the
semantic reference.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from air_tpu.data.records import read_records


class TrainLoader:
    """Epoch-shuffled batch iterator with optional background prefetch.

    Yields (images [B, canvas^2] float32, digits [B] int32). Drops the final
    partial batch (shapes stay static for jit, matching the reference's
    fixed-size ``shuffle_batch``).
    """

    def __init__(self, path_or_arrays, batch_size: int, epochs: int | None = None,
                 seed: int = 0, prefetch: int = 2, device_put=None,
                 native: bool | None = None, reader_threads: int = 4):
        if isinstance(path_or_arrays, str):
            rec = read_records(path_or_arrays)
            self.images = np.asarray(rec["images"], np.float32)
            self.digits = np.asarray(rec["digits"], np.int32)
        else:
            images, digits = path_or_arrays
            self.images = np.asarray(images, np.float32).reshape(
                len(images), -1)
            self.digits = np.asarray(digits, np.int32)
        self.n = len(self.images)
        self.batch_size = batch_size
        if self.n < batch_size:
            # the final-partial-batch drop would yield ZERO batches per
            # epoch — downstream loops would spin without training (same
            # guard as fast_pipeline.DeviceDataPipeline)
            raise ValueError(
                f"dataset has {self.n} examples < batch_size {batch_size}: "
                f"no full batch can be formed")
        self.epochs = epochs
        self.seed = seed
        self.prefetch = prefetch
        self.device_put = device_put
        self.epoch = 0
        self.index = 0
        self._native = None
        if native or native is None:
            try:
                from air_tpu.runtime import NativeShuffleLoader
                self._native = NativeShuffleLoader(
                    self.images, self.digits, batch_size, seed,
                    n_threads=reader_threads)
            except Exception:
                if native:
                    raise
                self._native = None

    @property
    def batches_per_epoch(self) -> int:
        return self.n // self.batch_size

    def state(self) -> dict:
        """Data-order state for exact checkpoint/resume. Records which
        permutation backend produced the order: the native C++ stream and
        the numpy stream are DIFFERENT permutations for the same (seed,
        epoch), so resuming under the other backend silently replays a
        different data order."""
        return {"epoch": self.epoch, "index": self.index, "seed": self.seed,
                "perm_backend": "native" if self._native else "numpy"}

    def restore(self, state: dict):
        self.epoch = int(state["epoch"])
        self.index = int(state["index"])
        self.seed = int(state["seed"])
        if self._native is not None:
            self._native.seed = self.seed
        saved = state.get("perm_backend")
        now = "native" if self._native else "numpy"
        if saved is not None and saved != now:
            import warnings
            warnings.warn(
                f"loader resumed under the '{now}' permutation backend but "
                f"was checkpointed under '{saved}': the data order will "
                f"differ from the original run (exact-resume is per-"
                f"backend)", stacklevel=2)

    def reseed(self, seed: int):
        """Fresh data order from the start (stall auto-recovery): rewind
        to epoch 0 and key future epoch permutations off ``seed`` — the
        native backend reads its seed per perm() call, so updating both
        attributes takes effect on the next epoch. NOTE: an already-
        running prefetch iterator holds its own local position and is not
        interrupted; reseed before (re)starting iteration."""
        self.seed = int(seed)
        self.epoch = 0
        self.index = 0
        if self._native is not None:
            self._native.seed = self.seed

    def _perm(self, epoch: int) -> np.ndarray:
        if self._native is not None:
            return self._native.perm(epoch)
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch])).permutation(self.n)

    def _iter_host(self):
        """Yields ((images, digits), position) where ``position`` is the
        (epoch, index) AFTER this batch — i.e. the next batch to deliver.
        Works on LOCAL position variables so a prefetching producer thread
        never mutates the loader's consumed position (``state()`` must
        reflect what the consumer has actually received, not what the
        producer has staged ahead)."""
        epoch, index = self.epoch, self.index
        while self.epochs is None or epoch < self.epochs:
            perm = self._perm(epoch)
            bs = self.batch_size
            while index + bs <= self.n:
                sel = perm[index:index + bs]
                if self._native is not None:
                    batch = self._native.gather(sel)
                else:
                    batch = (self.images[sel], self.digits[sel])
                index += bs
                yield batch, (epoch, index)
            epoch += 1
            index = 0

    def __iter__(self):
        def emit(item):
            batch, (epoch, index) = item
            # consumed-position bookkeeping happens HERE, on the consumer
            # thread, exactly when the batch is handed over
            self.epoch, self.index = epoch, index
            return self.device_put(batch) if self.device_put else batch

        if self.prefetch <= 0:
            for item in self._iter_host():
                yield emit(item)
            return

        # The producer thread assembles HOST batches only (numpy + native
        # gather, GIL-released); device_put happens on the consumer thread.
        # Rationale: issuing transfers from a second thread can deadlock the
        # experimental axon TPU client, and JAX dispatch is async anyway —
        # the consumer's device_put overlaps with the in-flight step.
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()

        def put(item) -> bool:
            # bounded put so an abandoned iterator (consumer broke out of
            # its for-loop) releases the producer instead of leaking a
            # thread blocked on a full queue holding staged batches
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=1.0)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for item in self._iter_host():
                    if not put(item):
                        return
                put(stop)
            except BaseException as e:       # propagate to the consumer —
                if not put(e):               # a swallowed producer error
                    raise                    # would end training "cleanly";
                # (re-raise only if the consumer is gone, else threading's
                # excepthook double-logs an error the consumer will raise)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield emit(item)
        finally:
            abandoned.set()


def load_test_data(path: str, shift_zero_digits_images: bool = True):
    """Full test set as dense arrays (reference training.py:154-156 usage).
    Returns (images [N, canvas^2] float32, digits [N] int32)."""
    from air_tpu.data.records import read_test_data
    images, digits, *_ = read_test_data(
        path, shift_zero_digits_images=shift_zero_digits_images)
    return np.asarray(images, np.float32), np.asarray(digits, np.int32)
