"""Data layer tests: MNIST sources, generator properties, records, loader."""

import os

import numpy as np
import pytest

from air_tpu.data.mnist import synthesize_mnist, get_mnist, load_mnist
from air_tpu.data.multi_mnist import (
    MultiMNISTConfig, DigitStream, generate_multi_image, generate_dataset,
    crop_non_empty, add_buffer, pixels_overlap, bounding_boxes_overlap,
)
from air_tpu.data.records import write_records, read_records, read_test_data
from air_tpu.data.loader import TrainLoader


@pytest.fixture(scope="module")
def digits_pool():
    images, labels = synthesize_mnist(n=200, seed=0)
    return images, labels


# --- MNIST sources ------------------------------------------------------------

def test_synthetic_mnist_properties(digits_pool):
    images, labels = digits_pool
    assert images.shape == (200, 784)
    assert images.dtype == np.float32
    assert images.min() >= 0.0 and images.max() <= 1.0
    assert set(np.unique(labels)) <= set(range(10))
    # every image has some ink
    assert (images.sum(axis=1) > 1.0).all()
    # deterministic under seed
    again, lbl2 = synthesize_mnist(n=5, seed=0)
    np.testing.assert_array_equal(again, synthesize_mnist(n=5, seed=0)[0])


def test_get_mnist_fallback(tmp_path):
    images, labels, source = get_mnist(str(tmp_path), n_synthetic=10, seed=1)
    assert source == "synthetic"
    assert images.shape == (10, 784)


def test_load_mnist_npz(tmp_path):
    x = (np.random.default_rng(0).uniform(0, 255, (7, 28, 28))
         .astype(np.uint8))
    y = np.arange(7) % 10
    np.savez(tmp_path / "mnist.npz", x_train=x, y_train=y)
    images, labels = load_mnist(str(tmp_path))
    assert images.shape == (7, 784)
    np.testing.assert_allclose(images[0], x[0].ravel() / 255.0, atol=1e-6)
    np.testing.assert_array_equal(labels, y)


def _write_idx(path, array):
    """Write a classic big-endian IDX ubyte file (magic 0x08 | ndim)."""
    import gzip
    import struct
    arr = np.ascontiguousarray(array, np.uint8)
    header = struct.pack(">I", 0x0800 | arr.ndim)
    header += struct.pack(">" + "I" * arr.ndim, *arr.shape)
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(header + arr.tobytes())


@pytest.mark.parametrize("gz", [False, True])
def test_load_mnist_idx(tmp_path, gz):
    """The idx branch (data/mnist.py:_read_idx), raw and gzipped — the
    format real MNIST ships in (VERDICT r2 hardening item)."""
    x = (np.random.default_rng(1).uniform(0, 255, (5, 28, 28))
         .astype(np.uint8))
    y = (np.arange(5) % 10).astype(np.uint8)
    sfx = ".gz" if gz else ""
    _write_idx(tmp_path / f"train-images-idx3-ubyte{sfx}", x)
    _write_idx(tmp_path / f"train-labels-idx1-ubyte{sfx}", y)
    images, labels = load_mnist(str(tmp_path))
    assert images.shape == (5, 784) and images.dtype == np.float32
    np.testing.assert_allclose(images, x.reshape(5, -1) / 255.0, atol=1e-6)
    np.testing.assert_array_equal(labels, y)
    assert labels.dtype == np.int32


# --- placement helpers --------------------------------------------------------

def test_crop_non_empty():
    img = np.zeros((10, 10))
    img[3:6, 2:5] = 1.0
    assert crop_non_empty(img).shape == (3, 3)


def test_add_buffer_matches_naive():
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(12, 12)) > 0.8).astype(np.float32)
    got = add_buffer(img, 2)
    # naive reimplementation of the reference loop (multi_mnist.py:45-58)
    want = np.copy(img)
    h, w = img.shape
    for x in range(w):
        for y in range(h):
            if img[y, x] > 0:
                for i in range(x - 2, x + 3):
                    for j in range(y - 2, y + 3):
                        if 0 <= i < w and 0 <= j < h and want[j, i] == 0:
                            want[j, i] = 1.0
    np.testing.assert_array_equal(got, want)


def test_pixels_overlap():
    canvas = np.zeros((20, 20), np.float32)
    canvas[5:10, 5:10] = 1.0
    patch = np.ones((5, 5), np.float32)
    assert pixels_overlap(canvas, patch, 5, 5)
    assert not pixels_overlap(canvas, patch, 12, 12)


def test_bounding_boxes_overlap():
    placed_pos, placed_box = [10, 10], [5, 5]
    assert bounding_boxes_overlap(12, 12, 5, 5, placed_pos, placed_box, 0)
    assert not bounding_boxes_overlap(16, 16, 5, 5, placed_pos, placed_box, 0)
    # gap turns near-miss into overlap
    assert bounding_boxes_overlap(16, 16, 5, 5, placed_pos, placed_box, 3)
    # x-overlap alone is NOT overlap (fixes reference multi_mnist.py:74-75)
    assert not bounding_boxes_overlap(10, 30, 5, 5, placed_pos, placed_box, 0)


# --- generator ----------------------------------------------------------------

def test_generate_multi_image_non_overlap(digits_pool):
    images, _ = digits_pool
    rng = np.random.default_rng(1)
    stream = DigitStream(len(images), rng)
    for num in [0, 1, 2, 3]:
        canvas, ids, pos, box = generate_multi_image(
            images, num, 28, 50, stream, rng)
        assert canvas.shape == (50, 50)
        assert len(ids) == num
        assert len(pos) == 2 * num and len(box) == 2 * num
        # pixel-overlap placement => canvas max never exceeds single max
        assert canvas.max() <= 1.0 + 1e-6
        if num == 0:
            assert canvas.sum() == 0.0


def test_generate_dataset_splits(tmp_path, digits_pool):
    images, labels = digits_pool
    cfg = MultiMNISTConfig(max_digits=2, max_in_common=2,
                           images_per_digit=20, test_set_size=10, seed=0)
    out = generate_dataset(images, labels, cfg, out_dir=str(tmp_path))
    assert len(out["common"]["images"]) == 50   # 3*20 - 10
    assert len(out["test"]["images"]) == 10
    # digit histogram preserved across split
    all_digits = out["common"]["digits"] + out["test"]["digits"]
    assert sorted(np.bincount(all_digits, minlength=3)) == [20, 20, 20]
    # stratum files + split files written
    for name in ["0", "1", "2", "common", "test"]:
        assert os.path.exists(tmp_path / f"{name}.airrec")
    # determinism
    out2 = generate_dataset(images, labels, cfg)
    np.testing.assert_array_equal(np.asarray(out["test"]["images"]),
                                  np.asarray(out2["test"]["images"]))


def test_generate_dataset_with_background(tmp_path, digits_pool):
    images, labels = digits_pool
    from PIL import Image
    bg = (np.random.default_rng(0).uniform(0, 100, (60, 60))
          .astype(np.uint8))
    bg_path = str(tmp_path / "bg.png")
    Image.fromarray(bg, "L").save(bg_path)
    cfg = MultiMNISTConfig(max_digits=1, max_in_common=1, images_per_digit=3,
                           test_set_size=1, bg_path=bg_path,
                           bg_max_intensity=0.3)
    out = generate_dataset(images, labels, cfg)
    # zero-digit images now contain background ink
    zero_imgs = [im for im, d in zip(out["common"]["images"],
                                     out["common"]["digits"]) if d == 0]
    if zero_imgs:
        assert np.asarray(zero_imgs[0]).sum() > 0


# --- records ------------------------------------------------------------------

def test_records_roundtrip(tmp_path, digits_pool):
    images, labels = digits_pool
    cfg = MultiMNISTConfig(max_digits=2, images_per_digit=5, test_set_size=3,
                           seed=0)
    out = generate_dataset(images, labels, cfg, out_dir=str(tmp_path))
    rec = read_records(str(tmp_path / "test.airrec"))
    assert rec["images"].shape == (3, 2500)
    assert rec["canvas_size"] == 50
    np.testing.assert_allclose(
        np.asarray(rec["images"]),
        np.asarray(out["test"]["images"]).reshape(3, -1), atol=1e-7)

    # reference-shaped reader trims ragged metadata to the digit count
    imgs, digs, idxs, poss, boxes, labs = read_test_data(
        str(tmp_path / "test.airrec"))
    for i in range(3):
        assert len(idxs[i]) == digs[i]
        assert len(poss[i]) == 2 * digs[i]
        assert len(labs[i]) == digs[i]


def test_read_test_data_shift_zero(tmp_path):
    images = np.random.default_rng(0).uniform(size=(6, 2500)).astype(np.float32)
    digits = np.array([0, 2, 0, 1, 0, 2])
    write_records(str(tmp_path / "t"), images, digits, max_digits=2)
    imgs, digs, *_ = read_test_data(str(tmp_path / "t.airrec"),
                                    shift_zero_digits_images=True)
    # first image must be a zero-digit one; others follow non-empty then
    # remaining empties (reference multi_mnist.py:284-294)
    assert digs[0] == 0
    assert list(digs) == [0, 2, 1, 2, 0, 0]


# --- loader -------------------------------------------------------------------

def test_train_loader_epochs_and_determinism(digits_pool):
    images, _ = digits_pool
    data = (images[:100], np.arange(100) % 3)
    loader = TrainLoader(data, batch_size=16, epochs=2, seed=5, prefetch=0,
                         native=False)
    batches = list(loader)
    assert len(batches) == 2 * (100 // 16)
    assert batches[0][0].shape == (16, 784)
    # deterministic restart
    loader2 = TrainLoader(data, batch_size=16, epochs=2, seed=5, prefetch=0,
                          native=False)
    b2 = list(loader2)
    np.testing.assert_array_equal(batches[0][0], b2[0][0])
    # different seed differs
    loader3 = TrainLoader(data, batch_size=16, epochs=1, seed=6, prefetch=0,
                          native=False)
    assert not np.array_equal(batches[0][0], next(iter(loader3))[0])


def test_train_loader_resume(digits_pool):
    images, _ = digits_pool
    data = (images[:64], np.arange(64) % 3)
    loader = TrainLoader(data, batch_size=8, epochs=3, seed=1, prefetch=0,
                         native=False)
    it = iter(loader)
    for _ in range(5):
        next(it)
    state = loader.state()
    want = next(it)

    fresh = TrainLoader(data, batch_size=8, epochs=3, seed=1, prefetch=0,
                        native=False)
    fresh.restore(state)
    got = next(iter(fresh))
    np.testing.assert_array_equal(want[0], got[0])
    np.testing.assert_array_equal(want[1], got[1])


def test_train_loader_prefetch(digits_pool):
    images, _ = digits_pool
    data = (images[:64], np.arange(64) % 3)
    staged = []
    loader = TrainLoader(data, batch_size=8, epochs=1, seed=1, prefetch=2,
                         device_put=lambda b: (staged.append(1), b)[1],
                         native=False)
    batches = list(loader)
    assert len(batches) == 8
    assert len(staged) == 8


# --- native C++ backend --------------------------------------------------------

def test_native_loader_matches_numpy_gather(digits_pool):
    pytest.importorskip("ctypes")
    try:
        from air_tpu.runtime import NativeShuffleLoader
        images, _ = digits_pool
        nat = NativeShuffleLoader(images[:50], np.arange(50, dtype=np.int32),
                                  batch_size=8, seed=3)
    except Exception as e:  # toolchain unavailable
        pytest.skip(f"native build unavailable: {e}")
    idx = np.array([4, 0, 49, 7], np.int32)
    imgs, digs = nat.gather(idx)
    np.testing.assert_array_equal(imgs, images[:50][idx])
    np.testing.assert_array_equal(digs, idx)
    # permutations: valid, deterministic per (seed, epoch), distinct per epoch
    p0, p0b, p1 = nat.perm(0), nat.perm(0), nat.perm(1)
    np.testing.assert_array_equal(np.sort(p0), np.arange(50))
    np.testing.assert_array_equal(p0, p0b)
    assert not np.array_equal(p0, p1)


def test_train_loader_native_backend(digits_pool):
    images, _ = digits_pool
    data = (images[:64], np.arange(64, dtype=np.int32) % 3)
    try:
        loader = TrainLoader(data, batch_size=8, epochs=1, seed=1,
                             prefetch=0, native=True)
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    assert loader._native is not None
    batches = list(loader)
    assert len(batches) == 8
    # every record appears exactly once per epoch
    seen = np.concatenate([b[1] for b in batches])
    assert len(seen) == 64


def test_procedural_backgrounds():
    from air_tpu.data.backgrounds import generate_background, background_bank
    for kind in ["noise", "gradient", "stripes", "blobs", "checker"]:
        bg = generate_background(kind, 50, seed=1, max_intensity=0.3)
        assert bg.shape == (50, 50)
        assert bg.min() >= 0.0 and bg.max() <= 0.3 + 1e-6
        # deterministic
        np.testing.assert_array_equal(
            bg, generate_background(kind, 50, seed=1, max_intensity=0.3))
    bank = background_bank(50, seed=0)
    assert len(bank) == 19   # same count as the reference's backgrounds/


def test_generate_dataset_with_procedural_bg(digits_pool):
    images, labels = digits_pool
    cfg = MultiMNISTConfig(max_digits=1, max_in_common=1, images_per_digit=3,
                           test_set_size=1, bg_kind="noise",
                           bg_max_intensity=0.3)
    out = generate_dataset(images, labels, cfg)
    zero = [im for im, d in zip(out["common"]["images"],
                                out["common"]["digits"]) if d == 0]
    assert zero and np.asarray(zero[0]).sum() > 0   # background ink present


def test_train_loader_state_tracks_consumption(digits_pool):
    """state() must reflect the CONSUMED position, not the producer
    thread's prefetch-ahead position (resume-exactness; ADVICE r1)."""
    images, _ = digits_pool
    data = (images[:64], np.arange(64) % 3)
    loader = TrainLoader(data, batch_size=8, epochs=3, seed=1, prefetch=2,
                         native=False)
    it = iter(loader)
    next(it)
    import time
    time.sleep(0.3)          # let the producer run ahead
    st = loader.state()
    assert st["index"] == 8  # exactly one batch consumed
    # and resume from that state delivers the same batch 2 as continuing
    want = next(it)
    fresh = TrainLoader(data, batch_size=8, epochs=3, seed=1, prefetch=0,
                        native=False)
    fresh.restore(st)
    got = next(iter(fresh))
    np.testing.assert_array_equal(want[0], got[0])


def test_load_sklearn_digits_real_handwriting():
    """The bundled UCI handwritten digits (the only REAL handwriting in a
    zero-egress image) must come out MNIST-shaped: 28x28 frames with a
    centered ~20x20 ink region and MNIST-like ink statistics, drop-in
    compatible with the multi-MNIST generator."""
    pytest.importorskip("sklearn")
    from air_tpu.data.mnist import load_sklearn_digits

    images, labels = load_sklearn_digits()
    assert images.shape == (1797, 784) and labels.shape == (1797,)
    assert images.dtype == np.float32 and labels.dtype == np.int32
    assert 0.0 <= images.min() and images.max() <= 1.0
    assert set(np.unique(labels)) == set(range(10))
    grid = images.reshape(-1, 28, 28)
    # ink confined to the centered 20x20 region (4px MNIST-style margin)
    assert grid[:, :4, :].max() == 0.0 and grid[:, :, :4].max() == 0.0
    assert grid[:, 24:, :].max() == 0.0 and grid[:, :, 24:].max() == 0.0
    # MNIST-like ink mass (synthesize_mnist targets ~150-250 px per digit)
    ink = (images > 0.1).sum(axis=1)
    assert 120 < ink.mean() < 320
    # and the generator accepts them directly
    cfg = MultiMNISTConfig(max_digits=2, max_in_common=2, images_per_digit=3,
                           test_set_size=2)
    out = generate_dataset(images[:50], labels[:50], cfg)
    assert len(out["common"]["images"]) > 0


def test_loader_producer_error_propagates():
    """A producer-thread failure must surface in the consumer's for-loop,
    not end the epoch stream 'cleanly' (loader.py producer exception
    forwarding)."""
    images = np.zeros((16, 25), np.float32)
    digits = np.zeros((16,), np.int32)
    loader = TrainLoader((images, digits), batch_size=4, epochs=1,
                         prefetch=2, native=False)

    def boom(epoch):
        raise RuntimeError("disk gone")

    loader._perm = boom
    with pytest.raises(RuntimeError, match="disk gone"):
        for _ in loader:
            pass


def test_loader_abandoned_iterator_releases_producer():
    """Breaking out of the batch loop must let the prefetch producer
    thread exit (bounded put + abandoned event), not leak it blocked on a
    full queue."""
    import threading
    import time

    images = np.zeros((64, 25), np.float32)
    digits = np.zeros((64,), np.int32)
    loader = TrainLoader((images, digits), batch_size=4, epochs=100,
                         prefetch=1, native=False)
    before = set(threading.enumerate())
    it = iter(loader)
    next(it)
    spawned = [t for t in threading.enumerate() if t not in before]
    assert spawned, "prefetch producer thread expected"
    it.close()  # triggers the iterator's finally -> abandoned.set()
    deadline = time.time() + 10
    for t in spawned:
        t.join(timeout=max(0.0, deadline - time.time()))
    assert all(not t.is_alive() for t in spawned)


def test_loader_backend_mismatch_warns():
    """Resuming under a different permutation backend than the checkpoint
    was written under replays a different data order — must warn."""
    images = np.zeros((16, 25), np.float32)
    digits = np.zeros((16,), np.int32)
    loader = TrainLoader((images, digits), batch_size=4, native=False)
    st = loader.state()
    assert st["perm_backend"] == "numpy"
    st["perm_backend"] = "native"
    with pytest.warns(UserWarning, match="permutation backend"):
        loader.restore(st)


def test_loader_rejects_sub_batch_dataset():
    """A dataset smaller than one batch would yield ZERO batches per epoch
    and spin the training loop at step 0 forever (observed with a
    clobbered 8-image dataset) — both loaders must refuse at construction."""
    import pytest
    from air_tpu.data.loader import TrainLoader
    from air_tpu.train.fast_pipeline import DeviceDataPipeline
    images = np.zeros((8, 2500), np.float32)
    digits = np.zeros((8,), np.int32)
    with pytest.raises(ValueError, match="no full batch"):
        TrainLoader((images, digits), batch_size=64)
    with pytest.raises(ValueError, match="no full batch"):
        DeviceDataPipeline(images, digits, batch_size=64)
    # exactly one batch is fine
    assert TrainLoader((images, digits), batch_size=8).batches_per_epoch == 1
    assert DeviceDataPipeline(images, digits, batch_size=8).chunk(50) == 1


def test_sklearn_digits_bicubic_arm():
    """The bicubic upsample is a separate data-fidelity arm: the default
    bilinear path must stay bit-identical to the round-4 datasets (its
    regeneration contract), bicubic must differ smoothly, labels equal."""
    sklearn = pytest.importorskip("sklearn")  # noqa: F841
    from air_tpu.data.mnist import load_sklearn_digits
    bi, lb = load_sklearn_digits()
    bc, lc = load_sklearn_digits(interp="bicubic")
    assert np.array_equal(lb, lc)
    assert bi.shape == bc.shape == (1797, 784)
    # the round-4 bilinear pin: exact golden statistics (any numeric
    # change to the default path breaks dataset reproducibility)
    assert bi.dtype == np.float32
    np.testing.assert_allclose(float(bi.sum()), 284819.71875, rtol=1e-5)
    np.testing.assert_allclose(float(bi[0].sum()), 158.199249, rtol=1e-5)
    # bicubic: in range, close but not identical, smoother edges
    assert 0.0 <= bc.min() and bc.max() <= 1.0
    rel = np.linalg.norm(bi - bc) / np.linalg.norm(bi)
    assert 0.01 < rel < 0.2
