"""Pure-python TensorBoard event writer: validated with the tensorboard
package's own EventAccumulator (no TensorFlow in this image)."""

import numpy as np
import pytest

from air_tpu.utils.tb_writer import EventWriter, crc32c, masked_crc32c

# whole-trainer / end-to-end tests: the suite's slow lane
pytestmark = pytest.mark.slow


def test_crc32c_known_vectors():
    # RFC 3720 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # masking is invertible-ish sanity: differs from raw crc
    assert masked_crc32c(b"123456789") != crc32c(b"123456789")


def test_event_writer_loads_in_tensorboard(tmp_path):
    ea = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, step=10)
    w.add_scalar("train/loss", 0.5, step=20)
    w.add_scalars({"test/a": 1.0, "test/b": 2.0}, step=30)
    rng = np.random.default_rng(0)
    values = rng.normal(size=1000)
    w.add_histogram("var/weights", values, step=10)
    w.flush()
    w.close()

    acc = ea.EventAccumulator(str(tmp_path),
                              size_guidance={"scalars": 0, "histograms": 0})
    acc.Reload()
    assert set(acc.Tags()["scalars"]) == {"train/loss", "test/a", "test/b"}
    loss = acc.Scalars("train/loss")
    assert [e.step for e in loss] == [10, 20]
    assert abs(loss[0].value - 1.5) < 1e-6
    assert abs(acc.Scalars("test/b")[0].value - 2.0) < 1e-6

    h = acc.Histograms("var/weights")[0].histogram_value
    assert int(h.num) == 1000
    assert abs(h.sum - values.sum()) < 1e-5
    assert abs(h.min - values.min()) < 1e-12
    assert abs(h.max - values.max()) < 1e-12
    assert sum(h.bucket) == 1000


def test_metrics_writer_tensorboard_mirror(tmp_path):
    ea = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    from air_tpu.train.metrics import MetricsWriter
    mw = MetricsWriter(str(tmp_path), tensorboard=True)
    mw.write(5, {"loss": 1.25, "accuracy": 0.5}, prefix="train/")
    mw.write_histograms(7, {"lstm/kernel": np.arange(100.0)}, prefix="var/")
    mw.close()

    acc = ea.EventAccumulator(str(tmp_path),
                              size_guidance={"scalars": 0, "histograms": 0})
    acc.Reload()
    assert "train/loss" in acc.Tags()["scalars"]
    assert abs(acc.Scalars("train/loss")[0].value - 1.25) < 1e-6
    hist = acc.Histograms("var/lstm/kernel")[0]
    assert hist.step == 7
    assert int(hist.histogram_value.num) == 100


def test_trainer_writes_tb_events(tmp_path):
    ea = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")
    from air_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_model import SMALL
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(32, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 32).astype(np.int32)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "run"), batch_size=8, epochs=None,
        max_iterations=4, num_summaries_every=2, var_summaries_every=2,
        img_summaries_every=100, grad_summaries_every=2,
        save_params_every=100, eval_batch_size=16, seed=0, log_every=2,
        source_snapshot=False, tensorboard=True)
    tr = Trainer(SMALL, tcfg, (images, digits), (images[:16], digits[:16]))
    tr.train()

    logdir = str(tmp_path / "run" / "summary")
    acc = ea.EventAccumulator(logdir,
                              size_guidance={"scalars": 0, "histograms": 0})
    acc.Reload()
    tags = acc.Tags()
    assert any(t.startswith("train/loss") for t in tags["scalars"])
    assert any(t.startswith("test/") for t in tags["scalars"])
    hist_tags = tags["histograms"]
    assert any(t.startswith("var/lstm") for t in hist_tags)
    assert any(t.endswith("_grad_original") for t in hist_tags)
    assert any(t.endswith("_grad_applied") for t in hist_tags)
