"""Serving + tools tests: ModelWrapper parity, headless demo, embeddings."""

import io
import json

import numpy as np
import jax
import pytest

from air_tpu.models.air import init_air_params
from air_tpu.serve.model_wrapper import ModelWrapper, _next_bucket
from tests.test_model import SMALL


@pytest.fixture(scope="module")
def wrapper():
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    return ModelWrapper(SMALL, params)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    out = []
    for _ in range(5):
        img = np.zeros((cs, cs), np.float32)
        x, y = rng.integers(2, cs - 8, 2)
        img[y:y + 6, x:x + 6] = 1.0
        out.append(img)
    return out


def test_bucket_sizes():
    assert _next_bucket(1) == 1
    assert _next_bucket(2) == 8
    assert _next_bucket(64) == 64
    assert _next_bucket(65) == 256
    assert _next_bucket(2000) == 2048


def test_infer_reference_shape(wrapper, frames):
    digits, positions, recons, windows, latents, losses = \
        wrapper.infer(frames)
    n = len(frames)
    assert len(digits) == len(positions) == len(recons) == n
    assert len(windows) == len(latents) == len(losses) == n
    cs, ws = SMALL.canvas_size, SMALL.windows_size
    for i in range(n):
        d = digits[i]
        assert 0 <= d <= SMALL.max_steps
        assert recons[i].shape == (cs, cs)
        assert positions[i].shape == ((d, 3) if d else (0,))
        assert windows[i].shape == ((d, ws, ws) if d else (0,))
        assert latents[i].shape == ((d, SMALL.vae_latent_dimensions)
                                    if d else (0,))
        # positions are (scale, shift_x, shift_y)
        for j in range(d):
            assert 0.0 <= positions[i][j][0] <= 1.0
            assert -1.0 <= positions[i][j][1] <= 1.0


def test_infer_batch_padding_consistency(wrapper, frames):
    """Inference on 5 frames (padded to bucket 8) must match each frame's
    values regardless of padding."""
    out5 = wrapper.infer_batch(np.asarray(frames).reshape(5, -1))
    assert out5.reconstruction.shape[0] == 5
    assert np.isfinite(out5.reconstruction_loss).all()


def test_headless_demo_stream(wrapper, frames):
    from air_tpu.tools.headless_demo import stream
    buf = io.StringIO()
    stats = stream(wrapper, frames, batch_size=2, out=buf)
    lines = [json.loads(line) for line in buf.getvalue().splitlines()]
    assert len(lines) == 5
    assert stats["frames"] == 5
    assert stats["frames_per_sec"] > 0
    for rec in lines:
        assert {"frame", "digits", "boxes", "nll", "latency_ms"} <= set(rec)


def test_scribble_frames():
    from air_tpu.tools.headless_demo import scribble_frames
    frames = list(scribble_frames(20, 4, seed=1))
    assert len(frames) == 4
    assert frames[0].shape == (20, 20)


# --- embeddings ----------------------------------------------------------------

def test_match_data_with_rec_greedy():
    from air_tpu.tools.embeddings import match_data_with_rec
    data_info = [{"num_digits": 2, "digits": [
        {"id": 7, "label": 3, "st_center": [0.5, 0.5]},
        {"id": 9, "label": 1, "st_center": [-0.5, -0.5]},
    ]}]
    rec_info = [{"num_digits": 2, "digits": [
        {"shift": np.array([0.52, 0.51]), "window": np.zeros((4, 4)),
         "latent": np.arange(3)},
        {"shift": np.array([-0.48, -0.52]), "window": np.ones((4, 4)),
         "latent": np.arange(3) + 10},
    ]}]
    matched = match_data_with_rec(data_info, rec_info, max_distance=0.1)
    assert len(matched) == 2
    assert matched[0]["id"] == 7 and matched[0]["label"] == 3
    np.testing.assert_array_equal(matched[0]["latent"], np.arange(3))
    # each inferred box used at most once
    rec_info[0]["digits"][1]["shift"] = np.array([0.53, 0.5])
    matched2 = match_data_with_rec(data_info, rec_info, max_distance=0.1)
    assert len(matched2) == 1


def test_st_center_mapping():
    from air_tpu.tools.embeddings import collect_data_info
    # a box spanning the whole 50-canvas centers at st (0,0)
    info = collect_data_info([1], [[0]], [[0, 0]], [[50, 50]], [[5]],
                             canvas_size=50)
    np.testing.assert_allclose(info[0]["digits"][0]["st_center"], [0.0, 0.0])
    # reference quirk check: pixel_center/24.5 - 1 (embeddings.py:43-44)
    info2 = collect_data_info([1], [[0]], [[0, 0]], [[2, 2]], [[5]],
                              canvas_size=50)
    np.testing.assert_allclose(info2[0]["digits"][0]["st_center"],
                               [0.5 / 24.5 - 1.0] * 2)


def test_projector_dataset_files(tmp_path, wrapper, frames):
    from air_tpu.tools.embeddings import write_projector_dataset
    latents = np.random.default_rng(0).normal(size=(4, 6))
    images = np.random.default_rng(1).uniform(
        size=(4, SMALL.windows_size, SMALL.windows_size))
    files = write_projector_dataset(str(tmp_path), latents, images,
                                    [1, 2, 3, 4], SMALL.windows_size)
    import os
    for f in files.values():
        assert os.path.exists(f)
    vecs = np.loadtxt(files["tensors"], delimiter="\t")
    np.testing.assert_allclose(vecs, latents, rtol=1e-4)
    meta = open(files["metadata"]).read().splitlines()
    assert meta[0] == "Index\tLabel"
    assert len(meta) == 5
    cfg = open(files["config"]).read()
    assert "sprite" in cfg and "single_image_dim: " in cfg


def test_embeddings_run_end_to_end(tmp_path, wrapper):
    """Full inference -> match -> projector pipeline on a tiny record file."""
    from air_tpu.data.records import write_records
    from air_tpu.tools.embeddings import run
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = np.zeros((6, cs, cs), np.float32)
    digits = np.array([1, 1, 2, 0, 1, 2])
    indices, positions, boxes, labels = [], [], [], []
    for i in range(6):
        idx, pos, box, lab = [], [], [], []
        for j in range(digits[i]):
            x, y = rng.integers(2, cs - 8, 2)
            images[i, y:y + 6, x:x + 6] = 1.0
            idx.append(i * 10 + j)
            pos.extend([int(x), int(y)])
            box.extend([6, 6])
            lab.append(int(rng.integers(0, 10)))
        indices.append(idx)
        positions.append(pos)
        boxes.append(box)
        labels.append(lab)
    rec_path = write_records(str(tmp_path / "t"), images, digits, indices,
                             positions, boxes, labels, max_digits=2)
    stats = run(wrapper, rec_path, str(tmp_path / "emb"),
                canvas_size=cs, window_size=SMALL.windows_size,
                verbose=False)
    assert stats["present_digits"] == int(digits.sum())
    assert stats["matched"] >= 0


def test_packed_infer_matches_infer_batch(frames):
    """The single-transfer packed serving path must produce the same values
    as the full-output infer_batch path (same PRNG call sequence)."""
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    w1 = ModelWrapper(SMALL, params, seed=5)
    w2 = ModelWrapper(SMALL, params, seed=5)
    digits, positions, recons, windows, latents, losses = w1.infer(frames)
    out = w2.infer_batch(np.asarray(frames).reshape(len(frames), -1))
    np.testing.assert_array_equal(np.asarray(digits),
                                  np.asarray(out.rec_num_digits))
    np.testing.assert_allclose(
        np.stack([r.ravel() for r in recons]),
        np.asarray(out.reconstruction), atol=1e-5)
    np.testing.assert_allclose(np.asarray(losses),
                               np.asarray(out.reconstruction_loss),
                               rtol=1e-5)


def test_infer_batch_scalars_exclude_padding(wrapper, frames):
    """5 frames pad to bucket 8; the batch-mean scalars must be recomputed
    over the 5 REAL rows (padding rows would otherwise dilute the loss and
    count as free 'correct' predictions)."""
    out = wrapper.infer_batch(np.asarray(frames).reshape(5, -1))
    assert out.per_example_loss.shape[0] == 5
    np.testing.assert_allclose(
        float(out.loss), float(np.mean(out.per_example_loss)), rtol=1e-6)
    np.testing.assert_allclose(
        float(out.accuracy), float(np.mean(out.rec_num_digits == 0)),
        rtol=1e-6)


def test_wrapper_geometry_args_validated():
    """Reference-ctor-parity canvas/window args that DISAGREE with the
    config would silently misalign the packed columns — must raise."""
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    with pytest.raises(ValueError, match="canvas_size"):
        ModelWrapper(SMALL, params, canvas_size=SMALL.canvas_size + 1)
    with pytest.raises(ValueError, match="window_size"):
        ModelWrapper(SMALL, params, window_size=SMALL.windows_size + 1)
    ModelWrapper(SMALL, params, canvas_size=SMALL.canvas_size,
                 window_size=SMALL.windows_size)


def test_serving_defaults_to_stepparallel_and_matches_scan(frames):
    """Serving defaults to the step-parallel decoder (a compute-path
    knob: params identical, per-step RNG keys split the same way), so
    infer() must match a forced-scan wrapper bit-for-bit."""
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    w_sp = ModelWrapper(SMALL, params, seed=3)
    assert w_sp.config.decoder_layout == "stepparallel"
    w_scan = ModelWrapper(SMALL, params, seed=3, decoder_layout="scan")
    assert w_scan.config.decoder_layout == "scan"
    out_sp = w_sp.infer(frames)
    out_scan = w_scan.infer(frames)
    assert out_sp[0] == out_scan[0]                     # digit counts
    for field_sp, field_scan in zip(out_sp[1:], out_scan[1:]):
        for a, b in zip(field_sp, field_scan):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_serving_pallas_st_keeps_own_layout():
    """stepparallel requires st_impl='xla'; a Pallas-ST checkpoint must
    fall back to its own (scan) layout instead of raising."""
    cfg = SMALL.replace(st_impl="pallas")
    params = init_air_params(jax.random.PRNGKey(0), cfg)
    w = ModelWrapper(cfg, params)
    assert w.config.decoder_layout == "scan"


# --- embeddings CLI output-folder guard ----------------------------------------

def test_embeddings_prepare_folder_refuses_alien_files(tmp_path):
    """The CLI wipes its output folder for fresh-run semantics (reference
    embeddings.py behavior) — but must refuse to delete a folder holding
    anything it did not write itself, e.g. a training run's checkpoints
    (pointing --results-folder at the run folder used to silently delete
    the very checkpoint being loaded)."""
    import embeddings as cli

    run_dir = tmp_path / "train_run"
    run_dir.mkdir()
    (run_dir / "air-model-55000.npz").write_bytes(b"x")
    with pytest.raises(SystemExit) as e:
        cli.prepare_results_folder(str(run_dir))
    assert "refusing" in str(e.value)
    assert (run_dir / "air-model-55000.npz").exists()

    # A previous embeddings output IS deleted and recreated fresh.
    emb_dir = tmp_path / "emb"
    emb_dir.mkdir()
    for name in ("vae_tensors.tsv", "mnist_metadata.tsv",
                 "mnist_sprites.png", "projector_config.pbtxt"):
        (emb_dir / name).write_text("old")
    cli.prepare_results_folder(str(emb_dir))
    assert emb_dir.is_dir() and not list(emb_dir.iterdir())

    # A nonexistent folder is simply created.
    fresh = tmp_path / "new_out"
    cli.prepare_results_folder(str(fresh))
    assert fresh.is_dir()
