"""Shipped pretrained checkpoint (model/) loads and performs.

The reference ships a trained checkpoint in model/ (reference README.md:12);
ours must load through the public path and count digits well on freshly
generated in-distribution data.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "model", "air-model-80000.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="shipped checkpoint absent")


def test_shipped_checkpoint_counts_digits():
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG as CFG
    from air_tpu.train.checkpoint import load_params
    from air_tpu.serve.model_wrapper import ModelWrapper
    from air_tpu.data import get_mnist, generate_dataset, MultiMNISTConfig

    params = load_params(CKPT)
    wrapper = ModelWrapper(CFG, params)

    digits, labels, _ = get_mnist("/nonexistent-dir", n_synthetic=300, seed=7)
    data = generate_dataset(
        digits, labels,
        MultiMNISTConfig(max_digits=2, images_per_digit=20, test_set_size=30,
                         seed=7))
    images = np.asarray(data["test"]["images"], np.float32).reshape(30, -1)
    truth = np.asarray(data["test"]["digits"])

    pred, *_ = wrapper.infer(images)
    acc = float(np.mean(np.asarray(pred) == truth))
    assert acc >= 0.8, f"shipped model accuracy {acc} on fresh data"


def test_shipped_checkpoint_resumes_training():
    """load_checkpoint accepts the params-only file (fresh optimizer)."""
    import jax.numpy as jnp
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG as CFG
    from air_tpu.train.checkpoint import load_checkpoint
    from air_tpu.train.steps import make_train_step

    state = load_checkpoint(CKPT, CFG)
    assert int(state.step) == 80000
    step_fn = make_train_step(CFG, donate=False)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(8, 2500)).astype(np.float32))
    targs = jnp.zeros((8,), jnp.int32)
    new_state, metrics = step_fn(state, images, targs)
    assert int(new_state.step) == 80001
    assert np.isfinite(float(metrics["loss"]))


CNN_CKPT = os.path.join(REPO, "model", "air-model-cnn-47500.npz")


@pytest.mark.skipif(not os.path.exists(CNN_CKPT),
                    reason="shipped CNN checkpoint absent")
def test_shipped_cnn_checkpoint_counts_digits():
    """The robust-default (CNN) checkpoint loads with arch auto-detection
    and counts digits on in-distribution data (RESULTS.md round-2
    robustness table, seed 1)."""
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG as CFG
    from air_tpu.train.checkpoint import load_params, checkpoint_arch
    from air_tpu.serve.model_wrapper import ModelWrapper
    from air_tpu.data import get_mnist, generate_dataset, MultiMNISTConfig

    arch = checkpoint_arch(CNN_CKPT)
    assert arch == {"cnn": True, "learn_background": False}
    params = load_params(CNN_CKPT)
    wrapper = ModelWrapper(CFG.replace(**arch), params)

    digits, labels, _ = get_mnist("/nonexistent-dir", n_synthetic=300, seed=11)
    data = generate_dataset(
        digits, labels,
        MultiMNISTConfig(max_digits=2, max_in_common=2, images_per_digit=40,
                         test_set_size=60, canvas_size=50, seed=11),
        out_dir=None)
    images = np.asarray(data["test"]["images"], np.float32).reshape(-1, 2500)
    targets = np.asarray(data["test"]["digits"], np.int32)
    rec_digits = wrapper.infer(images)[0]
    acc = float(np.mean(np.asarray(rec_digits) == targets))
    assert acc >= 0.9, f"shipped CNN checkpoint accuracy {acc}"
