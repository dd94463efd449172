"""Harder-scenes background support: the learned static background canvas
(models/config.py learn_background) and the on-device background-intensity
curriculum (train/steps.py bg_intensity / bg_image compositing).

The generator composites ONE static texture into every canvas (reference
multi_mnist.py:319-334), so clip(clean + s * bg) reproduces the composited
dataset exactly (verified bit-exact against harder_bg*_data)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from air_tpu.models.config import AIRConfig
from air_tpu.models.air import air_forward, init_air_params
from air_tpu.train.state import create_train_state
from air_tpu.train.steps import bg_intensity, make_train_step

# whole-trainer / end-to-end tests: the suite's slow lane
pytestmark = pytest.mark.slow

SMALL = AIRConfig(
    max_steps=3, max_digits=2, rnn_units=32, canvas_size=20, windows_size=8,
    vae_latent_dimensions=6, vae_recognition_units=(32, 16),
    vae_generative_units=(16, 32),
    scale_hidden_units=8, shift_hidden_units=8, z_pres_hidden_units=8,
    cnn=False, train=True,
)
SMALL_BG = SMALL.replace(learn_background=True)


def _batch(n=6):
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (n, SMALL.canvas_size ** 2))
    targets = jnp.array([0, 1, 2, 1, 0, 2], jnp.int32)[:n]
    return images, targets


# -- intensity schedule ------------------------------------------------------

def test_bg_intensity_ramp():
    sched = {"target": 0.3, "start": 100, "ramp": 200}
    assert float(bg_intensity(sched, 0)) == 0.0
    assert float(bg_intensity(sched, 100)) == 0.0
    assert np.isclose(float(bg_intensity(sched, 200)), 0.15)
    assert np.isclose(float(bg_intensity(sched, 300)), 0.3)
    assert np.isclose(float(bg_intensity(sched, 10 ** 6)), 0.3)


def test_bg_intensity_jump_and_defaults():
    assert float(bg_intensity({"target": 0.5, "start": 10, "ramp": 0}, 9)) \
        == 0.0
    assert float(bg_intensity({"target": 0.5, "start": 10, "ramp": 0}, 10)) \
        == 0.5
    assert float(bg_intensity(None, 123)) == 1.0


# -- train-step compositing --------------------------------------------------

def test_composited_step_matches_manual_compositing():
    """A bg-enabled step past the ramp == a plain step on pre-composited
    images (the exact dataset-equivalence contract)."""
    bg = jax.random.uniform(jax.random.PRNGKey(7),
                            (SMALL.canvas_size ** 2,), maxval=0.8)
    sched = {"target": 0.3, "start": 0, "ramp": 100}
    step_bg = make_train_step(SMALL, bg_image=bg, bg_schedule=sched,
                              donate=False)
    step_plain = make_train_step(SMALL, donate=False)
    images, targets = _batch()

    state = create_train_state(SMALL, rng=0).replace(
        step=jnp.asarray(500, jnp.int32))  # past the ramp -> s = target
    manual = jnp.clip(images + 0.3 * bg[None, :], 0.0, 1.0)
    _, m_bg = step_bg(state, images, targets)
    state2 = create_train_state(SMALL, rng=0).replace(
        step=jnp.asarray(500, jnp.int32))
    _, m_plain = step_plain(state2, manual, targets)
    assert np.isclose(float(m_bg["loss"]), float(m_plain["loss"]),
                      rtol=1e-5)
    assert np.isclose(float(m_bg["bg_intensity"]), 0.3)


def test_composited_step_is_identity_before_start():
    bg = jnp.ones((SMALL.canvas_size ** 2,))
    sched = {"target": 1.0, "start": 1000, "ramp": 100}
    step_bg = make_train_step(SMALL, bg_image=bg, bg_schedule=sched,
                              donate=False)
    step_plain = make_train_step(SMALL, donate=False)
    images, targets = _batch()
    state = create_train_state(SMALL, rng=0)
    _, m_bg = step_bg(state, images, targets)
    state2 = create_train_state(SMALL, rng=0)
    _, m_plain = step_plain(state2, images, targets)
    assert float(m_bg["loss"]) == float(m_plain["loss"])
    assert float(m_bg["bg_intensity"]) == 0.0


def test_multi_step_compositing_compiles():
    from air_tpu.train.fast_pipeline import make_multi_step
    bg = jax.random.uniform(jax.random.PRNGKey(3),
                            (SMALL.canvas_size ** 2,))
    multi = make_multi_step(SMALL, num_steps=2, batch_size=4,
                            bg_image=bg,
                            bg_schedule={"target": 0.2, "start": 0,
                                         "ramp": 10})
    images = jax.random.uniform(jax.random.PRNGKey(4),
                                (8, SMALL.canvas_size ** 2))
    digits = jnp.zeros((8,), jnp.int32)
    state = create_train_state(SMALL, rng=0)
    perm = jnp.arange(8)
    state, metrics = multi(state, images, digits, perm,
                           jnp.asarray(0, jnp.int32))
    assert metrics["loss"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


# -- learned static background ----------------------------------------------

def test_learn_background_param_exists_and_default_absent():
    p = init_air_params(jax.random.PRNGKey(0), SMALL_BG)
    assert p["background"].shape == (SMALL.canvas_size ** 2,)
    p0 = init_air_params(jax.random.PRNGKey(0), SMALL)
    assert "background" not in p0


def test_learn_background_floors_reconstruction():
    """With all-dead z_pres impossible to force cheaply, check the floor on
    a fresh init: reconstruction >= ~sigmoid(background) where nothing was
    painted (canvas accumulates on top of the background)."""
    params = init_air_params(jax.random.PRNGKey(0), SMALL_BG)
    params["background"] = jnp.full_like(params["background"], 2.0)
    images, targets = _batch()
    out = air_forward(params, SMALL_BG, images, targets,
                      jax.random.PRNGKey(2))
    floor = float(jax.nn.sigmoid(2.0))
    assert float(out.reconstruction.min()) >= floor - 1e-6


def test_learn_background_gets_gradients():
    params = init_air_params(jax.random.PRNGKey(0), SMALL_BG)
    images, targets = _batch()

    def loss_fn(p):
        return air_forward(p, SMALL_BG, images, targets,
                           jax.random.PRNGKey(2)).loss

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["background"]).max()) > 0.0


def test_learn_background_trains_toward_static_bg():
    """On images that ARE a fixed background (zero digits), a few SGD steps
    must push sigmoid(background) toward it."""
    bg_true = np.clip(
        np.asarray(jax.random.uniform(jax.random.PRNGKey(9),
                                      (SMALL.canvas_size ** 2,))), 0.05, 0.95)
    images = jnp.tile(jnp.asarray(bg_true)[None, :], (6, 1))
    targets = jnp.zeros((6,), jnp.int32)
    step = make_train_step(SMALL_BG, donate=False)
    state = create_train_state(SMALL_BG, rng=0)
    err0 = float(jnp.mean(jnp.abs(
        jax.nn.sigmoid(state.params["background"]) - bg_true)))
    for _ in range(25):
        state, _ = step(state, images, targets)
    err1 = float(jnp.mean(jnp.abs(
        jax.nn.sigmoid(state.params["background"]) - bg_true)))
    assert err1 < err0


def test_estimate_background_zero_digit_exact():
    """0-digit scenes ARE clip(s*bg) — the estimator recovers them exactly;
    without digit labels the per-pixel min over sparse scenes also works."""
    from air_tpu.data.backgrounds import estimate_background
    rng = np.random.default_rng(0)
    bg = rng.uniform(0, 0.6, (400,)).astype(np.float32)
    # scenes: some with "ink" blobs added, some with none (0-digit)
    n = 40
    images = np.tile(bg, (n, 1))
    digits = np.zeros((n,), np.int32)
    for i in range(1, n):
        sel = rng.choice(400, 40, replace=False)
        images[i, sel] = np.clip(images[i, sel] + 1.0, 0, 1)
        digits[i] = 1
    est = estimate_background(images, digits)
    np.testing.assert_allclose(est, bg, atol=1e-6)
    est_min = estimate_background(images)   # no labels -> per-pixel min
    np.testing.assert_allclose(est_min, bg, atol=1e-6)


def test_background_init_data_driven():
    """init_air_params(background_init=...) stores logits whose sigmoid
    reproduces the pixel-space estimate; create_train_state threads it."""
    est = np.clip(np.random.default_rng(1).uniform(
        0, 0.8, (SMALL.canvas_size ** 2,)), 0, 1).astype(np.float32)
    p = init_air_params(jax.random.PRNGKey(0), SMALL_BG, background_init=est)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(p["background"])),
        np.clip(est, 1e-3, 1 - 1e-3), atol=1e-5)
    state = create_train_state(SMALL_BG, rng=0, background_init=est)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(state.params["background"])),
        np.clip(est, 1e-3, 1 - 1e-3), atol=1e-5)
    with pytest.raises(ValueError):
        init_air_params(jax.random.PRNGKey(0), SMALL_BG,
                        background_init=est[:10])


def test_background_init_perfect_recon_of_zero_digit_scene():
    """With an exact background init, a 0-digit composited scene
    reconstructs (nearly) perfectly at step 0 even if all z_pres fire —
    the whole point of the data-driven init."""
    bg_true = np.clip(np.asarray(jax.random.uniform(
        jax.random.PRNGKey(9), (SMALL.canvas_size ** 2,))),
        0.05, 0.95).astype(np.float32)
    params = init_air_params(jax.random.PRNGKey(0), SMALL_BG,
                             background_init=bg_true)
    images = jnp.tile(jnp.asarray(bg_true)[None, :], (4, 1))
    targets = jnp.zeros((4,), jnp.int32)
    out = air_forward(params, SMALL_BG, images, targets, jax.random.PRNGKey(2))
    # recon = clip(bg + sum z*windows) >= bg; error vs a blank-canvas init
    # must collapse by >10x on the background pixels the windows miss
    blank = init_air_params(jax.random.PRNGKey(0), SMALL_BG)
    out_blank = air_forward(blank, SMALL_BG, images, targets,
                            jax.random.PRNGKey(2))
    err = float(jnp.mean(jnp.abs(out.reconstruction - images)))
    err_blank = float(jnp.mean(jnp.abs(out_blank.reconstruction - images)))
    assert err < err_blank / 3


def test_checkpoint_roundtrip_with_background(tmp_path):
    from air_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    state = create_train_state(SMALL_BG, rng=0)
    path = save_checkpoint(str(tmp_path), state, 0)
    restored = load_checkpoint(path, SMALL_BG)
    np.testing.assert_array_equal(
        np.asarray(state.params["background"]),
        np.asarray(restored.params["background"]))


def test_prepare_background_matches_generator_texture(tmp_path):
    """training.py's on-device curriculum compositor must see the SAME
    pixels the dataset generator composited (shared prepare_background):
    PNG path incl. the center-crop/tile-to-canvas step."""
    import numpy as np
    from PIL import Image
    from air_tpu.data.multi_mnist import (prepare_background, read_image,
                                          MultiMNISTConfig, generate_dataset)

    rng = np.random.default_rng(3)
    tex = (rng.uniform(0.2, 1.0, size=(30, 70)) * 255).astype(np.uint8)
    p = str(tmp_path / "tex.png")
    Image.fromarray(tex, "L").save(p)

    bg = prepare_background(50, bg_path=p, max_intensity=1.0)
    assert bg.shape == (50, 50)
    # tiling: rows 0-29 from the texture, rows 30-49 repeat rows 0-19
    full = read_image(p, 1.0)
    np.testing.assert_allclose(bg[:30], full[:, :50])
    np.testing.assert_allclose(bg[30:], full[:20, :50])

    # a 0-digit scene from the generator IS that background
    digits = np.zeros((40, 784), np.float32)
    digits[:, 300:340] = 1.0
    labels = np.arange(40) % 10
    cfg = MultiMNISTConfig(max_digits=0, max_in_common=0, images_per_digit=2,
                           test_set_size=1, bg_path=p, bg_max_intensity=1.0)
    out = generate_dataset(digits, labels.astype(np.int32), cfg)
    scene = np.asarray(out["common"]["images"][0], np.float32).reshape(50, 50)
    np.testing.assert_allclose(scene, bg, atol=1.5e-2)  # uint8 round-trip


# -- freeze_background (abstract1 oracle knob) -------------------------------

def test_freeze_background_pins_param_and_trains_others():
    """With freeze_background the background parameter is bit-frozen at
    its init while every other parameter still updates (the gradient is
    zeroed BEFORE global-norm clipping, so the frozen background also
    does not skew the clip of the live parameters)."""
    cfg = SMALL_BG.replace(freeze_background=True)
    bg_init = np.random.default_rng(3).uniform(
        0.1, 0.9, SMALL.canvas_size ** 2).astype(np.float32)
    state = create_train_state(cfg, rng=0, background_init=bg_init)
    bg_before = np.asarray(state.params["background"]).copy()
    step = make_train_step(cfg)
    images, targets = _batch()
    for _ in range(3):
        state, _ = step(state, images, targets)
    assert np.array_equal(np.asarray(state.params["background"]), bg_before)
    # sanity: the init round-trips (sigmoid(param) == requested pixels)
    np.testing.assert_allclose(
        1.0 / (1.0 + np.exp(-bg_before)), bg_init, atol=1e-5)
    # the live parameters did move
    moved = [k for k in state.params
             if k != "background"
             and not np.array_equal(
                 np.asarray(jax.tree_util.tree_leaves(state.params[k])[0]),
                 np.asarray(jax.tree_util.tree_leaves(
                     create_train_state(cfg, rng=0,
                                        background_init=bg_init)
                     .params[k])[0]))]
    assert moved, "no non-background parameter updated"


def test_freeze_background_requires_learn_background():
    with pytest.raises(ValueError):
        create_train_state(SMALL.replace(freeze_background=True), rng=0)
