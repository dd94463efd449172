"""AIR model forward tests: shapes, stop-mask semantics, scan-vs-loop
equivalence, eval-time z_pres rounding, gradient health."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from air_tpu.models.config import AIRConfig, DEFAULT_TRAINING_CONFIG
from air_tpu.models.air import (
    AIRModel, air_forward, init_air_params, _step, RECON_EPS,
)
from air_tpu.nn.lstm import lstm_zero_state


SMALL = AIRConfig(
    max_steps=3, max_digits=2, rnn_units=32, canvas_size=20, windows_size=8,
    vae_latent_dimensions=6, vae_recognition_units=(32, 16),
    vae_generative_units=(16, 32),
    scale_hidden_units=8, shift_hidden_units=8, z_pres_hidden_units=8,
    cnn=False, train=True,
)


@pytest.fixture(scope="module")
def small_setup():
    key = jax.random.PRNGKey(0)
    params = init_air_params(key, SMALL)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (6, SMALL.canvas_size ** 2))
    targets = jnp.array([0, 1, 2, 1, 0, 2], jnp.int32)
    return params, images, targets


def test_output_shapes(small_setup):
    params, images, targets = small_setup
    out = air_forward(params, SMALL, images, targets, jax.random.PRNGKey(2))
    b, t = 6, SMALL.max_steps
    assert out.rec_num_digits.shape == (b,)
    assert out.rec_scales.shape == (b, t, 1)
    assert out.rec_shifts.shape == (b, t, 2)
    assert out.rec_st_back.shape == (b, t, 2, 3)
    assert out.rec_windows.shape == (b, t, SMALL.windows_size ** 2)
    assert out.rec_latents.shape == (b, t, SMALL.vae_latent_dimensions)
    for f in ["z_pres_probs", "z_pres", "z_pres_kls", "scale_kls",
              "shift_kls", "vae_kls"]:
        assert getattr(out, f).shape == (b, t), f
    assert out.reconstruction.shape == (b, SMALL.canvas_size ** 2)
    assert out.loss.shape == ()
    assert out.accuracy.shape == ()
    assert np.isfinite(float(out.loss))
    assert float(out.reconstruction.min()) >= 0.0
    assert float(out.reconstruction.max()) <= 1.0


def test_scan_equals_python_loop(small_setup):
    """lax.scan over _step must equal an unrolled python loop (SURVEY.md §4
    'scan-vs-python-loop equivalence')."""
    params, images, targets = small_setup
    key = jax.random.PRNGKey(3)
    out = air_forward(params, SMALL, images, targets, key, train=True)

    # hand-unrolled loop using the same per-step keys and hp
    hp = SMALL.annealable_defaults()
    b = images.shape[0]
    cs = SMALL.canvas_size
    images_2d = images.reshape(b, cs, cs)
    carry = (
        lstm_zero_state(b, SMALL.rnn_units),
        jnp.zeros((b,)), jnp.zeros((b, cs * cs)), jnp.zeros((b,)),
        jnp.zeros((b,), jnp.int32),
    )
    step_keys = jax.random.split(key, SMALL.max_steps)
    losses, digits = None, None
    for i in range(SMALL.max_steps):
        carry, _ = _step(params, SMALL, hp, images_2d, images, True,
                         carry, step_keys[i])
    _, _, running_recon, running_loss, running_digits = carry
    recon = jnp.clip(running_recon, 0.0, 1.0)
    one_minus = jax.lax.optimization_barrier(1 - recon)
    rec_loss = -jnp.sum(
        images * jnp.log(recon + RECON_EPS)
        + (1 - images) * jnp.log(one_minus + RECON_EPS), 1)
    np.testing.assert_allclose(np.asarray(out.kl_loss),
                               np.asarray(running_loss), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.reconstruction_loss),
                               np.asarray(rec_loss), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.rec_num_digits),
                                  np.asarray(running_digits))


def test_eval_z_pres_rounded(small_setup):
    params, images, targets = small_setup
    out = air_forward(params, SMALL, images, targets, jax.random.PRNGKey(4),
                      train=False)
    vals = np.unique(np.asarray(out.z_pres))
    assert set(vals) <= {0.0, 1.0}
    # digit count consistency: rec_num_digits equals the number of steps the
    # item stayed below threshold after each z_pres update
    z = np.asarray(out.z_pres)
    stopping = np.cumsum(1.0 - z, axis=1)
    want = (stopping < SMALL.stopping_threshold).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(out.rec_num_digits), want)


def test_train_z_pres_continuous(small_setup):
    params, images, targets = small_setup
    out = air_forward(params, SMALL, images, targets, jax.random.PRNGKey(4),
                      train=True)
    z = np.asarray(out.z_pres)
    assert np.any((z > 0.0) & (z < 1.0))


def test_stop_mask_semantics(small_setup):
    """z_pres KL uses the PRE-update stopping_sum; scale/shift/vae KLs use the
    POST-update sum (reference air/air_model.py:398-496). Verify by recomputing
    the masked total from per-step outputs."""
    params, images, targets = small_setup
    out = air_forward(params, SMALL, images, targets, jax.random.PRNGKey(5),
                      train=True)
    z = np.asarray(out.z_pres)
    thr = SMALL.stopping_threshold
    stopping_post = np.cumsum(1.0 - z, axis=1)          # after step t's update
    stopping_pre = stopping_post - (1.0 - z)            # before step t's update
    alive_pre = stopping_pre < thr
    alive_post = stopping_post < thr
    total = (np.asarray(out.z_pres_kls) * alive_pre
             + np.asarray(out.scale_kls) * alive_post
             + np.asarray(out.shift_kls) * alive_post
             + np.asarray(out.vae_kls) * alive_post).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out.kl_loss), total,
                               rtol=1e-4, atol=1e-4)


def test_determinism(small_setup):
    params, images, targets = small_setup
    k = jax.random.PRNGKey(7)
    a = air_forward(params, SMALL, images, targets, k)
    b = air_forward(params, SMALL, images, targets, k)
    np.testing.assert_array_equal(np.asarray(a.loss), np.asarray(b.loss))
    c = air_forward(params, SMALL, images, targets, jax.random.PRNGKey(8))
    assert float(a.loss) != float(c.loss)


def test_gradients_finite_and_nonzero(small_setup):
    params, images, targets = small_setup

    def loss_fn(p):
        return air_forward(p, SMALL, images, targets,
                           jax.random.PRNGKey(9), train=True).loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(int(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero >= len(leaves) - 1  # allow at most one dead leaf


def test_annealed_hparams_enter_loss(small_setup):
    """z_pres prior log-odds annealing must change the loss (it enters the
    Concrete KL prior, reference air/air_model.py:403-407)."""
    params, images, targets = small_setup
    cfg = SMALL.replace(annealing_schedules={
        "z_pres_prior_log_odds": {"init": 10000.0, "min": 1e-9,
                                  "factor": 0.1, "iters": 3000, "log": True}})
    k = jax.random.PRNGKey(10)
    l0 = float(air_forward(params, cfg, images, targets, k, step=0).loss)
    l1 = float(air_forward(params, cfg, images, targets, k, step=50000).loss)
    assert l0 != l1


def test_cnn_path():
    cfg = SMALL.replace(cnn=True, cnn_filters=4)
    key = jax.random.PRNGKey(0)
    params = init_air_params(key, cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (2, cfg.canvas_size ** 2))
    out = air_forward(params, cfg, images, jnp.array([1, 1], jnp.int32),
                      jax.random.PRNGKey(2))
    assert np.isfinite(float(out.loss))


def test_jit_forward(small_setup):
    params, images, targets = small_setup
    fwd = jax.jit(lambda p, im, t, k: air_forward(p, SMALL, im, t, k,
                                                  train=True).loss)
    l1 = float(fwd(params, images, targets, jax.random.PRNGKey(11)))
    l2 = float(air_forward(params, SMALL, images, targets,
                           jax.random.PRNGKey(11), train=True).loss)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_airmodel_facade():
    model = AIRModel(SMALL, rng=0)
    assert model.num_params > 0
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (2, SMALL.canvas_size ** 2))
    out = model(images, jnp.array([1, 1], jnp.int32), jax.random.PRNGKey(2))
    assert out.reconstruction.shape == (2, SMALL.canvas_size ** 2)


def test_default_training_config_matches_reference():
    """Reference training.py:100-123 defaults."""
    c = DEFAULT_TRAINING_CONFIG
    assert (c.max_steps, c.max_digits, c.rnn_units) == (3, 2, 256)
    assert (c.canvas_size, c.windows_size) == (50, 28)
    assert c.vae_recognition_units == (512, 256)
    assert c.vae_generative_units == (256, 512)
    assert c.scale_prior_variance == 0.05
    assert c.learning_rate == 1e-4
    assert c.gradient_clipping_norm == 1.0
    assert not c.cnn
    sched = c.schedules["z_pres_prior_log_odds"]
    assert sched["init"] == 10000.0 and sched["iters"] == 3000


def test_param_count_default_config():
    """~4.0M parameters at the reference default config (SURVEY.md §2a)."""
    model = AIRModel(DEFAULT_TRAINING_CONFIG, rng=0)
    assert 3.8e6 < model.num_params < 4.3e6


def test_pin_raw_pixel_numerics():
    """Driver-level invariant (RESULTS.md round-3 unroll attribution):
    raw-pixel (cnn=False) training pins the reference-exact rolled scan
    + fp32 Adam moments unless explicitly overridden; the CNN robust
    default keeps the fast TPU numerics."""
    from air_tpu.models.config import (DEFAULT_TRAINING_CONFIG,
                                       pin_raw_pixel_numerics)
    raw = DEFAULT_TRAINING_CONFIG.replace(
        cnn=False, **pin_raw_pixel_numerics(False))
    assert raw.scan_unroll == 1
    assert raw.adam_storage_dtype == "float32"
    cnn = DEFAULT_TRAINING_CONFIG.replace(
        cnn=True, **pin_raw_pixel_numerics(True))
    assert cnn.scan_unroll == 3
    assert cnn.adam_storage_dtype == "bfloat16"
    # explicit overrides always win
    assert pin_raw_pixel_numerics(False, "bfloat16", 3) == {
        "adam_storage_dtype": "bfloat16", "scan_unroll": 3}


# -- step-parallel decoder (decoder_layout="stepparallel") --------------------

def test_stepparallel_forward_parity(small_setup):
    """The step-parallel decoder must reproduce the scan decoder exactly:
    per-step RNG keys are split identically so every sampled draw is
    bit-equal; the cumulative stop masks are the same algebra as the
    sequential carry. Forward outputs agree to float tolerance (the
    losses have been observed bit-equal on CPU) for train AND eval."""
    params, images, targets = small_setup
    sp = SMALL.replace(decoder_layout="stepparallel")
    key = jax.random.PRNGKey(7)
    for train in (True, False):
        o1 = air_forward(params, SMALL, images, targets, key, train=train)
        o2 = air_forward(params, sp, images, targets, key, train=train)
        assert np.array_equal(np.asarray(o1.rec_num_digits),
                              np.asarray(o2.rec_num_digits))
        for f in o1._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(o1, f)), np.asarray(getattr(o2, f)),
                rtol=2e-5, atol=2e-5, err_msg=f"{f} (train={train})")


def test_stepparallel_gradient_parity(small_setup):
    """Gradients agree up to scan-transpose-vs-batched reassociation
    (the scan_unroll numerics class): per-tensor relative L2 < 1e-3."""
    params, images, targets = small_setup
    sp = SMALL.replace(decoder_layout="stepparallel")
    key = jax.random.PRNGKey(8)
    g1 = jax.grad(lambda p: air_forward(
        p, SMALL, images, targets, key).loss)(params)
    g2 = jax.grad(lambda p: air_forward(
        p, sp, images, targets, key).loss)(params)

    def rel_l2(path, a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(a) + 1e-12
        assert np.linalg.norm(a - b) / denom < 1e-3, (
            f"{path}: rel L2 {np.linalg.norm(a - b) / denom}")

    jax.tree_util.tree_map_with_path(rel_l2, g1, g2)


def test_stepparallel_rejects_pallas():
    with pytest.raises(ValueError, match="stepparallel"):
        air_forward(
            init_air_params(jax.random.PRNGKey(0), SMALL),
            SMALL.replace(decoder_layout="stepparallel", st_impl="pallas"),
            jnp.zeros((2, SMALL.canvas_size ** 2)),
            jnp.zeros((2,), jnp.int32), jax.random.PRNGKey(1))


def test_stepparallel_parity_cnn_and_background():
    """Same parity at the robust-default shape class: CNN encoder +
    learned background (the init_recon term must enter the canvas sum
    exactly once)."""
    cfg = SMALL.replace(cnn=True, learn_background=True)
    params = init_air_params(jax.random.PRNGKey(4), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(5),
                                (6, SMALL.canvas_size ** 2))
    targets = jnp.array([0, 1, 2, 1, 0, 2], jnp.int32)
    key = jax.random.PRNGKey(6)
    o1 = air_forward(params, cfg, images, targets, key)
    o2 = air_forward(params, cfg.replace(decoder_layout="stepparallel"),
                     images, targets, key)
    np.testing.assert_allclose(float(o1.loss), float(o2.loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o1.reconstruction),
                               np.asarray(o2.reconstruction),
                               rtol=1e-5, atol=1e-6)
    assert np.array_equal(np.asarray(o1.rec_num_digits),
                          np.asarray(o2.rec_num_digits))


# -- hoisted LSTM input projection (rnn_input_hoist) ---------------------------

def test_rnn_input_hoist_parity(small_setup):
    """The hoisted gate-input projection (x@Wx + b outside the scan,
    h@Wh inside — nn/lstm.py lstm_input_proj) is the same algebra as the
    fused concat-dot up to reassociation; forward outputs agree to float
    tolerance for both decoder layouts, train and eval."""
    params, images, targets = small_setup
    key = jax.random.PRNGKey(11)
    for layout in ("scan", "stepparallel"):
        base = SMALL.replace(decoder_layout=layout)
        hoist = base.replace(rnn_input_hoist=True)
        for train in (True, False):
            o1 = air_forward(params, base, images, targets, key, train=train)
            o2 = air_forward(params, hoist, images, targets, key,
                             train=train)
            assert np.array_equal(np.asarray(o1.rec_num_digits),
                                  np.asarray(o2.rec_num_digits)), \
                f"layout={layout} train={train}"
            for f in o1._fields:
                np.testing.assert_allclose(
                    np.asarray(getattr(o1, f)), np.asarray(getattr(o2, f)),
                    rtol=2e-5, atol=2e-5,
                    err_msg=f"{f} (layout={layout}, train={train})")


def test_rnn_input_hoist_parity_cnn():
    """Hoist parity at the robust-default shape class (CNN features feed
    the projection) and gradient agreement in the scan_unroll numerics
    class (per-tensor rel L2 < 1e-3)."""
    cfg = SMALL.replace(cnn=True)
    params = init_air_params(jax.random.PRNGKey(4), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(5),
                                (6, SMALL.canvas_size ** 2))
    targets = jnp.array([0, 1, 2, 1, 0, 2], jnp.int32)
    key = jax.random.PRNGKey(6)
    hoist = cfg.replace(rnn_input_hoist=True)
    o1 = air_forward(params, cfg, images, targets, key)
    o2 = air_forward(params, hoist, images, targets, key)
    np.testing.assert_allclose(float(o1.loss), float(o2.loss), rtol=1e-6)
    assert np.array_equal(np.asarray(o1.rec_num_digits),
                          np.asarray(o2.rec_num_digits))

    g1 = jax.grad(lambda p: air_forward(
        p, cfg, images, targets, key).loss)(params)
    g2 = jax.grad(lambda p: air_forward(
        p, hoist, images, targets, key).loss)(params)

    def rel_l2(path, a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(a) + 1e-12
        assert np.linalg.norm(a - b) / denom < 1e-3, (
            f"{path}: rel L2 {np.linalg.norm(a - b) / denom}")

    jax.tree_util.tree_map_with_path(rel_l2, g1, g2)
