"""bf16 optimizer-state storage (state.scale_by_adam_stored) and the
attention-scan unroll knob — the round-3 levers against the b64 fused
step's batch-independent weight/optimizer HBM traffic (RESULTS.md
batch-scaling analysis; VERDICT r2 #3)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from air_tpu.models.config import AIRConfig
from air_tpu.models.air import air_forward, init_air_params
from air_tpu.train.state import (
    create_train_state, make_optimizer, scale_by_adam_stored)
from air_tpu.train.steps import make_train_step

# whole-trainer / end-to-end tests: the suite's slow lane
pytestmark = pytest.mark.slow

SMALL = AIRConfig(
    max_steps=3, max_digits=2, rnn_units=32, canvas_size=20, windows_size=8,
    vae_latent_dimensions=6, vae_recognition_units=(32, 16),
    vae_generative_units=(16, 32),
    scale_hidden_units=8, shift_hidden_units=8, z_pres_hidden_units=8,
    cnn=False, train=True,
)


def _batch(n=6):
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (n, SMALL.canvas_size ** 2))
    targets = jnp.array([0, 1, 2, 1, 0, 2], jnp.int32)[:n]
    return images, targets


# -- scale_by_adam_stored ----------------------------------------------------

def test_adam_stored_fp32_matches_optax_adam():
    """With fp32 storage the custom transform must reproduce optax.adam
    exactly (same math, no demotion)."""
    params = {"w": jnp.linspace(-1, 1, 32).reshape(4, 8),
              "b": jnp.ones((8,))}
    ref = optax.adam(1e-2)
    got = optax.chain(scale_by_adam_stored(storage_dtype=jnp.float32),
                      optax.scale_by_learning_rate(1e-2))
    s_ref, s_got = ref.init(params), got.init(params)
    key = jax.random.PRNGKey(0)
    p_ref = p_got = params
    for i in range(5):
        key, k = jax.random.split(key)
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(k, p.shape) * 0.1, params)
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_got, s_got = got.update(g, s_got, p_got)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_got = optax.apply_updates(p_got, u_got)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_adam_stored_bf16_tracks_fp32():
    """bf16 moment storage perturbs the trajectory only at the bf16
    resolution (~0.4% relative) — parameters stay close over 20 steps."""
    params = {"w": jnp.linspace(-1, 1, 64).reshape(8, 8)}
    ref = optax.chain(scale_by_adam_stored(storage_dtype=jnp.float32),
                      optax.scale_by_learning_rate(1e-2))
    got = optax.chain(scale_by_adam_stored(storage_dtype=jnp.bfloat16),
                      optax.scale_by_learning_rate(1e-2))
    s_ref, s_got = ref.init(params), got.init(params)
    # moments must actually be STORED in bf16
    assert s_got[0].mu["w"].dtype == jnp.bfloat16
    assert s_got[0].nu["w"].dtype == jnp.bfloat16
    key = jax.random.PRNGKey(3)
    p_ref = p_got = params
    for i in range(20):
        key, k = jax.random.split(key)
        g = {"w": jax.random.normal(k, (8, 8)) * 0.1}
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_got, s_got = got.update(g, s_got, p_got)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_got = optax.apply_updates(p_got, u_got)
    drift = float(jnp.max(jnp.abs(p_ref["w"] - p_got["w"])))
    scale = float(jnp.max(jnp.abs(p_ref["w"] - params["w"])))  # total motion
    assert drift < 0.05 * scale


def test_make_optimizer_selects_storage_dtype():
    cfg = SMALL.replace(adam_storage_dtype="bfloat16")
    opt = make_optimizer(cfg)
    params = init_air_params(jax.random.PRNGKey(0), cfg)
    state = opt.init(params)
    mus = [s for s in jax.tree_util.tree_leaves(state)
           if hasattr(s, "dtype") and s.dtype == jnp.bfloat16]
    assert mus, "bf16 moment leaves expected in opt state"


def test_bf16_train_step_runs_and_decreases_loss():
    cfg = SMALL.replace(adam_storage_dtype="bfloat16")
    step = make_train_step(cfg, donate=False)
    state = create_train_state(cfg, rng=0)
    images, targets = _batch()
    losses = []
    for _ in range(30):
        state, m = step(state, images, targets)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_bf16_checkpoint_roundtrip(tmp_path):
    from air_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    cfg = SMALL.replace(adam_storage_dtype="bfloat16")
    step = make_train_step(cfg, donate=False)
    state = create_train_state(cfg, rng=0)
    images, targets = _batch()
    state, _ = step(state, images, targets)     # non-trivial moments
    path = save_checkpoint(str(tmp_path), state, 1)
    restored = load_checkpoint(path, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))
    # exact resume: one more step from both must agree bitwise
    s1, m1 = step(state, images, targets)
    s2, m2 = step(restored, images, targets)
    assert float(m1["loss"]) == float(m2["loss"])


# -- scan unroll -------------------------------------------------------------

def test_scan_unroll_is_equivalent():
    cfg_u = SMALL.replace(scan_unroll=3)
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    images, targets = _batch()
    out1 = air_forward(params, SMALL, images, targets, jax.random.PRNGKey(2))
    out2 = air_forward(params, cfg_u, images, targets, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out1.loss), np.asarray(out2.loss),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out1.rec_num_digits),
                               np.asarray(out2.rec_num_digits))


# -- compute_dtype (mixed-precision forward, round-4) ------------------------

def test_compute_dtype_bf16_close_to_fp32():
    """bf16 CNN/LSTM/heads/VAE with fp32 sampling/KL/ST/canvas: the loss
    must stay close to the fp32 forward (same params, same keys) and the
    gradients must come back fp32, finite, and nonzero (the cast lives
    inside the forward; master params stay fp32)."""
    images, targets = _batch()
    key = jax.random.PRNGKey(3)
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    cfg16 = SMALL.replace(compute_dtype="bfloat16")

    out32 = air_forward(params, SMALL, images, targets, key, train=True)
    out16 = air_forward(params, cfg16, images, targets, key, train=True)
    np.testing.assert_allclose(float(out16.loss), float(out32.loss),
                               rtol=2e-2)
    assert out16.reconstruction.dtype == jnp.float32

    g = jax.grad(lambda p: air_forward(p, cfg16, images, targets, key,
                                       train=True).loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_compute_dtype_bf16_train_step_decreases_loss():
    cfg = SMALL.replace(compute_dtype="bfloat16", cnn=True)
    step = make_train_step(cfg, donate=False)
    state = create_train_state(cfg, rng=0)
    images, targets = _batch()
    losses = []
    for _ in range(30):
        state, m = step(state, images, targets)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_compute_dtype_validated():
    with pytest.raises(ValueError):
        SMALL.replace(compute_dtype="float16")


def test_compute_dtype_cast_is_inside_scan():
    """The mixed-precision param casts must live INSIDE the attention scan
    body, so the scan transpose sums the per-step parameter cotangents in
    fp32. A cast hoisted outside the scan turns the scan's closed-over
    params bf16 and the cross-step gradient accumulation with them (the
    round-4 review finding behind the 7/10 bf16c convergence regression).
    Locked by checking no bf16 leaf appears among the scan's consts — the
    bf16 LSTM carry (init state) and the int step keys are exempt."""
    cfg16 = SMALL.replace(compute_dtype="bfloat16")
    params = init_air_params(jax.random.PRNGKey(0), SMALL)
    images, targets = _batch()
    jaxpr = jax.make_jaxpr(
        lambda p: air_forward(p, cfg16, images, targets,
                              jax.random.PRNGKey(3), train=True).loss
    )(params)
    scans = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "scan"]
    assert scans, "attention scan not found in the forward jaxpr"
    for eqn in scans:
        consts = eqn.invars[:eqn.params["num_consts"]]
        bad = [v for v in consts
               if getattr(v.aval, "dtype", None) == jnp.bfloat16]
        assert not bad, (
            f"bf16 closed-over scan consts (hoisted cast?): "
            f"{[v.aval for v in bad]}")


def test_vae_sampling_is_fp32_under_bf16_params():
    """nn/vae.py promises fp32 sampling math: with bf16 params and inputs,
    the returned recon/moments/latent must come back fp32 (the latent
    sample and likelihood noise are drawn and combined in fp32)."""
    from air_tpu.nn.vae import vae_init, vae_apply
    p = vae_init(jax.random.PRNGKey(0), 16, (8,), 4, (8,))
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    x16 = jnp.ones((3, 16), jnp.bfloat16)
    outs = vae_apply(p16, jax.random.PRNGKey(1), x16, 0.3)
    assert all(o.dtype == jnp.float32 for o in outs)
