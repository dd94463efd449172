"""Seed-parallel (vmap) training: replica semantics must match the
single-seed fused pipeline exactly — same init, same data order, same
per-step keys."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from air_tpu.models.config import AIRConfig
from air_tpu.train.state import create_train_state
from air_tpu.train.fast_pipeline import make_multi_step, device_epoch_perm
from air_tpu.train.multi_seed import (
    create_multi_seed_state, make_multi_seed_step, multi_seed_perms,
    reinit_replica, evaluate_replicas)

# whole-trainer / end-to-end tests: the suite's slow lane
pytestmark = pytest.mark.slow

SMALL = AIRConfig(
    max_steps=3, max_digits=2, rnn_units=32, canvas_size=20, windows_size=8,
    vae_latent_dimensions=6, vae_recognition_units=(32, 16),
    vae_generative_units=(16, 32),
    scale_hidden_units=8, shift_hidden_units=8, z_pres_hidden_units=8,
    cnn=False, train=True,
)
N, B, K = 24, 4, 3
SEEDS = (3, 7)


def _data():
    images = jax.random.uniform(jax.random.PRNGKey(11),
                                (N, SMALL.canvas_size ** 2))
    digits = jnp.asarray(np.arange(N) % 3, jnp.int32)
    return images, digits


def test_replica_matches_single_seed():
    images, digits = _data()
    multi = make_multi_seed_step(SMALL, K, B, donate=False)
    state_S = create_multi_seed_state(SMALL, SEEDS)
    perms = multi_seed_perms(N, SEEDS, 0)
    state_S, metrics = multi(state_S, images, digits, perms,
                             jnp.asarray(0, jnp.int32))
    assert metrics["loss"].shape == (K, len(SEEDS))

    single = make_multi_step(SMALL, K, B, donate=False)
    for r, seed in enumerate(SEEDS):
        st = create_train_state(SMALL, rng=seed)
        st, m = single(st, images, digits, device_epoch_perm(N, seed, 0),
                       jnp.asarray(0, jnp.int32))
        np.testing.assert_allclose(np.asarray(metrics["loss"])[:, r],
                                   np.asarray(m["loss"]), rtol=2e-5)
        l_multi = jax.tree_util.tree_leaves(state_S.params)
        l_single = jax.tree_util.tree_leaves(st.params)
        for a, b in zip(l_multi, l_single):
            np.testing.assert_allclose(np.asarray(a)[r], np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_replicas_differ_from_each_other():
    images, digits = _data()
    multi = make_multi_seed_step(SMALL, K, B, donate=False)
    state_S = create_multi_seed_state(SMALL, SEEDS)
    perms = multi_seed_perms(N, SEEDS, 0)
    state_S, metrics = multi(state_S, images, digits, perms,
                             jnp.asarray(0, jnp.int32))
    losses = np.asarray(metrics["loss"])
    assert not np.allclose(losses[:, 0], losses[:, 1])


def test_reinit_replica_only_touches_target():
    state_S = create_multi_seed_state(SMALL, SEEDS)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state_S)
    state_S2 = reinit_replica(state_S, SMALL, 1, seed=99)
    fresh = create_train_state(SMALL, rng=99)
    for a, b, f in zip(jax.tree_util.tree_leaves(state_S2.params),
                       jax.tree_util.tree_leaves(before.params),
                       jax.tree_util.tree_leaves(fresh.params)):
        np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(b)[0])
        np.testing.assert_array_equal(np.asarray(a)[1], np.asarray(f))


def test_evaluate_replicas_shapes_and_match():
    images, digits = _data()
    state_S = create_multi_seed_state(SMALL, SEEDS)
    acc, loss = evaluate_replicas(SMALL, state_S, np.asarray(images),
                                  np.asarray(digits),
                                  jax.random.PRNGKey(0), 0, batch_size=12)
    assert acc.shape == (len(SEEDS),) and loss.shape == (len(SEEDS),)
    assert np.all(np.isfinite(loss))


def test_knob_schedules_match_dict_variants():
    """The traced-knob encoding of the restart rotation must resolve to
    EXACTLY the same annealed hyperparameters as the sequential Trainer's
    dict-based overlays (trainer.DEFAULT_RESTART_ROTATION), at every
    step."""
    from air_tpu.ops.schedules import resolve_annealed
    from air_tpu.train.multi_seed import (
        rotation_knobs, vmap_rotation_variant, schedules_from_knobs)
    from air_tpu.train.trainer import DEFAULT_RESTART_ROTATION
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG

    base_hold = 15000
    base_sched = DEFAULT_TRAINING_CONFIG.schedules
    base_sched["z_pres_prior_log_odds"]["hold"] = base_hold
    defaults = DEFAULT_TRAINING_CONFIG.annealable_defaults()
    steps = [0, 1, 4999, 15000, 17500, 40000, 120000]

    cases = [(rotation_knobs(base_hold), {}),                  # base attempt
             (rotation_knobs(base_hold, scale_curriculum=True),
              {"scale_prior_mean": {"init": 1.0, "min": 0.0, "factor": 0.5,
                                    "iters": 5000, "offset": -1.0,
                                    "hold": base_hold}})]      # base+scalecur
    for n in range(1, 6):
        cases.append((vmap_rotation_variant(n, base_hold),
                      DEFAULT_RESTART_ROTATION[n - 1]))

    for knobs, overlay in cases:
        dict_sched = {k: dict(v) for k, v in base_sched.items()}
        dict_sched.update(overlay)
        knob_sched = schedules_from_knobs(
            base_sched, {k: jnp.asarray(v, jnp.float32)
                         for k, v in knobs.items()})
        for s in steps:
            want = resolve_annealed(dict_sched, defaults, s)
            got = resolve_annealed(knob_sched, defaults, s)
            assert set(got) == set(want)
            for name in want:
                np.testing.assert_allclose(
                    np.float32(got[name]), np.float32(want[name]),
                    rtol=1e-6, err_msg=f"{name} @ step {s} knobs={knobs}")


def test_rotated_replica_matches_single_seed_variant():
    """A replica running rotation variant 0 (the reference schedule)
    through the knob path must track the single-seed pipeline with the
    overlaid dict schedule; a sibling on base knobs must track the plain
    base run — one compiled program, two genuinely different schedules."""
    from air_tpu.train.multi_seed import (
        make_multi_seed_step, rotation_knobs, vmap_rotation_variant,
        stack_knobs)
    images, digits = _data()
    base_hold = 8     # small, so the variants differ within a few steps
    sched = SMALL.schedules
    sched["z_pres_prior_log_odds"] = {"init": 1e4, "min": 1e-9,
                                      "factor": 0.1, "iters": 3,
                                      "log": True, "hold": base_hold}
    cfg = SMALL.replace(annealing_schedules=sched)

    multi = make_multi_seed_step(cfg, K, B, donate=False,
                                 knob_schedules=True)
    state_S = create_multi_seed_state(cfg, SEEDS)
    perms = multi_seed_perms(N, SEEDS, 0)
    knobs_S = stack_knobs([rotation_knobs(base_hold),       # replica 0: base
                           vmap_rotation_variant(1, base_hold)])  # 1: ref
    state_S, metrics = multi(state_S, images, digits, perms,
                             jnp.asarray(0, jnp.int32), knobs_S)

    single = make_multi_step(cfg, K, B, donate=False)
    st0 = create_train_state(cfg, rng=SEEDS[0])
    st0, m0 = single(st0, images, digits, device_epoch_perm(N, SEEDS[0], 0),
                     jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(metrics["loss"])[:, 0],
                               np.asarray(m0["loss"]), rtol=2e-5)

    ref_sched = {k: dict(v) for k, v in sched.items()}
    ref_sched["z_pres_prior_log_odds"] = {"init": 1e4, "min": 1e-9,
                                          "factor": 0.1, "iters": 3,
                                          "log": True}
    cfg_ref = SMALL.replace(annealing_schedules=ref_sched)
    single_ref = make_multi_step(cfg_ref, K, B, donate=False)
    st1 = create_train_state(cfg_ref, rng=SEEDS[1])
    st1, m1 = single_ref(st1, images, digits,
                         device_epoch_perm(N, SEEDS[1], 0),
                         jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(metrics["loss"])[:, 1],
                               np.asarray(m1["loss"]), rtol=2e-5)
    # the two schedules REALLY differ inside the hold window
    assert not np.allclose(np.asarray(m0["z_pres_prior_log_odds"]),
                           np.asarray(m1["z_pres_prior_log_odds"]))


def test_evaluate_replicas_small_test_set_and_tail():
    """Chunks larger than the test set and non-divisible tails must not
    crash or drop examples (code-review round-2 fix)."""
    images, digits = _data()
    state_S = create_multi_seed_state(SMALL, SEEDS)
    acc_big, _ = evaluate_replicas(SMALL, state_S, np.asarray(images),
                                   np.asarray(digits),
                                   jax.random.PRNGKey(0), 0, batch_size=500)
    acc_tail, _ = evaluate_replicas(SMALL, state_S, np.asarray(images),
                                    np.asarray(digits),
                                    jax.random.PRNGKey(0), 0, batch_size=10)
    assert acc_big.shape == (len(SEEDS),)
    # same examples either way (eval noise is drawn per batch POSITION, so
    # exact equality is not expected across chunkings — only sanity)
    assert np.all(np.isfinite(acc_tail)) and np.all(acc_tail <= 1.0)


def test_evaluate_replicas_per_replica_clock_and_knobs():
    """Each replica's annealed hyperparameters must resolve at its OWN
    step clock and knob variant (VERDICT r3 weak #5): a replica whose
    clock sits mid-anneal gets the same loss as a single-model eval at
    that step, not at the shared wall clock."""
    from air_tpu.ops.schedules import resolve_annealed
    from air_tpu.models.air import air_forward
    from air_tpu.train.multi_seed import (
        rotation_knobs, stack_knobs, make_multi_seed_eval)

    cfg = SMALL.replace(annealing_schedules={
        "z_pres_prior_log_odds": {"init": 1000.0, "min": 1e-9,
                                  "factor": 0.1, "iters": 10, "log": True}})
    images, digits = _data()
    state_S = create_multi_seed_state(cfg, SEEDS)
    # replica clocks diverge (e.g. one restarted): [0, 25]
    state_S = state_S.replace(step=jnp.asarray([0, 25], jnp.int32))
    key = jax.random.PRNGKey(0)

    acc, loss = evaluate_replicas(cfg, state_S, np.asarray(images),
                                  np.asarray(digits), key, batch_size=500)

    # oracle: single-model eval with hparams resolved at each OWN clock
    def one(params, step):
        hp = resolve_annealed(cfg.schedules, cfg.annealable_defaults(),
                              jnp.asarray(step, jnp.int32))
        out = air_forward(params, cfg, jnp.asarray(images),
                          jnp.asarray(digits), key, train=False, hparams=hp)
        return float(out.accuracy), float(jnp.mean(out.per_example_loss))

    for r, own_step in enumerate((0, 25)):
        params_r = jax.tree_util.tree_map(lambda x: x[r], state_S.params)
        acc_r, loss_r = one(params_r, own_step)
        np.testing.assert_allclose(loss[r], loss_r, rtol=1e-5)
        np.testing.assert_allclose(acc[r], acc_r, rtol=1e-6)
    # and the clocks genuinely matter: the mid-anneal replica's loss
    # differs from what the shared step-0 clock would report
    _, loss_shared = evaluate_replicas(cfg, state_S, np.asarray(images),
                                       np.asarray(digits), key, step=0,
                                       batch_size=500)
    assert abs(loss[1] - loss_shared[1]) > 1e-6

    # knob variants: replica 1 on a long-hold variant — its prior
    # log-odds at step 25 is still at init (hold 50 > 25) instead of
    # fully annealed, so the z_pres KL (and loss) differs; accuracy is
    # knob-invariant (eval rounds z_pres)
    knobs_S = stack_knobs([rotation_knobs(0.0),
                           rotation_knobs(50.0)])
    eval_k = make_multi_seed_eval(cfg, knob_schedules=True)
    acc_k, loss_k = evaluate_replicas(cfg, state_S, np.asarray(images),
                                      np.asarray(digits), key,
                                      batch_size=500, eval_fn=eval_k,
                                      knobs_S=knobs_S)
    np.testing.assert_allclose(acc_k, acc, rtol=1e-6)
    assert abs(loss_k[1] - loss[1]) > 1e-6


def test_multi_seed_step_compute_dtype_bf16():
    """Seed-parallel vmap composes with mixed precision (the cast lives
    inside air_forward, under the replica vmap): finite losses, fp32
    master params per replica."""
    import dataclasses
    cfg = dataclasses.replace(SMALL, compute_dtype="bfloat16")
    images, digits = _data()
    multi = make_multi_seed_step(cfg, K, B, donate=False)
    state_S = create_multi_seed_state(cfg, SEEDS)
    perms = multi_seed_perms(N, SEEDS, 0)
    state_S, metrics = multi(state_S, images, digits, perms,
                             jnp.asarray(0, jnp.int32))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state_S.params))


def test_multi_seed_step_pipeline_unroll_parity():
    """pipeline_unroll changes fusion scope, not semantics: a pu=2 sweep
    step must match pu=1 to float tolerance (same batches, same keys)."""
    images, digits = _data()
    state1 = create_multi_seed_state(SMALL, SEEDS)
    state2 = create_multi_seed_state(SMALL, SEEDS)
    perms = multi_seed_perms(N, SEEDS, 0)
    m1 = make_multi_seed_step(SMALL, 4, B, donate=False)
    m2 = make_multi_seed_step(SMALL, 4, B, donate=False, pipeline_unroll=2)
    state1, met1 = m1(state1, images, digits, perms,
                      jnp.asarray(0, jnp.int32))
    state2, met2 = m2(state2, images, digits, perms,
                      jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(met1["loss"]),
                               np.asarray(met2["loss"]), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-4, atol=1e-5),
        state1.params, state2.params)
