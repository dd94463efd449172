"""Device-resident multi-step pipeline: exact equivalence with the
single-step path, epoch bookkeeping, trainer integration."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from air_tpu.train.fast_pipeline import (
    make_multi_step, device_epoch_perm, DeviceDataPipeline)
from air_tpu.train.state import create_train_state
from air_tpu.train.steps import make_train_step
from tests.test_model import SMALL

# whole-trainer / end-to-end tests: the suite's slow lane
pytestmark = pytest.mark.slow


def _data(n=64):
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(n, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, n).astype(np.int32)
    return images, digits


def test_multi_step_equals_single_steps():
    images, digits = _data(64)
    B, K = 8, 4
    perm = device_epoch_perm(64, seed=3, epoch=0)

    state_m = create_train_state(SMALL, rng=0)
    multi = make_multi_step(SMALL, K, B, donate=False)
    new_m, metrics = multi(state_m, jnp.asarray(images), jnp.asarray(digits),
                           perm, jnp.asarray(0, jnp.int32))
    assert metrics["loss"].shape == (K,)

    state_s = create_train_state(SMALL, rng=0)
    single = make_train_step(SMALL, donate=False)
    perm_h = np.asarray(perm)
    losses = []
    for i in range(K):
        idx = perm_h[i * B:(i + 1) * B]
        state_s, m = single(state_s, jnp.asarray(images[idx]),
                            jnp.asarray(digits[idx]))
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses,
                               rtol=2e-4)
    assert int(new_m.step) == int(state_s.step) == K
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        new_m.params, state_s.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_multi_step_start_offset():
    """Starting at batch index s must consume batches s..s+K-1."""
    images, digits = _data(64)
    B, K = 8, 2
    perm = device_epoch_perm(64, seed=1, epoch=0)
    state = create_train_state(SMALL, rng=0)
    multi = make_multi_step(SMALL, K, B, donate=False)
    _, m_at_3 = multi(state, jnp.asarray(images), jnp.asarray(digits), perm,
                      jnp.asarray(3, jnp.int32))
    # same state, same batches via explicit gather
    single = make_train_step(SMALL, donate=False)
    perm_h = np.asarray(perm)
    idx = perm_h[3 * B:4 * B]
    _, m0 = single(create_train_state(SMALL, rng=0),
                   jnp.asarray(images[idx]), jnp.asarray(digits[idx]))
    np.testing.assert_allclose(float(m_at_3["loss"][0]), float(m0["loss"]),
                               rtol=2e-4)


def test_multi_step_pipeline_unroll_parity():
    """Unrolling the K-step pipeline scan (bench lever against the
    batch-independent per-step param/moment HBM round-trip) is
    semantically identity — same final state and per-step losses."""
    images, digits = _data(64)
    B, K = 8, 4
    perm = device_epoch_perm(64, seed=3, epoch=0)
    outs = []
    for unroll in (1, 2, 4):
        state = create_train_state(SMALL, rng=0)
        multi = make_multi_step(SMALL, K, B, donate=False,
                                pipeline_unroll=unroll)
        new, metrics = multi(state, jnp.asarray(images),
                             jnp.asarray(digits), perm,
                             jnp.asarray(0, jnp.int32))
        outs.append((np.asarray(metrics["loss"]), new))
    for loss, new in outs[1:]:
        np.testing.assert_allclose(loss, outs[0][0], rtol=2e-4)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            new.params, outs[0][1].params)
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_trainer_fused_chunks_with_default_logging(tmp_path, monkeypatch):
    """--log-every 1 (the reference per-iteration stdout default) must NOT
    cap device-data chunks at 1 step: per-step lines are read back from
    the [K] metric arrays instead (trainer review r3)."""
    import air_tpu.train.fast_pipeline as fp
    from air_tpu.train.trainer import Trainer, TrainerConfig
    calls = {"multi": 0, "single": 0}
    orig = fp.make_multi_step

    def counting(cfg, K, B, **kw):
        fn = orig(cfg, K, B, **kw)

        def wrapped(*a, **k):
            calls["multi" if K > 1 else "single"] += 1
            return fn(*a, **k)
        return wrapped

    monkeypatch.setattr(fp, "make_multi_step", counting)
    images, digits = _data(64)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "r"), batch_size=8, epochs=None,
        max_iterations=8, num_summaries_every=8, var_summaries_every=10 ** 9,
        img_summaries_every=10 ** 9, grad_summaries_every=0,
        save_params_every=10 ** 9, eval_batch_size=32, seed=0,
        log_every=1, source_snapshot=False, device_data=True, multi_step=4)
    Trainer(SMALL, tcfg, (images, digits), (images[:32], digits[:32])).train()
    assert calls["multi"] == 2 and calls["single"] == 0, calls


def test_device_epoch_perm_deterministic():
    p1 = np.asarray(device_epoch_perm(100, seed=5, epoch=2))
    p2 = np.asarray(device_epoch_perm(100, seed=5, epoch=2))
    p3 = np.asarray(device_epoch_perm(100, seed=5, epoch=3))
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
    np.testing.assert_array_equal(np.sort(p1), np.arange(100))


def test_pipeline_bookkeeping_and_resume():
    images, digits = _data(40)
    p = DeviceDataPipeline(images, digits, batch_size=8, seed=0)
    assert p.batches_per_epoch == 5
    assert p.chunk(3) == 3
    p.advance(3)
    assert p.chunk(10) == 2          # only 2 batches left in epoch
    p.advance(2)
    assert p.chunk(10) == 5          # rolled into next epoch
    assert p.epoch == 1

    state = p.state()
    q = DeviceDataPipeline(images, digits, batch_size=8, seed=0)
    q.restore(state)
    assert q.epoch == 1 and q.index == 0
    np.testing.assert_array_equal(np.asarray(p.perm()), np.asarray(q.perm()))

    # restore() must drop a cached perm computed under a DIFFERENT seed at
    # the same epoch (e.g. checkpoint restore after a stall reseed)
    r = DeviceDataPipeline(images, digits, batch_size=8, seed=7)
    r.epoch = 1
    stale = np.asarray(r.perm())     # seed-7 epoch-1 perm now cached
    r.restore(state)                 # seed 0, epoch 1
    assert not np.array_equal(np.asarray(r.perm()), stale)
    np.testing.assert_array_equal(np.asarray(r.perm()), np.asarray(p.perm()))


def test_trainer_device_data_smoke(tmp_path):
    from air_tpu.train.trainer import Trainer, TrainerConfig
    images, digits = _data(128)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "results"), batch_size=16,
        epochs=None, max_iterations=20, num_summaries_every=10,
        img_summaries_every=20, grad_summaries_every=0,
        save_params_every=10, eval_batch_size=64, seed=0, log_every=5,
        source_snapshot=False, device_data=True, multi_step=5)
    trainer = Trainer(SMALL, tcfg, (images, digits),
                      (images[:64], digits[:64]))
    result = trainer.train()
    assert result["step"] == 20
    # resume continues
    trainer2 = Trainer(SMALL, TrainerConfig(
        results_folder=str(tmp_path / "results"), batch_size=16,
        epochs=None, max_iterations=25, num_summaries_every=1000,
        save_params_every=1000, grad_summaries_every=0, eval_batch_size=64,
        seed=0, log_every=100, source_snapshot=False, device_data=True,
        multi_step=5), (images, digits), (images[:64], digits[:64]))
    assert int(trainer2.state.step) == 20
    r2 = trainer2.train()
    assert r2["step"] == 25


def test_parallel_multi_step_matches_single_device():
    """shard_map DP multi-step over 8 devices == single-device multi-step on
    the same global batches, up to per-shard RNG differences... the RNG is
    decorrelated per shard by design, so compare against an 8-shard
    simulation instead: losses finite, params replicated, and the metric
    arrays have shape [K]."""
    import pytest
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from air_tpu.parallel.mesh import make_mesh, replicated
    from air_tpu.train.fast_pipeline import make_parallel_multi_step

    images, digits = _data(128)
    B, K = 16, 4
    mesh = make_mesh(8)
    perm = device_epoch_perm(128, seed=3, epoch=0)
    state = jax.device_put(create_train_state(SMALL, rng=0), replicated(mesh))
    pms = make_parallel_multi_step(SMALL, K, B, mesh, donate=False)
    new_state, metrics = pms(state, jnp.asarray(images), jnp.asarray(digits),
                             perm, jnp.asarray(0, jnp.int32))
    assert metrics["loss"].shape == (K,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(new_state.step) == K
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    # gradient sync sanity: one DP step from the same state must land in
    # the same ballpark as the single-device step on the same global batch
    sstep = make_train_step(SMALL, donate=False)
    s_state = create_train_state(SMALL, rng=0)
    idx = np.asarray(perm)[:B]
    _, sm = sstep(s_state, jnp.asarray(images[idx]), jnp.asarray(digits[idx]))
    assert abs(float(metrics["loss"][0]) - float(sm["loss"])) \
        / float(sm["loss"]) < 0.15   # RNG-decorrelated shards: close, not equal


def test_parallel_multi_step_batch_divisibility():
    import pytest
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from air_tpu.parallel.mesh import make_mesh
    from air_tpu.train.fast_pipeline import make_parallel_multi_step
    with pytest.raises(ValueError):
        make_parallel_multi_step(SMALL, 2, 12, make_mesh(8))


def test_trainer_device_data_epoch_bound(tmp_path):
    """Device-data loop must stop AT the epoch bound even when chunk()
    rolls into a fresh epoch (ADVICE r1: ran multi_step extra steps)."""
    from air_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_model import SMALL
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(40, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 40).astype(np.int32)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "ep"), batch_size=8, epochs=2,
        num_summaries_every=10 ** 9, img_summaries_every=10 ** 9,
        grad_summaries_every=0, save_params_every=10 ** 9,
        eval_batch_size=8, seed=0, log_every=10 ** 9,
        source_snapshot=False, device_data=True, multi_step=5)
    tr = Trainer(SMALL, tcfg, (images, digits), (images[:8], digits[:8]))
    result = tr.train()
    assert result["step"] == 10  # 2 epochs x 5 batches, not 15


def test_stall_detection_restarts(tmp_path):
    """Auto-recovery: an (artificially) stalled run restarts from a fresh
    re-seeded init up to max_restarts times, then (with the default
    stop_on_exhausted_restarts) gives up early instead of burning the
    remaining iteration budget flat."""
    from air_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_model import SMALL
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(64, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 64).astype(np.int32)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "stall"), batch_size=8, epochs=None,
        max_iterations=6, num_summaries_every=2, img_summaries_every=10 ** 9,
        grad_summaries_every=0, save_params_every=10 ** 9,
        var_summaries_every=10 ** 9, eval_batch_size=16, seed=0,
        log_every=10 ** 9, source_snapshot=False, device_data=True,
        multi_step=2, stall_detect_step=2, stall_accuracy=2.0,
        stall_window=0, max_restarts=2)
    tr = Trainer(SMALL, tcfg, (images, digits), (images[:16], digits[:16]))
    result = tr.train()
    assert result["restarts"] == 2
    # final attempt: always-stalled detector fires again -> early give-up
    # before the iteration cap
    assert result["step"] <= 6

    # legacy behavior is preserved behind the flag: the exhausted attempt
    # trains to the iteration cap
    tcfg2 = dataclasses.replace(
        tcfg, results_folder=str(tmp_path / "stall2"),
        stop_on_exhausted_restarts=False)
    tr2 = Trainer(SMALL, tcfg2, (images, digits), (images[:16], digits[:16]))
    r2 = tr2.train()
    assert r2["restarts"] == 2
    assert r2["step"] == 6   # final attempt ran to the iteration cap


def test_stall_slope_detection(tmp_path):
    """Slope-based detection: a flat sub-threshold run restarts; a climbing
    run through the same absolute level does not (RESULTS.md: stalled
    basins pin dead flat at ~0.63 while slow convergers keep rising)."""
    from air_tpu.train.trainer import Trainer, TrainerConfig
    from tests.test_model import SMALL
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(32, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 32).astype(np.int32)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "slope"), batch_size=8,
        source_snapshot=False, device_data=True,
        stall_detect_step=60000, stall_accuracy=0.95,
        stall_window=20000, stall_min_progress=0.01, max_restarts=3)
    tr = Trainer(SMALL, tcfg, (images, digits), (images[:8], digits[:8]))

    # flat trajectory at 0.63 -> restart fires once history spans the window
    for step, acc in [(40000, 0.630), (50000, 0.632), (60000, 0.633)]:
        fired = tr._maybe_restart_on_stall(step, acc)
    assert fired == "restart"
    assert tr.restarts == 1              # restart budget consumed
    assert not tr._eval_history          # history reset for the new attempt

    # climbing trajectory through the same level -> never restarts
    for step, acc in [(40000, 0.644), (50000, 0.655), (60000, 0.663),
                      (70000, 0.690), (80000, 0.713)]:
        assert tr._maybe_restart_on_stall(step, acc) is None
    assert tr.restarts == 1

    # restarts exhausted + still flat -> early give-up signal
    tr._eval_history = []
    tr.restarts = 3
    for step, acc in [(40000, 0.63), (60000, 0.63)]:
        verdict = tr._maybe_restart_on_stall(step, acc)
    assert verdict == "giveup"


def test_multi_step_compute_dtype_bf16():
    """The fused K-step pipeline composes with mixed precision
    (AIRConfig.compute_dtype): same-seed fused vs single-step training
    stays close (bf16 matmuls reorder summation across the fusion
    boundary, so parity is loose, not exact) and the fused chunk keeps
    fp32 master params."""
    images, digits = _data(64)
    B, K = 8, 4
    cfg = dataclasses.replace(SMALL, compute_dtype="bfloat16")
    perm = device_epoch_perm(64, seed=3, epoch=0)
    state = create_train_state(cfg, rng=0)
    multi = make_multi_step(cfg, K, B, donate=False)
    new, metrics = multi(state, jnp.asarray(images), jnp.asarray(digits),
                         perm, jnp.asarray(0, jnp.int32))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(new.params))

    state_s = create_train_state(cfg, rng=0)
    single = make_train_step(cfg, donate=False)
    perm_h = np.asarray(perm)
    for i in range(K):
        idx = perm_h[i * B:(i + 1) * B]
        state_s, m = single(state_s, jnp.asarray(images[idx]),
                            jnp.asarray(digits[idx]))
    np.testing.assert_allclose(float(metrics["loss"][K - 1]),
                               float(m["loss"]), rtol=5e-2)


def test_multi_step_rnn_input_hoist():
    """The fused K-step pipeline composes with the hoisted gate-input
    projection (AIRConfig.rnn_input_hoist): fused-vs-single parity holds
    under the knob, and the hoisted losses track the baseline losses to
    reassociation tolerance (the scan_unroll numerics class)."""
    images, digits = _data(64)
    B, K = 8, 4
    cfg = dataclasses.replace(SMALL, rnn_input_hoist=True)
    perm = device_epoch_perm(64, seed=3, epoch=0)
    state = create_train_state(cfg, rng=0)
    multi = make_multi_step(cfg, K, B, donate=False)
    new, metrics = multi(state, jnp.asarray(images), jnp.asarray(digits),
                         perm, jnp.asarray(0, jnp.int32))
    assert np.isfinite(np.asarray(metrics["loss"])).all()

    base_state = create_train_state(SMALL, rng=0)
    base_multi = make_multi_step(SMALL, K, B, donate=False)
    _, base_metrics = base_multi(base_state, jnp.asarray(images),
                                 jnp.asarray(digits), perm,
                                 jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(base_metrics["loss"]), rtol=1e-3)
