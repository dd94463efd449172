"""Training layer tests: step, checkpoint resume, metrics taxonomy,
visualization, end-to-end convergence smoke."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# whole-trainer / multi-device tests: the suite's slow lane
pytestmark = pytest.mark.slow

from air_tpu.models.config import AIRConfig
from air_tpu.train.state import create_train_state, make_optimizer
from air_tpu.train.steps import make_train_step, make_eval_step
from air_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, latest_checkpoint, sorted_checkpoints)
from air_tpu.train.metrics import (
    MetricsWriter, summarize_by_digit_count, summarize_by_step,
    summarize_outputs, masked_mean)
from air_tpu.train.trainer import Trainer, TrainerConfig
from tests.test_model import SMALL


@pytest.fixture(scope="module")
def tiny_dataset():
    """Seeded mini multi-'MNIST' on a 20x20 canvas: blobs of 0-2 squares."""
    rng = np.random.default_rng(0)
    n = 256
    cs = SMALL.canvas_size
    images = np.zeros((n, cs, cs), np.float32)
    digits = rng.integers(0, 3, n).astype(np.int32)
    for i in range(n):
        for _ in range(digits[i]):
            x, y = rng.integers(1, cs - 7, 2)
            images[i, y:y + 6, x:x + 6] = 1.0
    return images.reshape(n, -1), digits


def test_train_step_updates_and_steps(tiny_dataset):
    images, digits = tiny_dataset
    state = create_train_state(SMALL, rng=0)
    step_fn = make_train_step(SMALL, donate=False)
    new_state, metrics = step_fn(state, jnp.asarray(images[:16]),
                                 jnp.asarray(digits[:16]))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_grad_clipping_applied(tiny_dataset):
    images, digits = tiny_dataset
    cfg = SMALL.replace(gradient_clipping_norm=1e-6)
    state = create_train_state(cfg, rng=0)
    step_fn = make_train_step(cfg, donate=False)
    new_state, _ = step_fn(state, jnp.asarray(images[:8]),
                           jnp.asarray(digits[:8]))
    # with near-zero clip, update magnitude is bounded by adam lr scale
    delta = jax.tree_util.tree_map(lambda a, b: jnp.max(jnp.abs(a - b)),
                                   state.params, new_state.params)
    assert max(float(x) for x in jax.tree_util.tree_leaves(delta)) < 0.1


def test_grad_stats_variant(tiny_dataset):
    images, digits = tiny_dataset
    state = create_train_state(SMALL, rng=0)
    step_fn = make_train_step(SMALL, with_grad_stats=True, donate=False)
    _, metrics = step_fn(state, jnp.asarray(images[:8]),
                         jnp.asarray(digits[:8]))
    gs = metrics["grad_stats"]
    assert any(k.endswith("_grad_original_norm") for k in gs)
    assert any(k.endswith("_grad_applied_norm") for k in gs)
    # applied norm <= original norm (clipping)
    for k in list(gs):
        if k.endswith("_grad_original_norm"):
            base = k[:-len("_grad_original_norm")]
            assert float(gs[base + "_grad_applied_norm"]) <= \
                float(gs[k]) + 1e-6


def test_checkpoint_roundtrip(tmp_path, tiny_dataset):
    images, digits = tiny_dataset
    state = create_train_state(SMALL, rng=0)
    step_fn = make_train_step(SMALL, donate=False)
    for _ in range(3):
        state, _ = step_fn(state, jnp.asarray(images[:8]),
                           jnp.asarray(digits[:8]))
    path = save_checkpoint(str(tmp_path), state,
                           loader_state={"epoch": 1, "index": 24, "seed": 0})
    assert latest_checkpoint(str(tmp_path)) == path

    restored = load_checkpoint(path, SMALL)
    assert int(restored.step) == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, restored.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.opt_state, restored.opt_state)

    # training continues identically from the restored state
    s1, m1 = step_fn(state, jnp.asarray(images[:8]), jnp.asarray(digits[:8]))
    s2, m2 = step_fn(restored, jnp.asarray(images[:8]),
                     jnp.asarray(digits[:8]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_checkpoint_max_to_keep(tmp_path):
    state = create_train_state(SMALL, rng=0)
    for s in range(5):
        save_checkpoint(str(tmp_path), state, step=s, max_to_keep=2)
    kept = sorted_checkpoints(str(tmp_path))
    assert len(kept) == 2
    assert kept[-1].endswith("air-model-4.npz")


def test_masked_mean_and_digit_slices():
    vals = jnp.array([1.0, 2.0, 3.0, 4.0])
    digits = jnp.array([0, 1, 1, 2])
    assert float(masked_mean(vals, digits == 1)) == 2.5
    s = summarize_by_digit_count(vals, digits, "x", max_digits=2)
    assert float(s["x_0_dig"]) == 1.0
    assert float(s["x_1_dig"]) == 2.5
    assert float(s["x_all_dig"]) == 2.5
    # empty slice -> nan, not crash (reference boolean_mask mean of empty)
    s3 = summarize_by_digit_count(vals, digits, "x", max_digits=3)
    assert np.isnan(float(s3["x_3_dig"]))


def test_summarize_by_step_masks():
    tensor = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    steps = jnp.array([1, 3])
    digits = jnp.array([1, 2])
    s = summarize_by_step(tensor, steps, digits, "kl", 3, 2)
    # step 2 (i=1): only item with steps>1 (item 1, value 4.0)
    assert float(s["kl_2_step_all_dig"]) == 4.0
    # one_more_step: steps > i-1 -> step 2 includes item 0 as well
    s2 = summarize_by_step(tensor, steps, digits, "kl", 3, 2,
                           one_more_step=True)
    np.testing.assert_allclose(float(s2["kl_2_step_all_dig"]), 2.5)
    # all_steps ignores masks entirely
    s3 = summarize_by_step(tensor, steps, digits, "p", 3, 2, all_steps=True)
    np.testing.assert_allclose(float(s3["p_1_step_all_dig"]), 1.5)


def test_summarize_outputs_keys(tiny_dataset):
    images, digits = tiny_dataset
    state = create_train_state(SMALL, rng=0)
    eval_fn = make_eval_step(SMALL)
    out = eval_fn(state.params, jnp.asarray(images[:32]),
                  jnp.asarray(digits[:32]), jax.random.PRNGKey(0), 0)
    s = summarize_outputs(out, digits[:32], SMALL.max_steps, SMALL.max_digits)
    for want in ["steps_all_dig", "rec_loss_0_dig", "digit_acc_2_dig",
                 "total_loss_all_dig", "scale_1_step_all_dig",
                 "z_pres_prob_3_step_1_dig", "z_pres_kl_1_step_all_dig",
                 "vae_kl_2_step_0_dig", "loss", "accuracy"]:
        assert want in s, want


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(5, {"loss": jnp.asarray(1.5), "nested": {"a": 2.0}}, prefix="t/")
    w.close()
    import json
    rec = json.loads(open(os.path.join(str(tmp_path),
                                       "metrics.jsonl")).read())
    assert rec["step"] == 5
    assert rec["t/loss"] == 1.5
    assert rec["t/nested/a"] == 2.0


def test_visualization_grid(tiny_dataset):
    from air_tpu.train.visualize import (visualize_reconstructions,
                                         save_grid_png, attention_boxes)
    images, digits = tiny_dataset
    state = create_train_state(SMALL, rng=0)
    eval_fn = make_eval_step(SMALL)
    out = eval_fn(state.params, jnp.asarray(images[:4]),
                  jnp.asarray(digits[:4]), jax.random.PRNGKey(0), 0)
    cs = SMALL.canvas_size
    grid = visualize_reconstructions(images[:4], out.reconstruction,
                                     out.rec_st_back, out.rec_num_digits,
                                     cs, SMALL.windows_size, zoom=2)
    assert grid.shape == (4, 2 * cs, 2 * (2 * cs) + 4, 3)
    assert grid.min() >= 0.0 and grid.max() <= 1.0
    boxes = attention_boxes(out.rec_st_back, SMALL.windows_size, 2 * cs)
    assert set(np.unique(np.asarray(boxes))) <= {0.0, 1.0}


def test_trainer_end_to_end_smoke(tmp_path, tiny_dataset):
    """Short training run: loss decreases, checkpoints + metrics written,
    resume continues from the saved step (SURVEY.md §4 smoke test)."""
    images, digits = tiny_dataset
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "results"), batch_size=32,
        epochs=None, max_iterations=30, num_summaries_every=10,
        img_summaries_every=20, grad_summaries_every=15,
        save_params_every=10, eval_batch_size=64, seed=0, log_every=10,
        source_snapshot=False)
    trainer = Trainer(SMALL, tcfg, (images, digits),
                      (images[:64], digits[:64]))
    result = trainer.train()
    assert result["step"] == 30
    models = sorted_checkpoints(os.path.join(str(tmp_path / "results"),
                                             "models"))
    assert len(models) >= 3
    assert os.path.exists(os.path.join(str(tmp_path / "results"), "summary",
                                       "metrics.jsonl"))
    # image grids written at steps 0 and 20
    assert os.path.exists(os.path.join(str(tmp_path / "results"), "summary",
                                       "reconstruction_0.png"))

    # resume: a new trainer picks up at step 30
    trainer2 = Trainer(SMALL, TrainerConfig(
        results_folder=str(tmp_path / "results"), batch_size=32,
        epochs=None, max_iterations=35, num_summaries_every=1000,
        save_params_every=1000, grad_summaries_every=0,
        eval_batch_size=64, seed=0, log_every=100, source_snapshot=False),
        (images, digits), (images[:64], digits[:64]))
    assert int(trainer2.state.step) == 30
    r2 = trainer2.train()
    assert r2["step"] == 35


def test_loss_decreases_over_training():
    """Convergence smoke (SURVEY.md §4): overfit a centered blob with a
    reachable attention window and annealed z_pres prior; smoothed loss must
    drop. (AIR is noisy and slow at unfavorable configs — the window must be
    able to see the object for reconstruction gradients to exist, which is
    precisely why the reference anneals the z_pres prior and uses
    scale_prior_mean=-1 on big 50x50 canvases.)"""
    cfg = AIRConfig(
        max_steps=1, max_digits=1, rnn_units=32, canvas_size=20,
        windows_size=8, vae_latent_dimensions=6,
        vae_recognition_units=(32, 16), vae_generative_units=(16, 32),
        scale_hidden_units=8, shift_hidden_units=8, z_pres_hidden_units=8,
        cnn=False, train=True,
        scale_prior_mean=2.0, scale_prior_variance=0.01,
        vae_likelihood_std=0.0, learning_rate=3e-3,
        gradient_clipping_norm=100.0,
        annealing_schedules={"z_pres_prior_log_odds": {
            "init": 10000.0, "min": 1e-9, "factor": 0.1, "iters": 100000,
            "log": True}})
    cs = cfg.canvas_size
    img = np.zeros((cs, cs), np.float32)
    img[7:13, 7:13] = 1.0
    images = jnp.asarray(np.tile(img.reshape(1, -1), (32, 1)))
    digits = jnp.ones(32, jnp.int32)
    state = create_train_state(cfg, rng=0)
    step_fn = make_train_step(cfg, donate=False)
    recons = []
    for _ in range(500):
        state, m = step_fn(state, images, digits)
        assert np.isfinite(float(m["loss"]))
        recons.append(float(m["reconstruction_loss"]))
    # the blank-canvas local optimum pays -log(eps) on every lit pixel;
    # a learning model must end meaningfully below it
    blank_level = float(img.sum()) * -np.log(10e-10)
    assert np.mean(recons[-50:]) < 0.85 * blank_level


def test_variable_summaries():
    from air_tpu.train.metrics import variable_summaries
    state = create_train_state(SMALL, rng=0)
    vs = variable_summaries(state.params)
    assert any(k.startswith("lstm/kernel") for k in vs)
    assert any(k.endswith("/norm") for k in vs)
    for k, v in vs.items():
        assert np.isfinite(float(v)), k


def test_trainer_device_data_pipeline_unroll(tmp_path):
    """TrainerConfig.pipeline_unroll reaches the fused pipeline and the
    run matches the rolled path exactly (scan unroll is identity)."""
    import json
    from air_tpu.train.trainer import Trainer, TrainerConfig
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(64, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 64).astype(np.int32)
    accs = []
    for pu in (1, 2):
        tcfg = TrainerConfig(
            results_folder=str(tmp_path / f"pu{pu}"), batch_size=8,
            epochs=None, max_iterations=6, num_summaries_every=6,
            var_summaries_every=10 ** 9, img_summaries_every=10 ** 9,
            grad_summaries_every=0, save_params_every=10 ** 9,
            eval_batch_size=32, seed=0, log_every=6,
            source_snapshot=False, device_data=True, multi_step=3,
            pipeline_unroll=pu)
        tr = Trainer(SMALL, tcfg, (images, digits),
                     (images[:32], digits[:32]))
        tr.train()
        recs = [json.loads(l) for l in
                open(tmp_path / f"pu{pu}" / "summary" / "metrics.jsonl")]
        accs.append([r["test/accuracy"] for r in recs if "test/accuracy" in r])
    assert accs[0] == accs[1]


def test_trainer_device_data_var_and_grad_summaries(tmp_path):
    """Device-data path writes var/ and grad/ records at their cadences."""
    import json
    from air_tpu.train.trainer import Trainer, TrainerConfig
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(64, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 64).astype(np.int32)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "r"), batch_size=8, epochs=None,
        max_iterations=10, num_summaries_every=5, var_summaries_every=5,
        img_summaries_every=100, grad_summaries_every=5,
        save_params_every=100, eval_batch_size=32, seed=0, log_every=5,
        source_snapshot=False, device_data=True, multi_step=5)
    tr = Trainer(SMALL, tcfg, (images, digits), (images[:32], digits[:32]))
    tr.train()
    recs = [json.loads(l) for l in
            open(tmp_path / "r" / "summary" / "metrics.jsonl")]
    assert any(any(k.startswith("var/") for k in r) for r in recs)
    assert any(any(k.startswith("grad/") for k in r) for r in recs)


def test_compiled_cost_analysis():
    """XLA's cost model is exposed for any jitted fn (profiling subsystem)."""
    import jax.numpy as jnp
    from air_tpu.utils.profiling import compiled_cost_analysis

    def f(a, b):
        return jnp.dot(a, b)

    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 256), jnp.float32)
    costs = compiled_cost_analysis(f, a, b)
    # CPU backend reports flops for a plain matmul: 2*M*N*K
    if "flops" in costs:
        assert costs["flops"] >= 2 * 64 * 128 * 256 * 0.5


def test_step_timer_and_profile_trace(tmp_path):
    import time as _time
    from air_tpu.utils.profiling import StepTimer, profile_trace

    t = StepTimer(warmup=1)
    for _ in range(3):
        with t.step(4):
            _time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 2 and s["items_per_sec"] > 0

    with profile_trace(str(tmp_path / "trace")):
        _ = 1 + 1
    import os
    assert os.path.isdir(str(tmp_path / "trace"))


def test_restart_rotation_and_giveup(tmp_path, tiny_dataset):
    """Auto-recovery rotation: each restart attempt overlays the next
    schedule variant onto the base config and rebuilds the train step;
    once the budget is exhausted a still-stalled run gives up early
    instead of burning max_iterations."""
    images, digits = tiny_dataset
    rotation = (
        {"z_pres_temperature": {"init": 3.0, "min": 1.0, "factor": 0.5,
                                "iters": 4, "log": False}},
        {"z_pres_prior_log_odds": {"init": 100.0, "min": 1e-9,
                                   "factor": 0.1, "iters": 3, "log": True}},
    )
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "rot"), batch_size=8,
        epochs=None, max_iterations=1000, num_summaries_every=2,
        img_summaries_every=10 ** 9, grad_summaries_every=0,
        var_summaries_every=10 ** 9, save_params_every=10 ** 9,
        eval_batch_size=16, seed=0, log_every=10 ** 9,
        source_snapshot=False, device_data=True, multi_step=2,
        # stall on every eval past step 2: untrained accuracy < 2.0 always
        stall_detect_step=2, stall_accuracy=2.0, stall_window=0,
        max_restarts=2, restart_schedule_rotation=rotation,
        stop_on_exhausted_restarts=True)
    trainer = Trainer(SMALL, tcfg, (images[:32], digits[:32]),
                      (images[:16], digits[:16]))
    result = trainer.train()
    assert result["restarts"] == 2
    # gave up early: step far below max_iterations
    assert result["step"] <= 10
    # active config carries the LAST rotation variant (index 1), overlaid
    # on the base schedules
    sched = trainer.train_config.schedules
    assert sched["z_pres_prior_log_odds"]["init"] == 100.0
    # base schedules untouched on the eval-side config
    assert trainer.config.schedules.get(
        "z_pres_prior_log_odds", {}).get("init") != 100.0
    # first variant annealed a DIFFERENT hparam and kept the base prior
    # schedule (overlay, not replace)
    assert "z_pres_temperature" in rotation[0]
    # restarts decorrelate the DATA ORDER as well as the params: the
    # loader runs the last attempt's seed, not the base seed
    assert trainer.loader.seed == tcfg.seed + 1009 * 2


def test_is_stalled_predicate():
    from air_tpu.train.trainer import is_stalled, attempt_seed
    hist = [(0, 0.3), (20000, 0.62), (40000, 0.625), (60000, 0.63)]
    # below threshold, flat over the window -> stalled
    assert is_stalled(hist, 60000, 0.63, 60000, 0.95, 20000, 0.01)
    # before the detect step -> not stalled
    assert not is_stalled(hist, 40000, 0.625, 60000, 0.95, 20000, 0.01)
    # above the accuracy bar -> not stalled
    assert not is_stalled(hist, 60000, 0.96, 60000, 0.95, 20000, 0.01)
    # still climbing -> not stalled
    climb = [(0, 0.3), (40000, 0.80), (60000, 0.90)]
    assert not is_stalled(climb, 60000, 0.90, 60000, 0.95, 20000, 0.01)
    # window with no history yet -> not stalled
    assert not is_stalled([(60000, 0.6)], 60000, 0.6, 60000, 0.95,
                          20000, 0.01)
    # window=0 degrades to the absolute threshold
    assert is_stalled([(60000, 0.6)], 60000, 0.6, 60000, 0.95, 0, 0.01)
    # spare_accuracy: a flat-but-high run is in the good basin — never
    # stalled (r3: portrait1 was abandoned at 0.945, seed 3 re-seeded at
    # 0.9+; both were merely slow)
    flat_high = [(0, 0.3), (20000, 0.90), (40000, 0.905), (60000, 0.91)]
    assert is_stalled(flat_high, 60000, 0.91, 60000, 0.95, 20000, 0.01)
    assert not is_stalled(flat_high, 60000, 0.91, 60000, 0.95, 20000, 0.01,
                          spare_accuracy=0.85)
    # ...but a degenerate-basin run (0.6x) is still caught with spare on
    assert is_stalled(hist, 60000, 0.63, 60000, 0.95, 20000, 0.01,
                      spare_accuracy=0.85)
    # spare=0 disables the exemption
    assert is_stalled(flat_high, 60000, 0.91, 60000, 0.95, 20000, 0.01,
                      spare_accuracy=0.0)
    assert attempt_seed(7, 2) == 7 + 2018


def test_device_pipeline_reseed():
    import numpy as np
    from air_tpu.train.fast_pipeline import DeviceDataPipeline
    images = np.random.default_rng(0).uniform(size=(32, 16)).astype("f4")
    digits = np.zeros(32, "i4")
    p = DeviceDataPipeline(images, digits, batch_size=4, seed=3)
    perm_before = np.asarray(p.perm())
    p.advance(2)
    p.epoch = 1
    p.reseed(99)
    assert p.seed == 99 and p.epoch == 0 and p.index == 0
    assert not np.array_equal(np.asarray(p.perm()), perm_before)


def test_train_loader_reseed():
    import numpy as np
    from air_tpu.data.loader import TrainLoader
    images = np.random.default_rng(0).uniform(size=(40, 16)).astype("f4")
    digits = np.zeros(40, "i4")
    loader = TrainLoader((images, digits), batch_size=8, epochs=1, seed=3,
                         prefetch=0)
    perm_before = loader._perm(0)
    loader.epoch, loader.index = 0, 16
    loader.reseed(99)
    assert loader.seed == 99 and loader.index == 0
    if loader._native is not None:
        assert loader._native.seed == 99
    assert not np.array_equal(loader._perm(0), perm_before)


def test_eval_summary_step_matches_host_path():
    """The fused on-device eval+summarize program must reproduce the
    host-side summarize_outputs numbers exactly (same key)."""
    import jax
    import jax.numpy as jnp
    from air_tpu.models.config import AIRConfig
    from air_tpu.models.air import init_air_params
    from air_tpu.train.steps import make_eval_step, make_eval_summary_step
    from air_tpu.train.metrics import summarize_outputs

    cfg = AIRConfig(max_steps=3, max_digits=2, rnn_units=32, canvas_size=20,
                    windows_size=8, vae_latent_dimensions=6,
                    vae_recognition_units=(32, 16),
                    vae_generative_units=(16, 32), scale_hidden_units=8,
                    shift_hidden_units=8, z_pres_hidden_units=8, cnn=False)
    params = init_air_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (10, 400))
    digits = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1, 2, 1], jnp.int32)
    key = jax.random.PRNGKey(5)
    step = jnp.zeros((), jnp.int32)

    out = make_eval_step(cfg)(params, images, digits, key, step)
    host = {k: float(v) for k, v in summarize_outputs(
        out, digits, cfg.max_steps, cfg.max_digits).items()}
    dev = {k: float(v) for k, v in jax.device_get(
        make_eval_summary_step(cfg)(params, images, digits, key,
                                    step)).items()}
    assert set(host) == set(dev)
    for k in host:
        if np.isnan(host[k]):
            assert np.isnan(dev[k]), k
        else:
            assert np.isclose(host[k], dev[k], rtol=1e-5, atol=1e-6), \
                (k, host[k], dev[k])


def test_checkpoint_atomic_writes_and_sidecar_path(tmp_path):
    """save_checkpoint must leave no .tmp residue, must compute the .json
    sidecar with splitext (a '.npz' substring in the DIRECTORY name must
    not be rewritten), and a kill between sidecar and npz must never
    expose an npz without its sidecar (sidecar lands first)."""
    d = tmp_path / "runs.npz.backup"
    d.mkdir()
    state = create_train_state(SMALL, rng=0)
    path = save_checkpoint(str(d), state, step=0,
                           loader_state={"epoch": 2, "index": 8, "seed": 7})
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
    sidecar = os.path.splitext(path)[0] + ".json"
    assert os.path.exists(sidecar)

    class Rec:
        def restore(self, st):
            self.st = st
    loader = Rec()
    load_checkpoint(path, SMALL, loader=loader)
    assert loader.st == {"epoch": 2, "index": 8, "seed": 7}


def test_checkpoint_preserves_key_representation(tmp_path):
    """The PRNG key must round-trip in the representation it was saved
    from: raw uint32 stays raw (fresh-state aval parity, no recompiles),
    a typed key array comes back typed."""
    state = create_train_state(SMALL, rng=0)
    p1 = save_checkpoint(str(tmp_path / "raw"), state, step=0)
    r1 = load_checkpoint(p1, SMALL)
    assert r1.key.dtype == state.key.dtype
    assert r1.key.shape == state.key.shape
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(r1.key)),
                                  np.asarray(jax.random.key_data(state.key)))

    typed = state.replace(key=jax.random.wrap_key_data(state.key))
    p2 = save_checkpoint(str(tmp_path / "typed"), typed, step=0)
    r2 = load_checkpoint(p2, SMALL)
    assert jnp.issubdtype(r2.key.dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(r2.key)),
                                  np.asarray(jax.random.key_data(typed.key)))


def test_is_stalled_slope_spares_noisy_climb():
    """Gradual-progress regimes (the r3 bg-1.0 misfire): a climb of
    0.02/window with single-eval noise can read as flat at the point
    estimate (acc vs one eval >= window ago); the regression slope over
    ALL window evals must spare it. A noise-free flat run at the same
    density is still caught."""
    from air_tpu.train.trainer import is_stalled
    window, cadence, step = 20000, 2500, 60000
    slope = 1e-6                           # 0.02 per 20k-step window
    hist = [(s, 0.40 + slope * s) for s in range(0, step + 1, cadence)]
    # noise: the anchor eval (step-window) reads high, the current low —
    # the point estimate collapses to 0.008 < min_progress
    hist = [(s, a + (0.006 if s == step - window else 0.0)) for s, a in hist]
    s_last, a_last = hist[-1]
    hist[-1] = (s_last, a_last - 0.006)
    acc = hist[-1][1]
    anchor = [a for s, a in hist if s <= step - window][-1]
    assert acc - anchor < 0.01             # the point estimate DOES fail
    assert not is_stalled(hist, step, acc, 30000, 0.95, window, 0.01)
    # same eval density, genuinely flat -> still stalled
    flat = [(s, 0.63) for s in range(0, step + 1, cadence)]
    assert is_stalled(flat, step, 0.63, 30000, 0.95, window, 0.01)


def test_attempt_seed_stride():
    from air_tpu.train.trainer import attempt_seed
    assert attempt_seed(7, 2, stride=13) == 33
    assert attempt_seed(7, 0, stride=13) == 7       # base attempt
    with pytest.raises(ValueError):
        attempt_seed(7, 1, stride=0)
    with pytest.raises(ValueError):
        TrainerConfig(attempt_seed_stride=0)


def test_resume_mid_rescue(tmp_path, tiny_dataset):
    """A process killed mid-rescue must resume the SAME attempt: restart
    budget, rotated schedule variant, eval history, and the attempt's
    data-order seed all restored from the checkpoint sidecar."""
    from air_tpu.train.trainer import attempt_seed
    images, digits = tiny_dataset
    rotation = (
        {"z_pres_temperature": {"init": 3.0, "min": 1.0, "factor": 0.5,
                                "iters": 4, "log": False}},
        {"z_pres_prior_log_odds": {"init": 100.0, "min": 1e-9,
                                   "factor": 0.1, "iters": 3, "log": True}},
    )
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "rescue"), batch_size=8,
        epochs=None, max_iterations=1000, num_summaries_every=2,
        img_summaries_every=10 ** 9, grad_summaries_every=0,
        var_summaries_every=10 ** 9, save_params_every=10 ** 9,
        eval_batch_size=16, seed=0, log_every=10 ** 9,
        source_snapshot=False, device_data=True, multi_step=2,
        stall_detect_step=2, stall_accuracy=0.5, stall_window=0,
        max_restarts=3, restart_schedule_rotation=rotation)
    trainer = Trainer(SMALL, tcfg, (images[:32], digits[:32]),
                      (images[:16], digits[:16]))
    # stalled eval -> restart consumes budget, rotates variant 0, reseeds
    assert trainer._maybe_restart_on_stall(4, 0.1) == "restart"
    assert trainer.restarts == 1 and trainer._variant == 0
    # a healthy eval on the rescue attempt lands in its history
    assert trainer._maybe_restart_on_stall(6, 0.9) is None
    save_checkpoint(trainer.models_dir, trainer.state, 6,
                    loader_state=trainer.loader.state(),
                    recovery=trainer.recovery_meta())

    # "crash": a fresh Trainer on the same results folder resumes it all
    t2 = Trainer(SMALL, tcfg, (images[:32], digits[:32]),
                 (images[:16], digits[:16]))
    assert t2.restarts == 1
    assert t2._variant == 0
    assert t2._eval_history == [(6, 0.9)]
    assert t2.train_config.schedules["z_pres_temperature"]["init"] == 3.0
    # base schedules untouched (evaluation comparability)
    assert "z_pres_temperature" not in t2.config.schedules
    # the rescue attempt's data-order seed survives via loader_state
    assert t2.loader.seed == attempt_seed(tcfg.seed, 1,
                                          tcfg.attempt_seed_stride)
    # a second stall on resume consumes restart #2 (not a fresh budget)
    assert t2._maybe_restart_on_stall(8, 0.1) == "restart"
    assert t2.restarts == 2 and t2._variant == 1
