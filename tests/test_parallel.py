"""Multi-device (8 virtual CPU) data-parallel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from air_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from air_tpu.parallel.train_parallel import (
    make_parallel_train_step, make_parallel_eval_step, shard_batch)
from air_tpu.train.state import create_train_state
from air_tpu.train.steps import make_train_step
from tests.test_model import SMALL


pytestmark = [
    pytest.mark.skipif(jax.device_count() < 8,
                       reason="needs 8 virtual devices"),
    # multi-device / whole-trainer tests: the suite's slow lane
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(32, SMALL.canvas_size ** 2)).astype(np.float32)
    digits = rng.integers(0, 3, 32).astype(np.int32)
    return images, digits


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_axis=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(6, model_axis=4)


def test_shard_batch_placement(batch):
    images, digits = batch
    mesh = make_mesh(8)
    si, sd = shard_batch(mesh, images, digits)
    assert si.sharding == batch_sharding(mesh)
    # each device holds 32/8 = 4 rows
    assert si.addressable_shards[0].data.shape == (4, SMALL.canvas_size ** 2)
    np.testing.assert_array_equal(np.asarray(si), images)


def test_parallel_train_step_runs_and_replicates(batch):
    images, digits = batch
    mesh = make_mesh(8)
    state = create_train_state(SMALL, rng=0)
    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    step = make_parallel_train_step(SMALL, mesh, donate=False)
    si, sd = shard_batch(mesh, images, digits)
    new_state, metrics = step(state, si, sd)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # updated params are replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_parallel_matches_single_device(batch):
    """DP over 8 devices must give the same loss/update as one device on the
    same total batch (up to fp reassociation in the all-reduce)."""
    images, digits = batch
    mesh = make_mesh(8)
    state_p = jax.device_put(create_train_state(SMALL, rng=0),
                             replicated(mesh))
    state_s = create_train_state(SMALL, rng=0)

    pstep = make_parallel_train_step(SMALL, mesh, donate=False)
    sstep = make_train_step(SMALL, donate=False)

    si, sd = shard_batch(mesh, images, digits)
    new_p, m_p = pstep(state_p, si, sd)
    new_s, m_s = sstep(state_s, jnp.asarray(images), jnp.asarray(digits))

    np.testing.assert_allclose(float(m_p["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_p["accuracy"]),
                               float(m_s["accuracy"]), rtol=1e-6)
    # parameters after one update agree
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        new_p.params, new_s.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_parallel_eval_step(batch):
    images, digits = batch
    mesh = make_mesh(8)
    state = jax.device_put(create_train_state(SMALL, rng=0), replicated(mesh))
    estep = make_parallel_eval_step(SMALL, mesh)
    si, sd = shard_batch(mesh, images, digits)
    out = estep(state.params, si, sd,
                jax.device_put(jax.random.PRNGKey(0), replicated(mesh)),
                jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh)))
    assert out.reconstruction.shape == (32, SMALL.canvas_size ** 2)
    assert np.isfinite(np.asarray(out.per_example_loss)).all()


def test_multichip_dryrun_entrypoint():
    """The driver-facing dryrun compiles + executes the full training step
    on an 8-device mesh."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(4)


def test_model_axis_actually_shards():
    """model_axis=2 must column-shard the big kernels (TP, not cosmetic)."""
    from air_tpu.parallel.mesh import shard_state
    mesh = make_mesh(8, model_axis=2)
    state = shard_state(mesh, create_train_state(SMALL, rng=0))
    lstm_kernel = state.params["lstm"]["kernel"]
    assert "model" in str(lstm_kernel.sharding.spec)
    # each device holds half the gate columns
    shard_shape = lstm_kernel.addressable_shards[0].data.shape
    assert shard_shape[1] == lstm_kernel.shape[1] // 2
    # Adam mu/nu follow the same layout
    import jax as _jax
    mus = [l for l in _jax.tree_util.tree_leaves(state.opt_state)
           if getattr(l, "shape", None) == lstm_kernel.shape]
    assert mus and all("model" in str(m.sharding.spec) for m in mus)


def test_tp_matches_single_device(batch):
    """data=4 x model=2 must reproduce the single-device update."""
    from air_tpu.parallel.mesh import shard_state
    images, digits = batch
    mesh = make_mesh(8, model_axis=2)
    state_p = shard_state(mesh, create_train_state(SMALL, rng=0))
    state_s = create_train_state(SMALL, rng=0)
    pstep = make_parallel_train_step(SMALL, mesh, donate=False)
    sstep = make_train_step(SMALL, donate=False)
    si, sd = shard_batch(mesh, images, digits)
    new_p, m_p = pstep(state_p, si, sd)
    new_s, m_s = sstep(state_s, jnp.asarray(images), jnp.asarray(digits))
    np.testing.assert_allclose(float(m_p["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        new_p.params, new_s.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_tp_scaled_config_shapes():
    """Tensor parallelism at the SCALED-config shapes it was built for
    (BASELINE.json config 4: 100x100 canvas, 512-LSTM, 100-dim latent —
    parallel/mesh.py:5-10): data=4 x model=2 training step compiles,
    executes, and genuinely column-shards the big kernels (VERDICT r2 #4).
    Batch is kept small — the SHAPES of the weights are what TP sees."""
    from air_tpu.parallel.mesh import shard_state
    from air_tpu.models.config import DEFAULT_TRAINING_CONFIG
    scaled = DEFAULT_TRAINING_CONFIG.replace(
        canvas_size=100, rnn_units=512, vae_latent_dimensions=100,
        cnn=False, train=True)
    mesh = make_mesh(8, model_axis=2)
    state = shard_state(mesh, create_train_state(scaled, rng=0))
    # the 2048-col LSTM gate kernel and both VAE hidden kernels shard
    gate = state.params["lstm"]["kernel"]
    assert gate.shape == (100 * 100 + 512, 4 * 512)
    assert "model" in str(gate.sharding.spec)
    assert gate.addressable_shards[0].data.shape[1] == gate.shape[1] // 2
    n_sharded = sum(1 for l in jax.tree_util.tree_leaves(state.params)
                    if "model" in str(getattr(l, "sharding",
                                              None) and l.sharding.spec))
    assert n_sharded >= 6
    rng = np.random.default_rng(1)
    images = rng.uniform(size=(16, 100 * 100)).astype(np.float32)
    digits = rng.integers(0, 3, 16).astype(np.int32)
    pstep = make_parallel_train_step(scaled, mesh, donate=False)
    si, sd = shard_batch(mesh, images, digits)
    new_state, metrics = pstep(state, si, sd)
    assert np.isfinite(float(metrics["loss"]))
    # params keep their TP layout through the update
    g2 = new_state.params["lstm"]["kernel"]
    assert "model" in str(g2.sharding.spec)


def test_multichip_dryrun_clean_subprocess():
    """Run dryrun_multichip(8) exactly as the driver does: a fresh process
    with NO conftest env (one visible device), so the self-provisioning
    path — not the test harness — must supply the 8-device mesh. Guards the
    failure mode that broke MULTICHIP_r01.json."""
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # pin the OUTER process to plain CPU (1 device) so the test is hermetic
    # off-TPU; the dryrun itself must provision the 8-device mesh
    code = (f"import sys; sys.path.insert(0, {repo!r}); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "OK" in proc.stdout, proc.stdout


def test_trainer_data_parallel(tmp_path):
    """Trainer with data_parallel=True trains over the 8-device mesh and
    resumes (BASELINE.json config 5 integration)."""
    from air_tpu.train.trainer import Trainer, TrainerConfig
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(128, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 128).astype(np.int32)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "dp"), batch_size=32, epochs=None,
        max_iterations=6, num_summaries_every=3, img_summaries_every=100,
        grad_summaries_every=4, save_params_every=100, eval_batch_size=64,
        seed=0, log_every=3, source_snapshot=False, data_parallel=True)
    tr = Trainer(SMALL, tcfg, (images, digits), (images[:64], digits[:64]))
    assert tr.mesh is not None and tr.mesh.shape["data"] == 8
    result = tr.train()
    assert result["step"] == 6
    # params ended replicated across the mesh
    leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_trainer_device_data_plus_dp(tmp_path):
    """device_data + data_parallel compose: sharded multi-step over the
    8-device mesh with the HBM-resident dataset."""
    from air_tpu.train.trainer import Trainer, TrainerConfig
    rng = np.random.default_rng(0)
    cs = SMALL.canvas_size
    images = rng.uniform(size=(128, cs * cs)).astype(np.float32)
    digits = rng.integers(0, 3, 128).astype(np.int32)
    tcfg = TrainerConfig(
        results_folder=str(tmp_path / "dpd"), batch_size=16, epochs=None,
        max_iterations=10, num_summaries_every=5, img_summaries_every=100,
        grad_summaries_every=5, save_params_every=100, eval_batch_size=64,
        seed=0, log_every=5, source_snapshot=False, data_parallel=True,
        device_data=True, multi_step=5)
    tr = Trainer(SMALL, tcfg, (images, digits), (images[:64], digits[:64]))
    result = tr.train()
    assert result["step"] == 10
    leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_tp_hoist_matches_single_device(batch):
    """rnn_input_hoist under tensor parallelism: the hoisted projection
    row-slices the column-sharded gate kernel (rows are orthogonal to
    the model-axis column split), so the data=4 x model=2 update must
    still reproduce the single-device hoisted update."""
    from air_tpu.parallel.mesh import shard_state
    cfg = SMALL.replace(rnn_input_hoist=True)
    images, digits = batch
    mesh = make_mesh(8, model_axis=2)
    state_p = shard_state(mesh, create_train_state(cfg, rng=0))
    state_s = create_train_state(cfg, rng=0)
    pstep = make_parallel_train_step(cfg, mesh, donate=False)
    sstep = make_train_step(cfg, donate=False)
    si, sd = shard_batch(mesh, images, digits)
    new_p, m_p = pstep(state_p, si, sd)
    new_s, m_s = sstep(state_s, jnp.asarray(images), jnp.asarray(digits))
    np.testing.assert_allclose(float(m_p["loss"]), float(m_s["loss"]),
                               rtol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        new_p.params, new_s.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4
