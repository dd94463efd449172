"""Seed-parallel training: N independent AIR models trained simultaneously
on one chip via ``jax.vmap`` over the fused multi-step train loop.

Why this exists: AIR's headline claim is ROBUSTNESS (reference README.md:18
— 10/10 runs converge to 98%), so reproducing it means training many seeds.
The reference trains them one by one. On TPU the default config is
latency-bound (batch 64 -> ~0.3 ms/step leaves the MXU mostly idle), so
stacking S model replicas turns every [B, in] x [in, out] matmul into a
batched [S, B, in] x [S, in, out] one and trains S seeds for roughly the
wall-clock price of one — a capability the reference's one-graph-per-run
design cannot express.

Semantics: each replica r is EXACTLY the single-seed run with seed
``seeds[r]`` — its own init, its own per-step sampling keys, its own epoch
permutations of the shared device-resident dataset. Verified by
tests/test_multi_seed.py::test_replica_matches_single_seed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from air_tpu.models.config import AIRConfig
from air_tpu.train.state import TrainState, create_train_state
from air_tpu.train.steps import make_train_step


def create_multi_seed_state(config: AIRConfig, seeds) -> TrainState:
    """A stacked TrainState: every leaf gains a leading [S] seed axis."""
    states = [create_train_state(config, rng=int(s)) for s in seeds]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


@jax.jit
def _stitch_replica(state: TrainState, fresh: TrainState,
                    index) -> TrainState:
    """One program for the ~100-leaf replica replacement (eager per-leaf
    ``.at[].set`` would cost ~100 dispatches over the tunnel)."""
    return jax.tree_util.tree_map(
        lambda stacked, new: stacked.at[index].set(new), state, fresh)


def reinit_replica(state: TrainState, config: AIRConfig, index: int,
                   seed: int) -> TrainState:
    """Replace replica ``index`` with a fresh init (stall auto-recovery:
    re-seed only the dead replica, the healthy ones keep training)."""
    fresh = create_train_state(config, rng=int(seed))
    return _stitch_replica(state, fresh, jnp.asarray(index, jnp.int32))


@partial(jax.jit, static_argnums=2)
def _perms_impl(seeds: jnp.ndarray, epoch, n: int) -> jnp.ndarray:
    def one(s):
        key = jax.random.fold_in(jax.random.PRNGKey(s), epoch)
        return jax.random.permutation(key, n)
    return jax.vmap(one)(seeds)


def multi_seed_perms(n: int, seeds, epoch) -> jnp.ndarray:
    """[S, n] per-replica epoch permutations — each seed sees its own data
    order (the stall basin is partly data-order-driven, RESULTS.md). One
    jitted program (bit-identical to stacking ``device_epoch_perm`` per
    seed, verified by test_replica_matches_single_seed)."""
    seeds = jnp.asarray([int(s) for s in seeds], jnp.int32)
    return _perms_impl(seeds, jnp.asarray(epoch, jnp.int32), n)


# --- Per-replica schedule rotation (vmap-compatible restart variants) ---
#
# The sequential Trainer rotates bootstrap-schedule VARIANTS across restart
# attempts (trainer.DEFAULT_RESTART_ROTATION) — its strongest rescue lever.
# A vmapped sweep compiles ONE step for all replicas, so it cannot swap
# schedule dicts per replica; but every rotation variant differs only in
# NUMERIC knobs of three schedules, and `annealed_value` is fully traceable.
# Encoding those knobs as per-replica [S] inputs gives each replica its own
# variant inside the shared compiled program:
#
#   z_pres_hold  — grace window of the z_pres prior anneal (0 = reference
#                  schedule, reference training.py:110-121)
#   spc_init     — 1.0 turns the scale-prior curriculum on (mean walks
#                  0 -> -1; 0.0 leaves the constant default -1)
#   spc_hold     — curriculum delay (usually = z_pres_hold)
#   temp_init    — Concrete temperature anneal start (1.0 = constant
#                  reference temperature, 5.0 = soft-decisions anneal)

def rotation_knobs(z_pres_hold: float = 0.0, scale_curriculum: bool = False,
                   spc_hold: float | None = None, temp_init: float = 1.0):
    """One replica's schedule-knob dict (plain floats; stack for [S])."""
    return {
        "z_pres_hold": float(z_pres_hold),
        "spc_init": 1.0 if scale_curriculum else 0.0,
        "spc_hold": float(z_pres_hold if spc_hold is None else spc_hold),
        "temp_init": float(temp_init),
    }


N_ROTATION_VARIANTS = 5    # keep == len(variants) in vmap_rotation_variant


def rotation_variant_index(n_restarts: int) -> int:
    """Which rotation variant the n-th restart runs (n >= 1)."""
    return (n_restarts - 1) % N_ROTATION_VARIANTS


def vmap_rotation_variant(n: int, base_hold: float):
    """Knobs for the n-th restart (n >= 1) — mirrors
    trainer.DEFAULT_RESTART_ROTATION variant (n-1) % 5."""
    variants = (
        rotation_knobs(0.0),                                  # reference
        rotation_knobs(base_hold, scale_curriculum=True,
                       spc_hold=0.0),                         # scale-prior
        rotation_knobs(base_hold, temp_init=5.0),             # temp anneal
        rotation_knobs(2 * base_hold, temp_init=5.0),         # long hold
        rotation_knobs(0.0, temp_init=5.0),                   # ref + temp
    )
    assert len(variants) == N_ROTATION_VARIANTS
    return variants[rotation_variant_index(n)]


def schedules_from_knobs(base_schedules: dict, knobs: dict) -> dict:
    """Annealing-schedules dict with the three rotation-controlled
    schedules rebuilt from (possibly traced) ``knobs``. Knob semantics
    verified against the dict-based overlays in
    tests/test_multi_seed.py::test_knob_schedules_match_dict_variants."""
    sched = dict(base_schedules)
    zp = dict(sched["z_pres_prior_log_odds"])
    zp["hold"] = knobs["z_pres_hold"]
    sched["z_pres_prior_log_odds"] = zp
    # spc_init=0 -> value 0, +offset -> the constant default mean of -1
    sched["scale_prior_mean"] = {
        "init": knobs["spc_init"], "min": 0.0, "factor": 0.5,
        "iters": 5000, "offset": -1.0, "hold": knobs["spc_hold"]}
    # temp_init=1 -> clamped at min 1.0 == the constant reference temp
    sched["z_pres_temperature"] = {
        "init": knobs["temp_init"], "min": 1.0, "factor": 0.5,
        "iters": 5000}
    return sched


def stack_knobs(knob_dicts):
    """[S] knob dicts -> dict of [S] f32 arrays (vmap input)."""
    keys = knob_dicts[0].keys()
    return {k: jnp.asarray([d[k] for d in knob_dicts], jnp.float32)
            for k in keys}


def set_replica_knobs(knobs_S: dict, index: int, knobs: dict) -> dict:
    return {k: knobs_S[k].at[index].set(knobs[k]) for k in knobs_S}


def make_multi_seed_step(config: AIRConfig, num_steps: int, batch_size: int,
                         donate=True, bg_image=None, bg_schedule=None,
                         knob_schedules=False, pipeline_unroll: int = 1):
    """Build a jitted ``(state_S, images, digits, perms_S, start) ->
    (state_S, metrics)`` running ``num_steps`` fused train steps for every
    replica. ``images``/``digits`` are the SHARED device-resident dataset;
    ``perms_S`` is [S, n] (one epoch permutation per replica); metrics come
    back as [K, S] arrays.

    ``knob_schedules=True`` adds a trailing ``knobs_S`` argument (dict of
    [S] f32 arrays, see :func:`rotation_knobs`) giving each replica its own
    bootstrap-schedule variant — the vmap equivalent of the sequential
    Trainer's restart schedule rotation.

    ``pipeline_unroll`` unrolls the K-step scan across optimizer steps,
    the same fusion-scope knob as ``fast_pipeline.make_pipeline_step``
    (NOT convergence-neutral — RESULTS.md round-4 pipeline_unroll)."""
    schedules_fn = None
    if knob_schedules:
        base = config.schedules
        schedules_fn = lambda knobs: schedules_from_knobs(base, knobs)
    single = make_train_step(config, donate=False, jit=False,
                             bg_image=bg_image, bg_schedule=bg_schedule,
                             schedules_fn=schedules_fn)
    if knob_schedules:
        vstep = jax.vmap(single, in_axes=(0, 0, 0, 0))

        def multi(state_S, images, digits, perms_S, start, knobs_S):
            def body(state_S, i):
                base_i = (start + i) * batch_size
                idx = jax.lax.dynamic_slice(
                    perms_S, (0, base_i), (perms_S.shape[0], batch_size))
                return vstep(state_S, jnp.take(images, idx, axis=0),
                             jnp.take(digits, idx, axis=0), knobs_S)

            return jax.lax.scan(body, state_S, jnp.arange(num_steps),
                                unroll=pipeline_unroll)
    else:
        vstep = jax.vmap(single, in_axes=(0, 0, 0))

        def multi(state_S, images, digits, perms_S, start):
            def body(state_S, i):
                base_i = (start + i) * batch_size
                idx = jax.lax.dynamic_slice(
                    perms_S, (0, base_i), (perms_S.shape[0], batch_size))
                batch_images = jnp.take(images, idx, axis=0)   # [S, B, D]
                batch_digits = jnp.take(digits, idx, axis=0)   # [S, B]
                return vstep(state_S, batch_images, batch_digits)

            return jax.lax.scan(body, state_S, jnp.arange(num_steps),
                                unroll=pipeline_unroll)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_multi_seed_eval(config: AIRConfig, knob_schedules: bool = False):
    """Jitted per-replica eval: ``(params_S, images, digits, key,
    steps_S[, knobs_S]) -> (accuracy[S], loss[S])`` over one test batch
    (chunk outside). ``steps_S`` is PER REPLICA ([S] int32): each
    replica's annealed hyperparameters resolve at its OWN clock — a
    restarted replica (reset clock) evaluates under the prior/temperature
    values it actually trained with. ``knob_schedules=True`` adds a
    trailing ``knobs_S`` argument so rotated replicas also use their own
    schedule variant (see :func:`rotation_knobs`)."""
    from air_tpu.models.air import air_forward
    from air_tpu.ops.schedules import resolve_annealed
    base = config.schedules

    def one(params, images, digits, key, step, knobs=None):
        sched = base if knobs is None else schedules_from_knobs(base, knobs)
        hp = resolve_annealed(sched, config.annealable_defaults(), step)
        out = air_forward(params, config, images, digits, key,
                          train=False, hparams=hp)
        return out.accuracy, jnp.mean(out.per_example_loss)

    if knob_schedules:
        fn = jax.jit(jax.vmap(one, in_axes=(0, None, None, None, 0, 0)))
    else:
        fn = jax.jit(jax.vmap(one, in_axes=(0, None, None, None, 0)))
    # evaluate_replicas asserts this against its knobs_S argument — a
    # mismatched pair would otherwise surface as an opaque vmap in_axes
    # arity TypeError mid-eval (advisor r4)
    fn.knob_schedules = knob_schedules
    return fn


def evaluate_replicas(config: AIRConfig, state: TrainState, images, digits,
                      key, step=None, batch_size: int = 500,
                      eval_fn=None, knobs_S=None):
    """Full-test-set accuracy/loss per replica, chunked to bound memory.
    Returns (accuracy[S], loss[S]) numpy arrays.

    Annealed hyperparameters resolve PER REPLICA: at each replica's own
    ``state.step`` clock (``step=None``, the default — restarted replicas
    have reset clocks) or at a shared ``step`` if given, and from the
    replica's own ``knobs_S`` schedule variant when provided (rotated
    replicas). Accuracy is knob-invariant either way (eval rounds z_pres,
    and sigmoid(x/T) >= 0.5 is T-invariant); loss[S] is now computed under
    the values each replica trained with, so cross-replica loss
    comparisons are honest."""
    import numpy as np
    if eval_fn is None:
        eval_fn = make_multi_seed_eval(config,
                                       knob_schedules=knobs_S is not None)
    elif hasattr(eval_fn, "knob_schedules"):
        if eval_fn.knob_schedules != (knobs_S is not None):
            raise ValueError(
                f"eval_fn was built with knob_schedules="
                f"{eval_fn.knob_schedules} but knobs_S is "
                f"{'set' if knobs_S is not None else 'None'} — pass a "
                f"matching pair (make_multi_seed_eval(config, "
                f"knob_schedules={knobs_S is not None}))")
    steps_S = (state.step if step is None
               else jnp.full_like(state.step, int(step)))
    extra = () if knobs_S is None else (knobs_S,)
    n = len(images)
    accs, losses, weights = [], [], []
    for lo in range(0, n, batch_size):
        chunk_images = jnp.asarray(images[lo:lo + batch_size])
        chunk_digits = jnp.asarray(digits[lo:lo + batch_size])
        # the tail chunk has its own (smaller) static shape — at most one
        # extra compile, and no test example is silently dropped
        acc, loss = eval_fn(state.params, chunk_images, chunk_digits,
                            key, jnp.asarray(steps_S, jnp.int32), *extra)
        accs.append(np.asarray(acc))
        losses.append(np.asarray(loss))
        weights.append(len(chunk_images))
    w = np.asarray(weights, np.float64)[:, None]
    acc = (np.stack(accs) * w).sum(0) / w.sum()
    loss = (np.stack(losses) * w).sum(0) / w.sum()
    return acc, loss
