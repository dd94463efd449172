"""Jitted train / eval steps.

The train step is the whole reference per-iteration ``sess.run`` (reference
training.py:210-225) as ONE fused XLA program: annealed hyperparameter
resolution, forward scan, loss, backward, global-norm clipping, Adam update.
Gradient diagnostics (pre/post-clip norms per variable, reference
air/air_model.py:658-687) are available as a separate jitted variant so the
hot path never pays for them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from air_tpu.models.config import AIRConfig
from air_tpu.models.air import air_forward
from air_tpu.ops.schedules import resolve_annealed
from air_tpu.train.state import TrainState, make_optimizer


_global_norm = optax.global_norm     # same semantics; one source of truth


def bg_intensity(schedule: dict | None, step) -> jnp.ndarray:
    """Background-curriculum intensity ``s(step)``: 0 until ``start``, then
    a linear ramp over ``ramp`` steps up to ``target`` (ramp=0 -> jump).

    The harder-scenes generator composites ONE static texture into every
    canvas at a fixed intensity (reference multi_mnist.py:319-334 dimmer);
    ramping that intensity in during training lets localization lock in on
    clean scenes first (RESULTS.md harder-scenes analysis)."""
    schedule = schedule or {}
    target = float(schedule.get("target", 1.0))
    start = float(schedule.get("start", 0))
    ramp = float(schedule.get("ramp", 0))
    step = jnp.asarray(step, jnp.float32)
    if ramp > 0:
        frac = jnp.clip((step - start) / ramp, 0.0, 1.0)
    else:
        frac = (step >= start).astype(jnp.float32)
    return jnp.asarray(target, jnp.float32) * frac


def make_train_step(config: AIRConfig, optimizer=None, with_grad_stats=False,
                    donate=True, jit=True, pmean_axis: str | None = None,
                    bg_image=None, bg_schedule: dict | None = None,
                    schedules_fn=None):
    """Build a ``train_step(state, images, targets) -> (state, metrics)``;
    jitted unless ``jit=False`` (the parallel layer jits with explicit
    shardings instead). ``pmean_axis`` inserts a gradient/metric pmean over
    that mesh axis (for shard_map-based SPMD where each shard computes
    grads on its local batch slice).

    ``bg_image`` (a [canvas**2] full-intensity texture) enables on-device
    background compositing: each batch becomes
    ``clip(images + s(step) * bg, 0, 1)`` with ``s`` from ``bg_schedule``
    (see :func:`bg_intensity`) — the background-intensity curriculum runs
    fully fused inside the jitted step, with zero extra host traffic.

    ``schedules_fn``: a ``knobs -> annealing-schedules dict`` callable.
    When given, the returned step takes a FOURTH argument ``knobs`` (a
    pytree of scalars, traceable) and resolves annealed hyperparameters
    from ``schedules_fn(knobs)`` instead of ``config.schedules`` — this
    is how the seed-parallel sweeper rotates bootstrap schedules PER
    REPLICA inside one vmapped program (multi_seed.schedules_from_knobs):
    every numeric schedule knob becomes a traced input, so replicas on
    different restart variants share one compiled step."""
    if optimizer is None:
        optimizer = make_optimizer(config)
    if bg_image is not None and bg_schedule is None:
        # without a schedule the composite would silently run at the
        # bg_intensity default target (1.0) from step 0 — an easy foot-gun;
        # ask for an explicit {"target": s, "start": 0, "ramp": 0} instead
        raise ValueError("bg_image requires an explicit bg_schedule "
                         "({'target': s, 'start': 0, 'ramp': 0} for a "
                         "constant composite)")
    bg_flat = (None if bg_image is None
               else jnp.asarray(bg_image, jnp.float32).reshape(-1))

    def train_step(state: TrainState, images, targets, knobs=None):
        step = state.step
        key = jax.random.fold_in(state.key, step)
        if bg_flat is not None:
            s = bg_intensity(bg_schedule, step)
            images = jnp.clip(images + s * bg_flat[None, :], 0.0, 1.0)
        if pmean_axis is not None:
            # decorrelate sampling noise across DP shards
            key = jax.random.fold_in(key, jax.lax.axis_index(pmean_axis))
        schedules = (config.schedules if schedules_fn is None
                     else schedules_fn(knobs))
        hp = resolve_annealed(schedules, config.annealable_defaults(), step)

        def loss_fn(params):
            out = air_forward(params, config, images, targets, key,
                              train=True, hparams=hp)
            return out.loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            out = out._replace(
                accuracy=jax.lax.pmean(out.accuracy, pmean_axis),
                reconstruction_loss=jax.lax.pmean(
                    jnp.mean(out.reconstruction_loss, keepdims=True),
                    pmean_axis),
                kl_loss=jax.lax.pmean(jnp.mean(out.kl_loss, keepdims=True),
                                      pmean_axis))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=step + 1)
        metrics = {
            "loss": loss,
            "accuracy": out.accuracy,
            "reconstruction_loss": jnp.mean(out.reconstruction_loss),
            "kl_loss": jnp.mean(out.kl_loss),
            "grad_norm": _global_norm(grads),
            "z_pres_prior_log_odds": jnp.asarray(
                hp["z_pres_prior_log_odds"], jnp.float32),
        }
        if bg_flat is not None:
            metrics["bg_intensity"] = bg_intensity(bg_schedule, step)
        if with_grad_stats:
            # per-variable pre/post-clip gradient stats
            # (reference air/air_model.py:658-687)
            clipped = grads
            if config.gradient_clipping_norm is not None:
                clipped, _ = optax.clip_by_global_norm(
                    config.gradient_clipping_norm).update(grads, optax.EmptyState())
            flat = jax.tree_util.tree_leaves_with_path(grads)
            flat_c = jax.tree_util.tree_leaves(clipped)
            gstats = {}
            for (path, g), gc in zip(flat, flat_c):
                name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                for p in path)
                gstats[name + "_grad_original_norm"] = jnp.linalg.norm(
                    g.ravel())
                gstats[name + "_grad_original_avg"] = jnp.mean(g)
                gstats[name + "_grad_applied_norm"] = jnp.linalg.norm(
                    gc.ravel())
                gstats[name + "_grad_applied_avg"] = jnp.mean(gc)
            metrics["grad_stats"] = gstats
            # raw tensors for TRUE pre/post-clip histograms (reference
            # air/air_model.py:658-687); the trainer fetches these only
            # when the TB sink is active
            metrics["grad_tensors"] = {"original": grads, "applied": clipped}
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(config: AIRConfig, jit=True):
    """Eval forward (train=False, z_pres rounded) returning the full
    AIROutputs — the reference's test-model pass (training.py:95-125)."""

    def eval_step(params, images, targets, key, step):
        hp = resolve_annealed(config.schedules, config.annealable_defaults(),
                              step)
        return air_forward(params, config, images, targets, key,
                           train=False, hparams=hp)

    return jax.jit(eval_step) if jit else eval_step


def make_eval_summary_step(config: AIRConfig, jit=True):
    """Eval forward + the reference's full scalar metric taxonomy as ONE
    device program: only ~250 scalars cross the host boundary.

    Why: fetching the full AIROutputs and summarizing host-side costs
    ~10 s per eval over the tunneled TPU (tens of MB of readback plus
    hundreds of eager dispatches) and dominated training wall-clock —
    48 evals ~ 480 s of a 634 s run. One fused program + one small fetch
    is the TPU-native shape of the reference's test pass."""
    from air_tpu.train.metrics import summarize_outputs
    eval_fn = make_eval_step(config, jit=False)

    def eval_summary(params, images, targets, key, step):
        out = eval_fn(params, images, targets, key, step)
        return summarize_outputs(out, targets, config.max_steps,
                                 config.max_digits)

    return jax.jit(eval_summary) if jit else eval_summary
