"""The AIR model: a fixed-max-steps ``lax.scan`` with ACT-style stop masking.

Re-designs the reference's dynamic ``tf.while_loop`` graph
(reference air/air_model.py:269-600) as a static, jit-compilable scan:

  * Every loss/canvas/count update is already gated by
    ``stopping_sum < stopping_threshold`` in the reference
    (air/air_model.py:411-496), so running all ``max_steps`` iterations with
    those masks is *functionally identical* to the reference's early-exiting
    while_loop; the only divergence is compute (SURVEY.md §7 design stance).
  * z_pres KL is masked by the PRE-update stopping_sum (the first post-stop
    step's KL still counts, air/air_model.py:398-418); scale/shift/VAE KLs
    and the canvas write are masked by the POST-update sum
    (air/air_model.py:429-496).
  * The canvas accumulates ``z_pres * window_recon`` — the continuous
    relaxation trick (air/air_model.py:429-439).
  * Spatial attention uses separable MXU matmuls (air_tpu.ops.transformer)
    rather than gathers; Pallas fused kernels can be toggled via
    ``st_impl`` (see air_tpu.kernels).

RNG: 4 independent draws per step (scale, shift, VAE [latent + likelihood],
Gumbel); keys are pre-split outside the scan and fed as xs.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from air_tpu.models.config import AIRConfig
from air_tpu.nn.layers import two_layer_head_init, two_layer_head_apply
from air_tpu.nn.lstm import (lstm_init, lstm_apply, lstm_apply_hoisted,
                             lstm_input_proj, lstm_zero_state)
from air_tpu.nn.vae import vae_init, vae_apply
from air_tpu.nn.cnn import cnn_init, cnn_apply
from air_tpu.ops.transformer import attention_read, attention_write
from air_tpu.ops.concrete import (
    concrete_binary_pre_sigmoid_sample,
    concrete_binary_kl_mc_sample,
)
from air_tpu.ops.gaussian import sample_from_mvn, gaussian_kl
from air_tpu.ops.schedules import resolve_annealed

RECON_EPS = 10e-10  # reference air/air_model.py:587-588


class AIROutputs(NamedTuple):
    """Everything the reference exposes as AIRModel attributes
    (reference air/air_model.py:569-611), shape-static [B, max_steps, ...]."""
    rec_num_digits: jnp.ndarray      # [B] int32
    rec_scales: jnp.ndarray          # [B, T, 1]
    rec_shifts: jnp.ndarray          # [B, T, 2]
    rec_st_back: jnp.ndarray         # [B, T, 2, 3]
    rec_windows: jnp.ndarray         # [B, T, ws*ws]
    rec_latents: jnp.ndarray         # [B, T, latent]
    z_pres_probs: jnp.ndarray        # [B, T]
    z_pres: jnp.ndarray              # [B, T] (relaxed/rounded samples)
    z_pres_kls: jnp.ndarray          # [B, T]
    scale_kls: jnp.ndarray           # [B, T]
    shift_kls: jnp.ndarray           # [B, T]
    vae_kls: jnp.ndarray             # [B, T]
    reconstruction: jnp.ndarray      # [B, canvas**2], clipped to [0, 1]
    reconstruction_loss: jnp.ndarray  # [B]
    kl_loss: jnp.ndarray             # [B] (the while-loop running_loss)
    per_example_loss: jnp.ndarray    # [B]
    loss: jnp.ndarray                # [] mean total loss
    accuracy: jnp.ndarray            # [] digit-count accuracy


def init_air_params(key: jax.Array, config: AIRConfig,
                    dtype=jnp.float32, background_init=None) -> dict:
    """Initialize the AIR parameter pytree (~4.0M params at default config,
    SURVEY.md §2a parameter count).

    ``background_init``: optional [canvas**2] (or [canvas, canvas]) array of
    PIXEL-space background estimates in [0, 1] used to initialize the
    ``learn_background`` parameter (stored in logit space). With an exact
    estimate (e.g. the mean of 0-digit training scenes, which the harder
    scenes generator composites as ``clip(0 + s*bg)`` — i.e. the background
    itself), the model reconstructs textured scenes perfectly at step 0 and
    the localization bootstrap only ever sees unexplained DIGIT ink, like on
    clean canvases (RESULTS.md harder-scenes analysis)."""
    ks = jax.random.split(key, 9)
    rnn_in = config.rnn_input_dim
    ws2 = config.windows_size ** 2
    params = {
        "lstm": lstm_init(ks[0], rnn_in, config.rnn_units, dtype),
        "scale_mean": two_layer_head_init(
            ks[1], config.rnn_units, config.scale_hidden_units, 1, dtype),
        "scale_log_variance": two_layer_head_init(
            ks[2], config.rnn_units, config.scale_hidden_units, 1, dtype),
        "shift_mean": two_layer_head_init(
            ks[3], config.rnn_units, config.shift_hidden_units, 2, dtype),
        "shift_log_variance": two_layer_head_init(
            ks[4], config.rnn_units, config.shift_hidden_units, 2, dtype),
        "z_pres_log_odds": two_layer_head_init(
            ks[5], config.rnn_units, config.z_pres_hidden_units, 1, dtype),
        "vae": vae_init(ks[6], ws2, config.vae_recognition_units,
                        config.vae_latent_dimensions,
                        config.vae_generative_units, dtype),
    }
    if config.cnn:
        params["cnn"] = cnn_init(ks[7], config.cnn_filters, dtype)
    if config.learn_background:
        if background_init is not None:
            # data-driven init: logit of the clipped pixel-space estimate
            bg = jnp.asarray(background_init, dtype).reshape(-1)
            if bg.shape[0] != config.canvas_size ** 2:
                raise ValueError(
                    f"background_init has {bg.shape[0]} pixels, expected "
                    f"{config.canvas_size ** 2}")
            bg = jnp.clip(bg, 1e-3, 1.0 - 1e-3)
            params["background"] = jnp.log(bg) - jnp.log1p(-bg)
        else:
            # static background canvas, in logit space; sigmoid(-4) ~= 0.018
            # so the model starts from an (almost) blank canvas with live
            # gradients
            params["background"] = jnp.full((config.canvas_size ** 2,), -4.0,
                                            dtype)
    return params


class _Attend(NamedTuple):
    """Everything one attention step computes from the LSTM output —
    independent of the stop-mask carry (stopping_sum / canvas / loss),
    which is exactly why the decoder can run step-parallel (see
    ``decoder_layout``)."""
    scale: jnp.ndarray
    shift: jnp.ndarray
    z_pres_prob: jnp.ndarray
    z_pres: jnp.ndarray
    z_pres_kl: jnp.ndarray
    scale_kl: jnp.ndarray
    shift_kl: jnp.ndarray
    vae_kl: jnp.ndarray
    theta_back: jnp.ndarray
    vae_recon: jnp.ndarray
    vae_latent: jnp.ndarray
    window_recon: Any          # [B, cs*cs] on the XLA path; None on Pallas
    s: jnp.ndarray             # window scale/position scalars — the Pallas
    x: jnp.ndarray             # fused write+accumulate consumes these with
    y: jnp.ndarray             # vae_recon instead of window_recon


def _attend(params: dict, config: AIRConfig, hp: dict,
            images_2d: jnp.ndarray, outputs: jnp.ndarray,
            train: bool, key: jax.Array) -> _Attend:
    """The carry-independent body of one attention step: heads, sampling,
    forward/backward spatial transforms, VAE, and per-step KLs — the
    reference while_loop body (air/air_model.py:288-496) minus the
    stop-mask bookkeeping, which the caller applies (sequentially in
    ``_step``; via cumulative masks in the step-parallel decoder).

    ``outputs`` is the LSTM output for this step ([B, rnn_units])."""
    k_scale, k_shift, k_vae, k_zpres = jax.random.split(key, 4)
    batch = images_2d.shape[0]
    ws = config.windows_size
    cs = config.canvas_size

    use_pallas = config.st_impl in ("pallas", "inline")
    if use_pallas:
        if config.st_pad_mode != "zeros":
            raise ValueError(f"st_impl={config.st_impl!r} only implements "
                             "st_pad_mode='zeros'")
        if config.st_impl == "inline":
            # in-kernel weight construction from (s, x, y) scalars —
            # no [B, out, in] weight streams (kernels/st_inline.py)
            from air_tpu.kernels.st_inline import inline_attention_read
            st_read, st_write = inline_attention_read, None
        else:
            from air_tpu.kernels.st_pallas import pallas_attention_read
            st_read, st_write = pallas_attention_read, None
    else:
        st_read = functools.partial(attention_read,
                                    pad_mode=config.st_pad_mode)
        st_write = functools.partial(attention_write,
                                     pad_mode=config.st_pad_mode)

    # Under mixed precision (config.compute_dtype) the heads/VAE below run
    # in bf16; every head OUTPUT is promoted to fp32 before sampling/KL so
    # the distribution math and the ST stay full-precision. The params are
    # cast PER USE *inside* the step body (not hoisted to air_forward) so
    # the scan transpose sums the per-step parameter cotangents in fp32 —
    # a cast hoisted outside the scan makes that cross-step accumulation
    # happen in bf16, which measurably degrades the localization bootstrap
    # (RESULTS.md round-4 mixed-precision attribution). XLA's
    # loop-invariant code motion / CSE removes the repeated forward casts,
    # and every cast is a no-op at the fp32 default.
    cdt = jnp.dtype(config.compute_dtype)

    def cast(tree):
        return jax.tree_util.tree_map(lambda a: a.astype(cdt), tree)

    # scale head: sample -> sigmoid (air/air_model.py:288-303)
    scale_mean = two_layer_head_apply(
        cast(params["scale_mean"]), outputs).astype(jnp.float32)
    scale_log_variance = two_layer_head_apply(
        cast(params["scale_log_variance"]), outputs).astype(jnp.float32)
    scale_variance = jnp.exp(scale_log_variance)
    scale = jax.nn.sigmoid(sample_from_mvn(k_scale, scale_mean, scale_variance))
    s = scale[:, 0]

    # shift head: sample -> tanh (air/air_model.py:305-320)
    shift_mean = two_layer_head_apply(
        cast(params["shift_mean"]), outputs).astype(jnp.float32)
    shift_log_variance = two_layer_head_apply(
        cast(params["shift_log_variance"]), outputs).astype(jnp.float32)
    shift_variance = jnp.exp(shift_log_variance)
    shift = jnp.tanh(sample_from_mvn(k_shift, shift_mean, shift_variance))
    x, y = shift[:, 0], shift[:, 1]

    # forward ST: canvas -> window (air/air_model.py:322-333), MXU path
    window = st_read(images_2d, s, x, y, ws).reshape(batch, ws * ws)

    # VAE on the flattened window (air/air_model.py:335-349); the MLPs run
    # at the compute dtype, the latent/likelihood sampling inside
    # vae_apply is fp32, outputs promoted to fp32 (the recon feeds the
    # canvas accumulation, the moments feed the KL)
    vae_recon, vae_mean, vae_log_variance, vae_latent = (
        o.astype(jnp.float32) for o in vae_apply(
            cast(params["vae"]), k_vae, window.astype(cdt),
            hp["vae_likelihood_std"]))

    # backward ST theta, recorded for visualization (air/air_model.py:351-360)
    zeros = jnp.zeros_like(s)
    inv_s = 1.0 / s
    theta_back = jnp.stack([
        jnp.stack([inv_s, zeros, -x * inv_s], axis=1),
        jnp.stack([zeros, inv_s, -y * inv_s], axis=1),
    ], axis=1)                                                # [B, 2, 3]

    # backward ST: window -> canvas (air/air_model.py:362-366), MXU path.
    # On the Pallas path the write is fused with the masked canvas
    # accumulate below (air_tpu/kernels/st_fused.py), so nothing is
    # materialized here.
    if not use_pallas:
        window_recon = st_write(vae_recon.reshape(batch, ws, ws),
                                s, x, y, cs)

    # z_pres head -> Concrete sample (air/air_model.py:368-396)
    z_pres_log_odds = two_layer_head_apply(
        cast(params["z_pres_log_odds"]), outputs)[:, 0].astype(jnp.float32)
    z_pres_pre_sigmoid = concrete_binary_pre_sigmoid_sample(
        k_zpres, z_pres_log_odds, hp["z_pres_temperature"])
    z_pres = jax.nn.sigmoid(z_pres_pre_sigmoid)
    if not train:
        # test time: rounding to the underlying Bernoulli sample
        # (air/air_model.py:387-390)
        z_pres = jnp.round(z_pres)
    z_pres_prob = jax.nn.sigmoid(z_pres_log_odds)

    # per-step KLs; the caller applies the stop masks
    # (air/air_model.py:398-418, 441-496)
    z_pres_kl = concrete_binary_kl_mc_sample(
        z_pres_pre_sigmoid,
        hp["z_pres_prior_log_odds"], hp["z_pres_temperature"],
        z_pres_log_odds, hp["z_pres_temperature"])
    scale_kl = gaussian_kl(scale_mean, scale_log_variance,
                           hp["scale_prior_mean"], hp["scale_prior_variance"])
    shift_kl = gaussian_kl(shift_mean, shift_log_variance,
                           hp["shift_prior_mean"], hp["shift_prior_variance"])
    vae_kl = gaussian_kl(vae_mean, vae_log_variance,
                         hp["vae_prior_mean"], hp["vae_prior_variance"])

    return _Attend(scale, shift, z_pres_prob, z_pres, z_pres_kl,
                   scale_kl, shift_kl, vae_kl, theta_back, vae_recon,
                   vae_latent,
                   None if use_pallas else window_recon.reshape(batch,
                                                                cs * cs),
                   s, x, y)


def _step(params: dict, config: AIRConfig, hp: dict,
          images_2d: jnp.ndarray, rnn_input: jnp.ndarray,
          train: bool, carry, key: jax.Array):
    """One attention step — the reference while_loop ``body``
    (reference air/air_model.py:278-508), order preserved exactly:
    the RNN time step, the carry-independent attention body
    (:func:`_attend`), then the stop-mask bookkeeping."""
    lstm_state, stopping_sum, running_recon, running_loss, running_digits = \
        carry
    batch = images_2d.shape[0]
    ws = config.windows_size
    cs = config.canvas_size
    threshold = hp["stopping_threshold"]
    cdt = jnp.dtype(config.compute_dtype)

    # RNN time step (air/air_model.py:284-286); params cast per use inside
    # the scan body (see the _attend precision comment). Under
    # rnn_input_hoist, ``rnn_input`` is the precomputed gate projection
    # (air_forward hoists it out of the scan) and only the recurrent
    # kernel half is read here.
    lstm_cast = jax.tree_util.tree_map(lambda a: a.astype(cdt),
                                       params["lstm"])
    if config.rnn_input_hoist:
        outputs, lstm_state = lstm_apply_hoisted(
            lstm_cast, lstm_state, rnn_input.astype(cdt))
    else:
        outputs, lstm_state = lstm_apply(
            lstm_cast, lstm_state, rnn_input.astype(cdt))

    a = _attend(params, config, hp, images_2d, outputs, train, key)

    # z_pres KL, masked by the PRE-update stopping_sum
    # (air/air_model.py:398-418)
    running_loss += jnp.where(stopping_sum < threshold, a.z_pres_kl, 0.0)

    # stopping sum and digit count updates (air/air_model.py:420-427)
    stopping_sum = stopping_sum + (1.0 - a.z_pres)
    alive = stopping_sum < threshold
    running_digits = running_digits + alive.astype(jnp.int32)

    # canvas += z_pres * window_recon for unfinished items
    # (air/air_model.py:429-439) — the continuous-relaxation trick
    if config.st_impl in ("pallas", "inline"):
        # fused attention-write + masked accumulate: coeff = alive * z_pres
        # is exactly where(alive, z_pres * wr, 0)
        if config.st_impl == "inline":
            from air_tpu.kernels.st_inline import inline_write_accumulate
            fused = inline_write_accumulate
        else:
            from air_tpu.kernels.st_fused import fused_write_accumulate
            fused = fused_write_accumulate
        running_recon = fused(
            running_recon, a.vae_recon.reshape(batch, ws, ws),
            a.s, a.x, a.y, alive.astype(a.z_pres.dtype) * a.z_pres, cs)
    else:
        running_recon += jnp.where(
            alive[:, None], a.z_pres[:, None] * a.window_recon, 0.0)

    # scale / shift / VAE closed-form KLs, masked by POST-update sum
    # (air/air_model.py:441-496)
    running_loss += jnp.where(alive, a.scale_kl, 0.0)
    running_loss += jnp.where(alive, a.shift_kl, 0.0)
    running_loss += jnp.where(alive, a.vae_kl, 0.0)

    carry = (lstm_state, stopping_sum, running_recon, running_loss,
             running_digits)
    ys = (a.scale, a.shift, a.z_pres_prob, a.z_pres, a.z_pres_kl,
          a.scale_kl, a.shift_kl, a.vae_kl, a.theta_back, a.vae_recon,
          a.vae_latent)
    return carry, ys


def air_forward(params: dict, config: AIRConfig, images: jnp.ndarray,
                target_num_digits: jnp.ndarray, key: jax.Array,
                train: bool | None = None,
                hparams: dict[str, Any] | None = None,
                step=None) -> AIROutputs:
    """Full AIR forward pass + losses on a [B, canvas**2] batch.

    ``train`` defaults to ``config.train``; ``hparams`` (annealed scalar
    overrides) defaults to resolving ``config.annealing_schedules`` at
    ``step`` (or the static config values when both are None).
    """
    if train is None:
        train = config.train
    if hparams is None:
        if step is None:
            hp = config.annealable_defaults()
        else:
            hp = resolve_annealed(config.schedules,
                                  config.annealable_defaults(), step)
    else:
        hp = dict(config.annealable_defaults())
        hp.update(hparams)

    batch = images.shape[0]
    cs = config.canvas_size
    images = images.astype(jnp.float32)
    images_2d = images.reshape(batch, cs, cs)

    # mixed precision (config.compute_dtype): the LSTM/head/VAE params are
    # cast per use INSIDE the scan body (_step) so the scan transpose
    # accumulates their per-step cotangents in fp32 — see the _step
    # comment and RESULTS.md round-4 mixed-precision attribution. Only the
    # CNN (a single pre-scan call whose param cotangents don't accumulate
    # across steps) is cast here; its feature output is kept fp32 in the
    # scan closure for the same accumulation reason and re-cast per step.
    # The background parameter stays fp32: it feeds the canvas, whose
    # eps-guarded BCE gradients are bootstrap-critical. Master params and
    # Adam remain fp32 throughout.
    cdt = jnp.dtype(config.compute_dtype)

    # recurrent input: CNN features or the raw flat image every step
    # (reference air/air_model.py:510-535)
    if config.cnn:
        cnn_params = (params["cnn"] if cdt == jnp.float32
                      else jax.tree_util.tree_map(
                          lambda a: a.astype(cdt), params["cnn"]))
        rnn_input = cnn_apply(cnn_params, images.astype(cdt), cs,
                              config.cnn_filters).astype(jnp.float32)
    else:
        rnn_input = images

    if config.rnn_input_hoist:
        # Hoist the invariant input half of the gate matmul out of the
        # recurrence (nn/lstm.py lstm_input_proj — XLA does not split the
        # concat-dot itself). Like the CNN features above, the projection
        # is kept fp32 in the scan closure and re-cast per step: its
        # cotangent accumulates across attention steps, and that sum must
        # stay fp32 (round-4 hoisted-cast regression). W_x is consumed
        # only here (once per image), so casting it outside the scan is
        # policy-consistent.
        lstm_proj_params = (params["lstm"] if cdt == jnp.float32
                            else jax.tree_util.tree_map(
                                lambda a: a.astype(cdt), params["lstm"]))
        rnn_input = lstm_input_proj(
            lstm_proj_params, rnn_input.astype(cdt)).astype(jnp.float32)

    if config.learn_background:
        # harder-scenes extension (models/config.py:learn_background): the
        # canvas starts at the learned static background instead of zeros,
        # so attention steps only need to explain digits
        init_recon = jnp.broadcast_to(
            jax.nn.sigmoid(params["background"]).astype(images.dtype),
            (batch, cs * cs))
    else:
        init_recon = jnp.zeros((batch, cs * cs), images.dtype)
    step_keys = jax.random.split(key, config.max_steps)

    if config.decoder_layout == "stepparallel":
        # Step-parallel decomposition (TPU-native restructuring, no
        # reference counterpart): the LSTM recurrence is AUTONOMOUS — its
        # input is the same encoding every step (reference
        # air/air_model.py:284-286) and nothing downstream (z_pres,
        # stopping) feeds back into its state — so only the tiny
        # [B, units] @ [units+in, 4*units] chain is sequential. The heavy
        # per-step work (heads, sampling, both spatial transforms, the
        # VAE) runs vmapped over steps: XLA batches each weight matmul to
        # [T*B] rows — max_steps-times larger MXU tiles, the weight
        # streamed ONCE instead of per step, and a max_steps-times
        # shorter critical path of small ops. The stop-mask bookkeeping
        # becomes cumulative sums over the step axis (identical masking
        # algebra: pre/post stopping_sum from cumsum of 1 - z_pres).
        # Per-step RNG keys are split exactly as the scan path, so all
        # sampled draws are bit-identical; only reduction/batching order
        # differs (same numerics class as scan_unroll — NOT pinned for
        # the raw-pixel bootstrap, see pin_raw_pixel_numerics).
        if config.st_impl != "xla":
            raise ValueError("decoder_layout='stepparallel' requires "
                             "st_impl='xla' (the Pallas write kernel is "
                             "fused with the sequential canvas carry)")

        def lstm_body(lstm_state, _):
            lstm_cast = jax.tree_util.tree_map(lambda a: a.astype(cdt),
                                               params["lstm"])
            if config.rnn_input_hoist:
                out, lstm_state = lstm_apply_hoisted(
                    lstm_cast, lstm_state, rnn_input.astype(cdt))
            else:
                out, lstm_state = lstm_apply(
                    lstm_cast, lstm_state, rnn_input.astype(cdt))
            return lstm_state, out

        _, outputs_T = jax.lax.scan(
            lstm_body, lstm_zero_state(batch, config.rnn_units, cdt),
            None, length=config.max_steps, unroll=config.max_steps)

        a = jax.vmap(
            lambda o, k: _attend(params, config, hp, images_2d, o,
                                 train, k),
            in_axes=(0, 0))(outputs_T, step_keys)     # [T, B, ...] fields

        threshold = hp["stopping_threshold"]
        one_minus_zp = 1.0 - a.z_pres                  # [T, B]
        stopping_post = jnp.cumsum(one_minus_zp, axis=0)
        stopping_pre = stopping_post - one_minus_zp
        pre_mask = stopping_pre < threshold            # z_pres-KL mask
        alive = stopping_post < threshold              # all other masks

        running_loss = (
            jnp.sum(jnp.where(pre_mask, a.z_pres_kl, 0.0), axis=0)
            + jnp.sum(jnp.where(alive, a.scale_kl + a.shift_kl + a.vae_kl,
                                0.0), axis=0))
        running_digits = jnp.sum(alive.astype(jnp.int32), axis=0)
        running_recon = init_recon + jnp.sum(
            jnp.where(alive[:, :, None],
                      a.z_pres[:, :, None] * a.window_recon, 0.0), axis=0)
        ys = (a.scale, a.shift, a.z_pres_prob, a.z_pres, a.z_pres_kl,
              a.scale_kl, a.shift_kl, a.vae_kl, a.theta_back, a.vae_recon,
              a.vae_latent)
    else:
        init_carry = (
            lstm_zero_state(batch, config.rnn_units, cdt),
            jnp.zeros((batch,), images.dtype),            # stopping_sum
            init_recon,                                   # running_recon
            jnp.zeros((batch,), images.dtype),            # running_loss
            jnp.zeros((batch,), jnp.int32),               # running_digits
        )

        def body(carry, k):
            return _step(params, config, hp, images_2d, rnn_input, train,
                         carry, k)

        carry, ys = jax.lax.scan(body, init_carry, step_keys,
                                 unroll=config.scan_unroll)
        (_, _, running_recon, running_loss, running_digits) = carry
    (scales, shifts, z_pres_probs, z_pres, z_pres_kls,
     scale_kls, shift_kls, vae_kls, st_back, windows, latents) = ys

    # [T, B, ...] -> [B, T, ...] (reference air/air_model.py:569-578)
    def t2b(a):
        return jnp.moveaxis(a, 0, 1)

    # reconstruction: clip + pixel-wise BCE (reference air/air_model.py:580-590).
    # The log(x + eps) form is load-bearing for training dynamics: at ink
    # pixels where the canvas is (near-)zero, dL/d(recon) ~ 1/eps = 1e9,
    # which — multiplied by the nonzero d(recon)/d(shift,scale) on each
    # attention window's bilinear fringe — is the force that pulls windows
    # toward unexplained ink (the AIR localization bootstrap). A
    # log(max(x, eps)) formulation zeroes that force once the canvas goes
    # blank and the model never recovers (observed: recon stuck at the
    # blank-canvas optimum for 100k+ steps). optimization_barrier blocks
    # the XLA reassociation that otherwise folds the eps away near 1.0
    # (fp32) and produced log(0) = -inf.
    reconstruction = jnp.clip(running_recon, 0.0, 1.0)
    one_minus = jax.lax.optimization_barrier(1.0 - reconstruction)
    reconstruction_loss = -jnp.sum(
        images * jnp.log(reconstruction + RECON_EPS)
        + (1.0 - images) * jnp.log(one_minus + RECON_EPS),
        axis=1)

    per_example_loss = running_loss + reconstruction_loss
    loss = jnp.mean(per_example_loss)
    accuracy = jnp.mean(
        (target_num_digits.astype(jnp.int32) == running_digits)
        .astype(jnp.float32))

    return AIROutputs(
        rec_num_digits=running_digits,
        rec_scales=t2b(scales),
        rec_shifts=t2b(shifts),
        rec_st_back=t2b(st_back),
        rec_windows=t2b(windows),
        rec_latents=t2b(latents),
        z_pres_probs=t2b(z_pres_probs),
        z_pres=t2b(z_pres),
        z_pres_kls=t2b(z_pres_kls),
        scale_kls=t2b(scale_kls),
        shift_kls=t2b(shift_kls),
        vae_kls=t2b(vae_kls),
        reconstruction=reconstruction,
        reconstruction_loss=reconstruction_loss,
        kl_loss=running_loss,
        per_example_loss=per_example_loss,
        loss=loss,
        accuracy=accuracy,
    )


class AIRModel:
    """Convenience object facade over (config, params, forward).

    Mirrors the reference class surface (reference air/air_model.py:11-92):
    construct with a config (all 34 reference kwargs accepted), then call
    ``forward``/``__call__`` to obtain the same outputs the reference exposes
    as graph attributes. Stateless w.r.t. jit: ``forward`` is a pure function
    of (params, images, targets, key).
    """

    def __init__(self, config: AIRConfig | None = None,
                 params: dict | None = None,
                 rng: jax.Array | int = 0, **kwargs):
        if config is None:
            config = AIRConfig(**kwargs)
        elif kwargs:
            config = config.replace(**kwargs)
        self.config = config
        if params is None:
            if isinstance(rng, int):
                rng = jax.random.PRNGKey(rng)
            params = init_air_params(rng, config)
        self.params = params

    def forward(self, images, target_num_digits, key,
                train: bool | None = None, step=None) -> AIROutputs:
        return air_forward(self.params, self.config, images,
                           target_num_digits, key, train=train, step=step)

    __call__ = forward

    @property
    def num_params(self) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(self.params))
