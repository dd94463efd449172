"""AIR model configuration.

``AIRConfig`` mirrors, name-for-name and default-for-default, the full
34-kwarg constructor surface of the reference ``AIRModel.__init__``
(reference air/air_model.py:13-22). Constructor-surface parity is a
BASELINE requirement (SURVEY.md §5 "Config / flag system").

TF-graph-specific knobs (``reuse``, ``scope``) are retained for surface
parity but are inert in JAX: variable sharing is the default (one params
pytree serves both train and eval forwards), so the reference's
two-models-sharing-variables pattern (training.py:87-125) collapses to
calling ``air_forward`` twice with ``train=True/False``.

``annealing_schedules`` uses the reference's dict-of-dicts schema
({init, iters, factor, staircase?, min?, max?, log?}, reference
air/air_model.py:94-121) and may target any float hyperparameter.
"""

from __future__ import annotations

import dataclasses
from typing import Any


def _freeze(obj):
    """Recursively convert dicts/lists to hashable tuples for jit staticness."""
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw(obj):
    """Inverse of _freeze for schedule dicts."""
    if isinstance(obj, tuple) and obj and all(
            isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], str)
            for e in obj):
        return {k: _thaw(v) for k, v in obj}
    return obj


@dataclasses.dataclass(frozen=True)
class AIRConfig:
    # --- structure (reference air/air_model.py:14) ---
    max_steps: int = 3
    max_digits: int = 2
    rnn_units: int = 256
    canvas_size: int = 50
    windows_size: int = 28
    # --- VAE (reference air/air_model.py:15) ---
    vae_latent_dimensions: int = 50
    vae_recognition_units: tuple = (512, 256)
    vae_generative_units: tuple = (256, 512)
    # --- priors (reference air/air_model.py:16-17) ---
    scale_prior_mean: float = -1.0
    scale_prior_variance: float = 0.1
    shift_prior_mean: float = 0.0
    shift_prior_variance: float = 1.0
    vae_prior_mean: float = 0.0
    vae_prior_variance: float = 1.0
    vae_likelihood_std: float = 0.3
    # --- heads (reference air/air_model.py:18) ---
    scale_hidden_units: int = 64
    shift_hidden_units: int = 64
    z_pres_hidden_units: int = 64
    # --- z_pres / stopping (reference air/air_model.py:19) ---
    z_pres_prior_log_odds: float = -2.0
    z_pres_temperature: float = 1.0
    stopping_threshold: float = 0.99
    # --- optimization (reference air/air_model.py:20) ---
    learning_rate: float = 1e-3
    gradient_clipping_norm: float | None = 100.0
    cnn: bool = True
    cnn_filters: int = 8
    # --- bookkeeping (reference air/air_model.py:21) ---
    num_summary_images: int = 60
    train: bool = False
    reuse: bool = False      # inert in JAX (kept for surface parity)
    scope: str = "air"       # inert in JAX (kept for surface parity)
    # --- annealing (reference air/air_model.py:22,94-121) ---
    annealing_schedules: Any = None
    # --- TPU execution knobs (no reference counterpart) ---
    # spatial-transformer implementation: "xla" (separable matmuls),
    # "pallas" (fused kernel streaming XLA-built weights,
    # air_tpu/kernels/st_pallas.py), or "inline" (in-kernel hat-form weight
    # construction from scalars, air_tpu/kernels/st_inline.py)
    st_impl: str = "xla"
    # off-support ST boundary semantics: "zeros" (true zero padding with
    # off-support coordinate gradients — required for the localization
    # bootstrap, see ops/transformer.py) or "clamp_cancel" (the reference's
    # exact quirk; value-identical except a 1-px band, but gradient-dead
    # off-support — training collapses)
    st_pad_mode: str = "zeros"
    # Adam moment STORAGE dtype ("float32" | "bfloat16"). The default-config
    # b64 fused step is latency/HBM-bound on weight+optimizer traffic
    # (RESULTS.md batch-scaling: ~0.35 ms batch-independent cost); storing
    # mu AND nu in bf16 halves the optimizer-state traffic. Update math
    # stays fp32 (moments are promoted per step) — see
    # air_tpu.train.state.scale_by_adam_stored.
    adam_storage_dtype: str = "float32"
    # unroll factor for the max_steps attention scan (jax.lax.scan unroll=):
    # at tiny trip counts (3-5) unrolling removes per-iteration loop
    # overhead and widens XLA's fusion scope. 1 = rolled (default).
    scan_unroll: int = 1
    # Mixed-precision COMPUTE dtype ("float32" | "bfloat16") for the
    # matmul-heavy submodules: CNN, LSTM, heads, and VAE run with bf16
    # params/activations (halving their HBM/VMEM traffic — the MXU already
    # multiplies in bf16 at DEFAULT precision, so this is a bandwidth
    # lever, not a FLOPs one). Everything numerics-critical stays fp32:
    # head OUTPUTS are promoted before sampling, the VAE's latent /
    # likelihood sampling (nn/vae.py), every KL, the spatial transformer,
    # the canvas accumulation, and the eps-guarded BCE (models/air.py
    # bootstrap analysis). Master params and Adam stay fp32, and the
    # casts live INSIDE the attention scan body so the per-step parameter
    # cotangents are summed in fp32 (a hoisted cast makes that cross-step
    # accumulation bf16 and cost 3/10 seeds — RESULTS.md round-4
    # mixed-precision section has the A/B evidence).
    compute_dtype: str = "float32"
    # Decoder layout ("scan" | "stepparallel"). "scan" is the reference-
    # shaped sequential attention loop. "stepparallel" exploits that the
    # AIR recurrence is AUTONOMOUS (constant RNN input each step, no
    # z_pres feedback into the LSTM state): only the tiny LSTM chain runs
    # sequentially; heads/sampling/STs/VAE are vmapped over steps so XLA
    # batches every weight matmul to [max_steps*B] rows (bigger MXU
    # tiles, each weight streamed once per iteration, max_steps-times
    # shorter small-op critical path), and the stop masks become cumsums.
    # Sampled draws are bit-identical to the scan path (same per-step
    # keys); batching/reduction order differs, so this is a fusion-
    # numerics knob like scan_unroll (models/air.py stepparallel branch).
    decoder_layout: str = "scan"
    # Hoist the invariant input half of the LSTM gate matmul out of the
    # recurrence (nn/lstm.py lstm_input_proj): AIR re-feeds the SAME
    # image encoding every attention step, but XLA does not split the
    # concat-dot to exploit it — the full [B, in+units] @ [in+units, 4u]
    # dot sits inside the compiled while body (verified on optimized
    # HLO, round 5). With the hoist, x @ W_x + b runs once per image and
    # only the [units, 4u] recurrent half is read per step — removing
    # ~2/3 of the model's dominant weight stream in the scaled config
    # and shortening the sequential critical path under stepparallel.
    # Exact algebra up to reassociation (x@Wx + b + h@Wh vs concat@W+b):
    # the scan_unroll fusion-numerics class, so it follows the same
    # convergence-evidence policy before any default flip.
    rnn_input_hoist: bool = False
    # harder-scenes extension (no reference counterpart): learn a static
    # background canvas. The generator composites ONE background texture
    # into every image (reference multi_mnist.py:319-334: read once, added
    # to each canvas); plain AIR can only explain it by spending z_pres
    # steps on background patches, which destroys counting (RESULTS.md
    # harder-scenes analysis). With this flag the reconstruction canvas is
    # initialized to sigmoid(params["background"]) instead of zeros, so the
    # static background is absorbed by a dedicated parameter and attention
    # steps stay digit-only.
    learn_background: bool = False
    # Oracle knob for background-failure attribution: freeze
    # params["background"] at its init (its gradient is zeroed BEFORE
    # global-norm clipping, so a frozen background influences nothing).
    # With --bg-init data the init is the exact composited texture on
    # deterministic-compositing datasets, so freeze_background trains
    # against a PERFECT, immovable background — if counting still fails,
    # the failure is an information ceiling of the composited scenes, not
    # background-learning optimization (RESULTS.md abstract1 oracle).
    freeze_background: bool = False

    def __post_init__(self):
        object.__setattr__(self, "vae_recognition_units",
                           tuple(self.vae_recognition_units))
        object.__setattr__(self, "vae_generative_units",
                           tuple(self.vae_generative_units))
        if isinstance(self.annealing_schedules, dict):
            object.__setattr__(self, "annealing_schedules",
                               _freeze(self.annealing_schedules))
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype must be 'float32' or "
                             f"'bfloat16', got {self.compute_dtype!r}")
        if self.decoder_layout not in ("scan", "stepparallel"):
            raise ValueError(f"decoder_layout must be 'scan' or "
                             f"'stepparallel', got {self.decoder_layout!r}")

    @property
    def schedules(self) -> dict:
        """Annealing schedules as a plain dict (possibly empty)."""
        if self.annealing_schedules is None:
            return {}
        return _thaw(self.annealing_schedules)

    @property
    def rnn_input_dim(self) -> int:
        if self.cnn:
            return (self.canvas_size // 4) ** 2 * self.cnn_filters
        return self.canvas_size ** 2

    # Hyperparameters eligible for annealing, with their static defaults —
    # the counterpart of the reference's setattr mechanism
    # (air/air_model.py:76-82) restricted to loss-relevant scalars.
    def annealable_defaults(self) -> dict:
        return {
            "z_pres_prior_log_odds": self.z_pres_prior_log_odds,
            "z_pres_temperature": self.z_pres_temperature,
            "stopping_threshold": self.stopping_threshold,
            "learning_rate": self.learning_rate,
            "vae_likelihood_std": self.vae_likelihood_std,
            "scale_prior_mean": self.scale_prior_mean,
            "scale_prior_variance": self.scale_prior_variance,
            "shift_prior_mean": self.shift_prior_mean,
            "shift_prior_variance": self.shift_prior_variance,
            "vae_prior_mean": self.vae_prior_mean,
            "vae_prior_variance": self.vae_prior_variance,
        }

    def replace(self, **kw) -> "AIRConfig":
        return dataclasses.replace(self, **kw)


# The default training configuration of the reference driver
# (reference training.py:100-123), including the z_pres prior log-odds
# annealing 1e4 -> 1e-9 over the first ~40k iterations (README.md:18).
DEFAULT_TRAINING_CONFIG = AIRConfig(
    max_steps=3, max_digits=2, rnn_units=256, canvas_size=50, windows_size=28,
    vae_latent_dimensions=50, vae_recognition_units=(512, 256),
    vae_generative_units=(256, 512),
    scale_prior_mean=-1.0, scale_prior_variance=0.05,
    shift_prior_mean=0.0, shift_prior_variance=1.0,
    vae_prior_mean=0.0, vae_prior_variance=1.0, vae_likelihood_std=0.3,
    scale_hidden_units=64, shift_hidden_units=64, z_pres_hidden_units=64,
    z_pres_prior_log_odds=-0.01, z_pres_temperature=1.0,
    stopping_threshold=0.99,
    learning_rate=1e-4, gradient_clipping_norm=1.0, cnn=False, cnn_filters=8,
    num_summary_images=60, train=True,
    # TPU-side performance defaults (round-3 step-cost attack, RESULTS.md):
    # fully unroll the max_steps=3 attention scan (XLA fuses across AIR
    # steps; 0.49 -> 0.34 ms at b64) and store Adam moments in bf16
    # (fp32 update math — state.scale_by_adam_stored; 1.65x with unroll at
    # the HBM-bound scaled config). Neither changes model semantics; the
    # CPU reference-stand-in baseline pins fp32/rolled (bench.py).
    # CONVERGENCE CAVEAT: when TRAINING with the raw-pixel encoder
    # (cnn=False, as here), apply pin_raw_pixel_numerics() — the unrolled
    # scan's fusion numerics collapse that config's localization
    # bootstrap (RESULTS.md round-3 unroll attribution). All shipped
    # drivers do this automatically; the CNN robust default is
    # insensitive and keeps the fast numerics.
    scan_unroll=3, adam_storage_dtype="bfloat16",
    annealing_schedules={
        "z_pres_prior_log_odds": {
            "init": 10000.0, "min": 0.000000001,
            "factor": 0.1, "iters": 3000,
            "staircase": False, "log": True,
        },
    },
)


def pin_raw_pixel_numerics(cnn: bool, adam_dtype: str | None = None,
                           unroll: int | None = None) -> dict:
    """Config overrides enforcing reference-exact numerics for the
    fragile raw-pixel bootstrap.

    Three 10-seed raw-pixel sweeps with ``scan_unroll=3`` collapsed to
    0-1/10 converged vs 5/10 rolled — the unrolled scan's wider fusion
    scope perturbs the scale/shift-head gradients during the bootstrap
    window and the trajectory lands in the degenerate constant-count
    basin (RESULTS.md, round-3 unroll attribution). The CNN encoder is
    insensitive (converges *faster* unrolled), so only ``cnn=False``
    pins; explicit ``adam_dtype``/``unroll`` overrides always win.

    Returns kwargs for ``AIRConfig.replace`` — used by ``training.py``
    and both seed sweepers.
    """
    if not cnn:
        if unroll is None:
            unroll = 1
        if adam_dtype is None:
            adam_dtype = "float32"
    out = {}
    if adam_dtype is not None:
        out["adam_storage_dtype"] = adam_dtype
    if unroll is not None:
        out["scan_unroll"] = unroll
    return out
