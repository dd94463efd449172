"""Training driver.

The reference's ``training.py`` re-imagined for JAX/TPU, feature-complete:
  * results folder layout with auto-renaming or overwrite
    (reference training.py:42-62) + source snapshot provenance (63-71)
  * tiered summary cadence 50/250/500 on the FULL test set through the
    eval model, grad summaries every 100 on the train model
    (reference training.py:20-26,167-218)
  * checkpoints every 10k with ``max_to_keep=10000``
    (reference training.py:141,203-207) — plus restore-or-init resume,
    which the reference lacks
  * per-iteration stdout line (reference training.py:226)

One jitted step per iteration; data prefetched to device (depth 2).
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from air_tpu.models.config import AIRConfig
from air_tpu.train.state import create_train_state
from air_tpu.train.steps import make_train_step, make_eval_step
from air_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, latest_checkpoint, checkpoint_meta)
from air_tpu.train.metrics import MetricsWriter, summarize_outputs
from air_tpu.train.visualize import visualize_reconstructions, save_grid_png
from air_tpu.data.loader import TrainLoader


@dataclasses.dataclass
class TrainerConfig:
    results_folder: str = "air_results"
    overwrite_results: bool = False
    batch_size: int = 64
    epochs: int | None = 300
    max_iterations: int | None = None        # extra stop knob (reference: epochs only)
    stop_at_accuracy: float | None = None    # stop once test accuracy >= this
    # -- stall detection / auto-recovery (failure-recovery subsystem) --------
    # AIR training has a known degenerate-counting basin (RESULTS.md stall
    # analysis): the run pins DEAD FLAT at ~0.63 accuracy (a degenerate
    # counting code with excellent reconstruction) while healthy slow
    # convergers keep climbing through the same absolute level. Detection
    # is therefore slope-based: from stall_detect_step on, a run is
    # declared stalled when accuracy is below stall_accuracy AND has
    # improved less than stall_min_progress over the last stall_window
    # steps; it restarts from a fresh re-seeded init (annealing clock
    # included), bounded by max_restarts. stall_window=0 degrades to a
    # pure absolute threshold. None/0 detect step disables.
    stall_detect_step: int | None = None
    stall_accuracy: float = 0.95
    stall_window: int = 20000
    stall_min_progress: float = 0.01
    # a run at/above this accuracy is spared from restart/give-up — it is
    # in the good basin, just slow (see is_stalled docstring)
    stall_spare_accuracy: float = 0.85
    max_restarts: int = 3
    # Restart schedule ROTATION: on the n-th auto-restart, overlay
    # restart_schedule_rotation[(n-1) % len] onto the model config's
    # annealing_schedules (value None deletes a key) and rebuild the train
    # step. The stall basins respond to different bootstrap schedules
    # (RESULTS.md remedy matrix: hold rescues tiling/swallowing seeds,
    # the reference schedule rescues slow-convergers the hold traps), so
    # re-seeding alone under-uses the restart budget. Empty = re-seed only.
    # Evaluation always runs at the BASE config (comparable accuracy).
    # Recovery bookkeeping (attempt index, active schedule variant, eval
    # history) is persisted in the checkpoint sidecar JSON, so a process
    # killed mid-rescue resumes the SAME attempt: rotated schedule,
    # remaining restart budget, and stall history all restored
    # (tests/test_train.py::test_resume_mid_rescue).
    restart_schedule_rotation: tuple = ()
    # Stride for attempt_seed: the n-th restart trains at
    # seed + stride * n. Restart seeds are DERIVED, so two rescue runs of
    # the same base seed retry the exact same attempt sequence; a rescue
    # campaign that has exhausted one sequence can pass a different stride
    # to explore fresh (init, data-order) attempts (RESULTS.md seed-8).
    attempt_seed_stride: int = 1009
    # When the restart budget is exhausted and the run stalls AGAIN, stop
    # early (report the stalled accuracy) instead of burning the remaining
    # max_iterations on a provably dead attempt.
    stop_on_exhausted_restarts: bool = True
    num_summaries_every: int = 50            # reference training.py:20
    var_summaries_every: int = 250           # reference training.py:21
    img_summaries_every: int = 500           # reference training.py:22
    grad_summaries_every: int = 100          # reference training.py:24
    save_params_every: int = 10000           # reference training.py:25
    num_images_to_save: int = 60             # reference training.py:26
    eval_batch_size: int = 1000
    seed: int = 0
    log_every: int = 1                       # stdout cadence
    source_snapshot: bool = True
    tensorboard: bool = False
    resume: bool = True
    # device-resident pipeline: dataset in HBM, K steps fused per dispatch
    # (air_tpu/train/fast_pipeline.py) — the TPU-native input path
    device_data: bool = False
    multi_step: int = 50
    # unroll factor for the K-step pipeline scan: fuses across optimizer
    # steps, attacking the batch-independent param/moment HBM round-trip
    # per inner step (RESULTS.md). 1 = reference-exact rolled numerics.
    pipeline_unroll: int = 1
    # data parallelism: shard batches over the mesh's "data" axis
    # (air_tpu/parallel); n_devices=None -> all visible devices
    data_parallel: bool = False
    n_devices: int | None = None
    # host-loader gather threads (native C++ backend; reference
    # training.py:38 -t/--reader-threads)
    reader_threads: int = 4
    # background-intensity curriculum (harder scenes): composite
    # clip(images + s(step) * bg_image, 0, 1) inside the jitted train step,
    # with s ramped per bg_schedule ({target, start, ramp}; see
    # air_tpu.train.steps.bg_intensity). Train data should be the CLEAN
    # variant of the dataset; test data the composited one.
    bg_image: object = None
    bg_schedule: dict | None = None
    # learn_background parameter init: None -> blank sigmoid(-4) canvas;
    # "data" -> estimate the texture from the train set (mean of 0-digit
    # scenes, else per-pixel min — air_tpu.data.backgrounds.
    # estimate_background) or, under the curriculum, from
    # target * bg_image; or an explicit pixel-space [canvas**2] array.
    # With an exact init the bootstrap never has to DISCOVER the texture:
    # 0-digit scenes reconstruct perfectly at step 0 and attention only
    # ever sees unexplained digit ink (the round-3 harder-scenes remedy).
    background_init: object = None

    def __post_init__(self):
        # stride 0 would make every auto-restart reuse the base seed,
        # silently burning the whole restart budget on identical attempts
        if self.attempt_seed_stride == 0:
            raise ValueError("attempt_seed_stride must be nonzero (0 would "
                             "retry the identical attempt every restart)")


# Built-in rotation for restart_schedule_rotation: remedies from the
# RESULTS.md stall matrix, ordered by observed rescue power. The base
# attempt runs whatever the model config says (default candidate:
# hold-15k, RESULTS.md); restarts then try:
DEFAULT_RESTART_ROTATION = (
    # 1st restart: the unmodified reference schedule (the only variant
    # with a confirmed rescue so far — sweep_r2 seed 4 converged on it
    # after both hold attempts stalled; also rescues slow-convergers the
    # grace window traps in a tiling code)
    {"z_pres_prior_log_odds": {"init": 1e4, "min": 1e-9, "factor": 0.1,
                               "iters": 3000, "log": True}},
    # 2nd restart: scale-prior curriculum — start the prior at mean 0
    # (25px windows) and decay to the reference -1 (13-19px). The dominant
    # basin is scale-degenerate counting (tiling a digit with two small
    # windows / swallowing a pair with one large one, RESULTS.md), so walk
    # the window-size prior from coarse to fine while keeping the hold.
    {"scale_prior_mean": {"init": 1.0, "min": 0.0, "factor": 0.5,
                          "iters": 5000, "offset": -1.0}},
    # 3rd restart: keep the hold, anneal the Concrete temperature 5 -> 1
    # (soft early z_pres decisions against the prob-pinned-at-0.5 basin)
    {"z_pres_temperature": {"init": 5.0, "min": 1.0, "factor": 0.5,
                            "iters": 5000, "log": False}},
    # 4th restart: double grace window + temperature anneal
    {"z_pres_prior_log_odds": {"init": 1e4, "min": 1e-9, "factor": 0.1,
                               "iters": 3000, "log": True, "hold": 30000},
     "z_pres_temperature": {"init": 5.0, "min": 1.0, "factor": 0.5,
                            "iters": 5000, "log": False}},
    # 5th restart: reference schedule + temperature anneal
    {"z_pres_prior_log_odds": {"init": 1e4, "min": 1e-9, "factor": 0.1,
                               "iters": 3000, "log": True},
     "z_pres_temperature": {"init": 5.0, "min": 1.0, "factor": 0.5,
                            "iters": 5000, "log": False}},
)


def is_stalled(history, step: int, acc: float, detect_step,
               stall_accuracy: float, window: int,
               min_progress: float, spare_accuracy: float = 0.0) -> bool:
    """Slope-based stall predicate (pure; shared by Trainer auto-recovery
    and the seed-parallel sweeper): stalled iff past ``detect_step``,
    below ``stall_accuracy``, AND — when ``window`` > 0 — improved less
    than ``min_progress`` over the last ``window`` steps of ``history``
    ([(step, acc), ...] for the CURRENT attempt).

    Progress over the window is estimated TWO ways, and either spares:
      1. point-to-point: ``acc`` minus the last eval at/before
         ``step - window``;
      2. a least-squares slope fit over ALL evals in the window, scaled
         to the window length.
    The point estimate alone misfires on gradual-progress regimes: one
    noisy eval dip at the measurement instant reads as "flat" even on a
    monotonic climb (the round-3 bg-1.0 run's rotation fired 3 times on
    slow-but-steady progress, RESULTS.md). The regression slope uses
    every eval in the window and is robust to single-point noise.

    ``spare_accuracy``: a run at/above this accuracy is in the GOOD
    basin (merely converging slowly), never the degenerate-counting one
    (0.62-0.68 at the default config, RESULTS.md) — declaring it stalled
    would throw away a near-converged model (restart) or abandon a
    climbing run (give-up), both observed in the round-3 harder-scenes
    campaign (portrait1 cut at 0.945, bg1.0 at 0.947). 0 disables."""
    if not detect_step or step < detect_step or acc >= stall_accuracy:
        return False
    if spare_accuracy and acc >= spare_accuracy:
        return False
    if window:
        past = [a for s, a in history if s <= step - window]
        if not past:
            return False                 # not enough history yet
        if acc - past[-1] >= min_progress:
            return False                 # still climbing — not stalled
        # regression slope over the window (include the current point in
        # case the caller's history snapshot does not already carry it)
        pts = [(s, a) for s, a in history if s >= step - window]
        if not pts or pts[-1][0] != step:
            pts.append((step, acc))
        if len(pts) >= 3:
            xs = np.asarray([s for s, _ in pts], np.float64)
            ys = np.asarray([a for _, a in pts], np.float64)
            xs -= xs.mean()
            denom = float((xs * xs).sum())
            if denom > 0:
                slope = float((xs * (ys - ys.mean())).sum()) / denom
                if slope * window >= min_progress:
                    return False         # climbing through the noise
    return True


def cadence_hit(step: int, every) -> bool:
    """True when ``step`` lands on the cadence; 0/None = disabled (the
    cadences filter and tests' 10**9 workaround both treat 0 as off —
    a bare ``step % every`` would raise ZeroDivisionError)."""
    return bool(every) and every > 0 and step % every == 0


def attempt_seed(base_seed: int, attempt: int, stride: int = 1009) -> int:
    """Derived seed for the n-th auto-restart attempt (params AND data
    order — the stall basin is partly data-order-driven, RESULTS.md).
    ``stride`` must be nonzero: stride 0 would retry the identical
    attempt every restart, burning the budget on replays."""
    if stride == 0:
        raise ValueError("attempt_seed stride must be nonzero")
    return base_seed + stride * attempt


def prepare_results_folder(cfg: TrainerConfig) -> str:
    """Create results dirs; auto-rename unless overwriting
    (reference training.py:42-62)."""
    folder = cfg.results_folder
    if os.path.exists(folder):
        if cfg.overwrite_results:
            shutil.rmtree(folder, ignore_errors=True)
        elif not cfg.resume or latest_checkpoint(
                os.path.join(folder, "models")) is None:
            base, i = folder, 0
            folder = f"{base}_{i}"
            while os.path.exists(folder):
                i += 1
                folder = f"{base}_{i}"
    for sub in ("models", "summary", "source"):
        os.makedirs(os.path.join(folder, sub), exist_ok=True)
    return folder


def snapshot_source(folder: str):
    """Copy the framework source next to the results — cheap provenance
    (reference training.py:63-71)."""
    import air_tpu
    src_root = os.path.dirname(os.path.abspath(air_tpu.__file__))
    dst = os.path.join(folder, "source", "air_tpu")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src_root, dst,
                    ignore=shutil.ignore_patterns("__pycache__", "*.so"))


class Trainer:
    def __init__(self, model_config: AIRConfig, trainer_config: TrainerConfig,
                 train_data, test_data):
        """``train_data``: AIRREC path or (images, digits);
        ``test_data``: (images [N, canvas^2], digits [N]) numpy arrays."""
        self.config = model_config.replace(train=True)
        # the ACTIVE training config: starts as the base config; restart
        # schedule rotation replaces it per attempt. Evaluation always
        # uses self.config so accuracies stay comparable across attempts.
        self.train_config = self.config
        self.tcfg = trainer_config
        self.folder = prepare_results_folder(trainer_config)
        self.models_dir = os.path.join(self.folder, "models")
        self.summary_dir = os.path.join(self.folder, "summary")
        if trainer_config.source_snapshot:
            snapshot_source(self.folder)

        self.device = jax.devices()[0]
        self.mesh = None
        if trainer_config.data_parallel:
            from air_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(trainer_config.n_devices)
        if trainer_config.device_data:
            from air_tpu.train.fast_pipeline import DeviceDataPipeline
            if isinstance(train_data, str):
                from air_tpu.data.records import read_records
                rec = read_records(train_data)
                train_data = (rec["images"], rec["digits"])
            if self.mesh is not None:
                # dataset replicated across the mesh; each device gathers
                # its slice of every batch inside the sharded multi-step
                from air_tpu.parallel.mesh import replicated
                device = replicated(self.mesh)
            else:
                device = self.device
            self.loader = DeviceDataPipeline(
                train_data[0], train_data[1], trainer_config.batch_size,
                seed=trainer_config.seed, device=device)
        else:
            if self.mesh is not None:
                from air_tpu.parallel.train_parallel import shard_batch
                put = lambda b: shard_batch(self.mesh, *b)  # noqa: E731
            else:
                put = lambda b: jax.device_put(b, self.device)  # noqa: E731
            self.loader = TrainLoader(
                train_data, trainer_config.batch_size,
                epochs=trainer_config.epochs, seed=trainer_config.seed,
                prefetch=2, device_put=put,
                reader_threads=trainer_config.reader_threads)
        self.test_images, self.test_digits = test_data

        # resolve the learn_background init (TrainerConfig.background_init)
        self._bg_init = None
        bg_cfg = trainer_config.background_init
        if self.config.learn_background and bg_cfg is not None:
            if isinstance(bg_cfg, str) and bg_cfg == "data":
                from air_tpu.data.backgrounds import estimate_background
                if trainer_config.bg_image is not None:
                    # curriculum runs train on CLEAN data with the texture
                    # composited on device — the steady-state background is
                    # target * bg_image, known exactly
                    target = float((trainer_config.bg_schedule or {})
                                   .get("target", 1.0))
                    self._bg_init = np.clip(
                        target * np.asarray(trainer_config.bg_image,
                                            np.float32).reshape(-1), 0., 1.)
                elif trainer_config.device_data:
                    self._bg_init = estimate_background(*train_data)
                else:
                    self._bg_init = estimate_background(
                        self.loader.images, self.loader.digits)
            else:
                self._bg_init = np.asarray(bg_cfg, np.float32).reshape(-1)

        self._bg_kw = {"bg_image": trainer_config.bg_image,
                       "bg_schedule": trainer_config.bg_schedule}
        self._build_train_steps()
        self.eval_step = make_eval_step(self.config)
        self.metrics = MetricsWriter(self.summary_dir,
                                     tensorboard=trainer_config.tensorboard)

        # -- stall auto-recovery bookkeeping (persisted in checkpoints) --
        self.restarts = 0            # auto-restarts consumed so far
        self._variant = -1           # rotation index of the ACTIVE attempt
        self._eval_history = []      # [(step, acc)] of the current attempt

        self.state = create_train_state(self.config, rng=trainer_config.seed,
                                        background_init=self._bg_init)
        if trainer_config.resume:
            ckpt = latest_checkpoint(self.models_dir)
            if ckpt:
                meta = checkpoint_meta(ckpt)
                self.state = load_checkpoint(ckpt, self.config, self.loader,
                                             meta=meta)
                print(f"resumed from {ckpt} at step {int(self.state.step)}")
                rec = meta.get("recovery")
                if rec:
                    # resume the SAME rescue attempt: restart budget, eval
                    # history (the stall slope window), and the rotated
                    # schedule the attempt was training under
                    self.restarts = int(rec.get("restarts", 0))
                    self._eval_history = [tuple(p) for p in
                                          rec.get("eval_history", [])]
                    variant = int(rec.get("variant", -1))
                    if variant >= 0 and trainer_config \
                            .restart_schedule_rotation:
                        self._apply_rotation_variant(variant)
                        self._build_train_steps()
                    print(f"resumed recovery state: restarts="
                          f"{self.restarts} variant={self._variant}")
        if self.mesh is not None:
            from air_tpu.parallel.mesh import shard_state
            self.state = shard_state(self.mesh, self.state)

    def _build_train_steps(self):
        """(Re)build the jitted train steps from ``self.train_config`` —
        called at init and whenever a restart rotates the schedule."""
        bg_kw = self._bg_kw
        if self.mesh is not None:
            from air_tpu.parallel.train_parallel import (
                make_parallel_train_step, shard_batch)
            self.train_step = make_parallel_train_step(
                self.train_config, self.mesh, **bg_kw)
            self.train_step_gs = make_parallel_train_step(
                self.train_config, self.mesh, donate=False,
                with_grad_stats=True, **bg_kw)
            self._shard = lambda im, tg: shard_batch(self.mesh, im, tg)
        else:
            self.train_step = make_train_step(self.train_config, **bg_kw)
            self.train_step_gs = make_train_step(self.train_config,
                                                 with_grad_stats=True,
                                                 donate=False, **bg_kw)
            self._shard = None

    def _apply_rotation_variant(self, variant: int):
        """Overlay rotation variant ``variant`` onto the BASE annealing
        schedules, producing the active ``self.train_config``."""
        rotation = self.tcfg.restart_schedule_rotation
        overlay = rotation[variant % len(rotation)]
        sched = self.config.schedules        # thawed plain dict
        for name, spec in overlay.items():
            if spec is None:
                sched.pop(name, None)
            else:
                sched[name] = spec
        self.train_config = self.config.replace(annealing_schedules=sched)
        self._variant = variant % len(rotation)

    def recovery_meta(self) -> dict | None:
        """Recovery bookkeeping for the checkpoint sidecar (None when the
        run has never restarted and detection is off — keeps sidecars
        clean for plain runs)."""
        if self.restarts == 0 and not self.tcfg.stall_detect_step:
            return None
        return {"restarts": self.restarts, "variant": self._variant,
                "eval_history": [[int(s), float(a)]
                                 for s, a in self._eval_history]}

    # -- stall detection / auto-recovery ---------------------------------------
    def _maybe_restart_on_stall(self, step: int, acc: float) -> str | None:
        """``"restart"`` -> the run was declared stalled and state/loader
        were reset to a fresh re-seeded attempt (annealing clock restarts
        with state.step = 0; schedule rotated if configured;
        ``self.restarts`` incremented). ``"giveup"`` -> stalled again with
        the restart budget exhausted (stop_on_exhausted_restarts).
        ``None`` -> keep training."""
        tcfg = self.tcfg
        if not tcfg.stall_detect_step:
            return None
        restarts = self.restarts
        self._eval_history.append((step, acc))
        if not is_stalled(self._eval_history, step, acc,
                          tcfg.stall_detect_step, tcfg.stall_accuracy,
                          tcfg.stall_window, tcfg.stall_min_progress,
                          tcfg.stall_spare_accuracy):
            return None
        if restarts >= tcfg.max_restarts:
            if tcfg.stop_on_exhausted_restarts:
                print(f"[stall detected @ {step}] accuracy {acc:.3f} flat "
                      f"with restart budget exhausted — giving up early")
                return "giveup"
            return None
        print(f"[stall detected @ {step}] test accuracy {acc:.3f} < "
              f"{tcfg.stall_accuracy}; restarting (attempt "
              f"{restarts + 2}/{tcfg.max_restarts + 1})")
        # archive the stalled attempt's checkpoints so resume never picks a
        # stale higher-step file from a failed attempt
        stale = [f for f in os.listdir(self.models_dir)
                 if f.startswith("air-model")]
        if stale:
            attempt_dir = os.path.join(self.models_dir,
                                       f"stalled_attempt_{restarts + 1}")
            os.makedirs(attempt_dir, exist_ok=True)
            for f in stale:
                shutil.move(os.path.join(self.models_dir, f),
                            os.path.join(attempt_dir, f))
        # schedule rotation: overlay this attempt's variant onto the BASE
        # annealing schedules (None value deletes a key); the caller
        # rebuilds its jitted train step from self.train_config
        rotation = tcfg.restart_schedule_rotation
        if rotation:
            self._apply_rotation_variant(restarts)
            print(f"[restart] schedule variant {self._variant}: "
                  f"{sorted(rotation[self._variant])}")
        new_seed = attempt_seed(tcfg.seed, restarts + 1,
                                tcfg.attempt_seed_stride)
        # durable record of the recovery event (stdout is often swallowed
        # by wrappers): attempt index, the accuracy it died at, and which
        # schedule variant the next attempt runs
        self.metrics.write(step, {
            "attempt_ended": restarts + 1, "stalled_accuracy": acc,
            "next_variant": (restarts % len(rotation)) if rotation else -1,
        }, prefix="recovery/")
        self.state = create_train_state(self.train_config, rng=new_seed,
                                        background_init=self._bg_init)
        if self.mesh is not None:
            from air_tpu.parallel.mesh import shard_state
            self.state = shard_state(self.mesh, self.state)
        # restart the data position AND re-seed the DATA ORDER: epoch
        # permutations are keyed by the loader seed, so re-seeding params
        # alone replays the identical early-batch sequence every attempt —
        # and the degenerate-counting basin is partly data-order-driven
        # (sweep_r2: seeds whose first attempt stalled tended to stall on
        # every re-seeded attempt)
        self.loader.reseed(new_seed)
        self._eval_history = []
        self.restarts = restarts + 1
        return "restart"

    # -- summary helpers -------------------------------------------------------
    def _write_var_summaries(self, step: int):
        """Per-variable scalar stats (JSONL) + true histograms (TB sink);
        reference air/air_model.py:643-649."""
        from air_tpu.train.metrics import variable_summaries, named_leaves
        self.metrics.write(step, variable_summaries(self.state.params),
                           prefix="var/")
        if self.tcfg.tensorboard:
            self.metrics.write_histograms(
                step, named_leaves(self.state.params), prefix="var/")

    def _write_grad_summaries(self, step: int, metrics: dict):
        """Pre/post-clip grad stats (JSONL) + true histograms (TB sink);
        reference air/air_model.py:658-687. Pops the heavyweight entries
        from ``metrics`` in place."""
        from air_tpu.train.metrics import named_leaves
        grad_tensors = metrics.pop("grad_tensors", None)
        self.metrics.write(step, metrics.pop("grad_stats"), prefix="grad/")
        if self.tcfg.tensorboard and grad_tensors is not None:
            hists = {}
            for kind, tree in grad_tensors.items():
                for name, arr in named_leaves(tree).items():
                    hists[f"{name}_grad_{kind}"] = arr
            self.metrics.write_histograms(step, hists, prefix="grad/")

    # -- evaluation over the full test set in fixed-size chunks ---------------
    def evaluate(self, step: int):
        from air_tpu.train.evaluate import evaluate_params
        key = self._eval_key(step)
        return evaluate_params(self.eval_step, self.state.params,
                               self.test_images, self.test_digits,
                               batch_size=self.tcfg.eval_batch_size,
                               key=key, step=step)

    def _eval_key(self, step: int):
        return jax.random.fold_in(
            jax.random.PRNGKey(self.tcfg.seed ^ 0x5EED), step)

    def write_eval_summaries(self, step: int, with_images: bool):
        n = len(self.test_images)
        if n <= self.tcfg.eval_batch_size and self.mesh is None:
            # fast path: eval + full metric taxonomy fused in ONE device
            # program; only scalars come back over the (slow) tunnel
            if not hasattr(self, "_eval_summary_step"):
                from air_tpu.train.steps import make_eval_summary_step
                self._eval_summary_step = make_eval_summary_step(self.config)
                self._test_dev = (
                    jax.device_put(np.asarray(self.test_images, np.float32)),
                    jax.device_put(np.asarray(self.test_digits, np.int32)))
            summ = jax.device_get(self._eval_summary_step(
                self.state.params, *self._test_dev,
                jax.random.fold_in(self._eval_key(step), 0),
                jnp.asarray(step, jnp.int32)))
        else:
            out = self.evaluate(step)
            summ = summarize_outputs(out, self.test_digits,
                                     self.config.max_steps,
                                     self.config.max_digits)
        self.metrics.write(step, summ, prefix="test/")
        if with_images:
            k = min(self.tcfg.num_images_to_save, n)
            out_k = self.eval_step(
                self.state.params,
                jnp.asarray(np.asarray(self.test_images[:k], np.float32)),
                jnp.asarray(np.asarray(self.test_digits[:k], np.int32)),
                self._eval_key(step), jnp.asarray(step, jnp.int32))
            grid = visualize_reconstructions(
                self.test_images[:k], out_k.reconstruction,
                out_k.rec_st_back, out_k.rec_num_digits,
                self.config.canvas_size, self.config.windows_size, zoom=2)
            save_grid_png(os.path.join(self.summary_dir,
                                       f"reconstruction_{step}.png"), grid)
        return float(summ["accuracy"])

    # -- device-resident loop ---------------------------------------------------
    def _train_device_data(self):
        """Steady-state loop with zero per-step host traffic: K steps fused
        per dispatch, batches gathered from HBM inside the scan."""
        from air_tpu.train.fast_pipeline import (
            make_multi_step, make_parallel_multi_step)
        tcfg = self.tcfg
        K = tcfg.multi_step

        bg_kw = {"bg_image": tcfg.bg_image, "bg_schedule": tcfg.bg_schedule}

        def build_steps(cfg):
            pu = {"pipeline_unroll": tcfg.pipeline_unroll}
            if self.mesh is not None:
                return (make_parallel_multi_step(cfg, K, tcfg.batch_size,
                                                 self.mesh, **bg_kw, **pu),
                        make_parallel_multi_step(cfg, 1, tcfg.batch_size,
                                                 self.mesh, **bg_kw))
            return (make_multi_step(cfg, K, tcfg.batch_size, **bg_kw, **pu),
                    make_multi_step(cfg, 1, tcfg.batch_size, **bg_kw))

        multi, single = build_steps(self.train_config)

        # log_every is NOT an event cadence: chunks span log boundaries and
        # per-step lines are read back from the dispatch's [K] metric
        # arrays (log_steps below) — capping chunks at log_every (default
        # 1: reference per-iteration stdout) would defeat the fusion
        cadences = [c for c in (tcfg.num_summaries_every,
                                tcfg.save_params_every,
                                tcfg.img_summaries_every,
                                tcfg.grad_summaries_every)
                    if c and c > 0]

        def next_event(step):
            nxt = min(((step // c) + 1) * c for c in cadences) \
                if cadences else step + K
            return nxt

        def log_steps(end_step, span, m):
            """Reference-parity stdout (training.py:226): one line per log
            boundary crossed by the last dispatch, per-step values indexed
            from its [span] metric arrays; ONE chunk-mean JSONL record."""
            L = tcfg.log_every
            if not L or L <= 0:
                return
            first = ((end_step - span) // L + 1) * L
            if first > end_step:
                return
            la = np.asarray(m["loss"]).reshape(-1)      # one fetch each,
            aa = np.asarray(m["accuracy"]).reshape(-1)  # not one per line
            for s in range(first, end_step + 1, L):
                i = s - (end_step - span) - 1
                print(f"iteration {s}\tloss {la[i]:.3f}\t"
                      f"accuracy {aa[i]:.2f}")
            self.metrics.write(
                end_step, {name: float(jnp.mean(v))
                           for name, v in m.items()
                           if not isinstance(v, dict)}, prefix="train/")

        t_start = time.time()
        images_seen = 0
        metrics = None                       # set by the first dispatch
        last_eval = (None, None)             # (step, acc) of the last eval
        step = int(self.state.step)          # tracked host-side from here on
        total_epochs = tcfg.epochs if tcfg.epochs is not None else 10 ** 9
        max_iters = tcfg.max_iterations
        print(f"training[device-data]: batch={tcfg.batch_size} "
              f"K={K} epochs={tcfg.epochs} start_step={step}")

        while self.loader.epoch < total_epochs:
            if max_iters is not None and step >= max_iters:
                break
            if cadence_hit(step, tcfg.num_summaries_every):
                acc = self.write_eval_summaries(
                    step, cadence_hit(step, tcfg.img_summaries_every))
                last_eval = (step, acc)
                print(f"[eval @ {step}] test accuracy {acc:.4f}")
                if tcfg.stop_at_accuracy is not None \
                        and acc >= tcfg.stop_at_accuracy:
                    print(f"target accuracy {tcfg.stop_at_accuracy} reached")
                    break
                verdict = self._maybe_restart_on_stall(step, acc)
                if verdict == "giveup":
                    break
                if verdict == "restart":
                    step = 0
                    if tcfg.restart_schedule_rotation:
                        multi, single = build_steps(self.train_config)
                        # the instrumented grad step must follow the
                        # rotated schedules too, or its logged annealed
                        # hyperparameters describe steps the model never
                        # takes (review r3)
                        self._build_train_steps()
                    continue
                if cadence_hit(step, tcfg.var_summaries_every):
                    self._write_var_summaries(step)
            if cadence_hit(step, tcfg.save_params_every):
                save_checkpoint(self.models_dir, self.state, step,
                                loader_state=self.loader.state(),
                                recovery=self.recovery_meta())
            if cadence_hit(step, tcfg.grad_summaries_every):
                # one instrumented single step on the next batch (the fused
                # multi-step cannot expose per-variable grads)
                imgs, digs = self.loader.gather_batch()
                if self._shard is not None:
                    imgs, digs = self._shard(imgs, digs)
                _, gm = self.train_step_gs(self.state, imgs, digs)
                self._write_grad_summaries(step, gm)

            k = self.loader.chunk(K)
            # chunk() may have rolled over to a new epoch — re-test the
            # epoch bound so we never train into an extra epoch
            if self.loader.epoch >= total_epochs:
                break
            k = min(k, max(next_event(step) - step, 1))
            if max_iters is not None:
                k = min(k, max_iters - step)
            fn = multi if k == K else single
            reps = 1 if k == K else k
            for i_rep in range(reps):
                self.state, metrics = fn(
                    self.state, self.loader.images, self.loader.digits,
                    self.loader.perm(), jnp.asarray(self.loader.index,
                                                    jnp.int32))
                self.loader.advance(1 if reps > 1 else k)
                if reps > 1:
                    log_steps(step + i_rep + 1, 1, metrics)
            step += k
            images_seen += k * tcfg.batch_size
            if reps == 1:
                log_steps(step, k, metrics)

        final_step = step
        if last_eval[0] == final_step:
            # the loop broke right after an eval at this step (stop-at-
            # accuracy / give-up): don't pay a duplicate full-test pass
            acc = last_eval[1]
        else:
            acc = self.write_eval_summaries(final_step, with_images=True)
        save_checkpoint(self.models_dir, self.state, final_step,
                        loader_state=self.loader.state(),
                        recovery=self.recovery_meta())
        wall = time.time() - t_start
        ips = images_seen / wall if wall > 0 else 0.0
        print(f"training has ended: step {final_step}, "
              f"test accuracy {acc:.4f}, {ips:.0f} images/sec")
        return {"step": final_step, "test_accuracy": acc,
                "images_per_sec": ips, "restarts": self.restarts}

    # -- main loop -------------------------------------------------------------
    def train(self):
        if self.tcfg.device_data:
            return self._train_device_data()
        tcfg = self.tcfg
        t_start = time.time()
        images_seen = 0
        step = int(self.state.step)
        print(f"training: batch={tcfg.batch_size} epochs={tcfg.epochs} "
              f"start_step={step}")
        # loader position to checkpoint: captured BEFORE the current batch
        # was pulled, so a resumed run re-delivers the in-flight batch the
        # saved model state has not trained on yet (exact-resume contract)
        loader_state_snapshot = self.loader.state()
        for images, targets in self.loader:
            step = int(self.state.step)
            if tcfg.max_iterations is not None and step >= tcfg.max_iterations:
                break

            if cadence_hit(step, tcfg.num_summaries_every):
                with_images = cadence_hit(step, tcfg.img_summaries_every)
                acc = self.write_eval_summaries(step, with_images)
                print(f"[eval @ {step}] test accuracy {acc:.4f}")
                if tcfg.stop_at_accuracy is not None \
                        and acc >= tcfg.stop_at_accuracy:
                    print(f"target accuracy {tcfg.stop_at_accuracy} reached")
                    break
                if cadence_hit(step, tcfg.var_summaries_every):
                    self._write_var_summaries(step)

            if cadence_hit(step, tcfg.save_params_every):
                save_checkpoint(self.models_dir, self.state, step,
                                loader_state=loader_state_snapshot,
                                recovery=self.recovery_meta())

            if cadence_hit(step, tcfg.grad_summaries_every):
                self.state, metrics = self.train_step_gs(
                    self.state, images, targets)
                self._write_grad_summaries(step, metrics)
            else:
                self.state, metrics = self.train_step(
                    self.state, images, targets)
            loader_state_snapshot = self.loader.state()

            images_seen += tcfg.batch_size
            if cadence_hit(step, tcfg.log_every):
                loss = float(metrics["loss"])
                acc = float(metrics["accuracy"])
                print(f"iteration {step + 1}\tloss {loss:.3f}\t"
                      f"accuracy {acc:.2f}")
                self.metrics.write(step, {k: v for k, v in metrics.items()},
                                   prefix="train/")

        # final eval + checkpoint. NOTE: loader_state_snapshot, NOT
        # self.loader.state() — a break can fire after the loop pulled an
        # in-flight batch the model never trained on; the snapshot is the
        # position the saved params actually correspond to (exact-resume)
        final_step = int(self.state.step)
        acc = self.write_eval_summaries(final_step, with_images=True)
        save_checkpoint(self.models_dir, self.state, final_step,
                        loader_state=loader_state_snapshot)
        wall = time.time() - t_start
        ips = images_seen / wall if wall > 0 else 0.0
        print(f"training has ended: step {final_step}, "
              f"test accuracy {acc:.4f}, {ips:.0f} images/sec")
        return {"step": final_step, "test_accuracy": acc,
                "images_per_sec": ips}
