"""Training runtime (L3): optax + one jitted train step.

TPU-native rebuild of reference ``src/vla_fastvlm/training/trainer.py``.
Public surface parity: ``TrainingConfig`` (same fields, ``trainer.py:20-39``),
``Trainer(model, train_dl, eval_dl, config).fit()`` / ``.evaluate()``.

Architecture differences (by design, SURVEY.md §2.3/§5):

- The whole update — image prep, VLM prefill, pooling, head, MSE, backward,
  AdamW, grad clip — is ONE jitted XLA program (``_train_step``); there is no
  Accelerate/DDP wrapper. Data parallelism comes from sharding the batch over
  a ``jax.sharding`` mesh (``vla_fastvlm_tpu/parallel``), with XLA inserting
  the gradient all-reduce over ICI (the reference's NCCL all-reduce at
  ``accelerator.backward``, ``trainer.py:175``).
- Gradient accumulation uses ``optax.MultiSteps`` (reference:
  ``accelerator.accumulate``, ``trainer.py:171``).
- Mixed precision is native bf16 params/compute chosen at model construction;
  the reference's bf16->fp16->no fallback chain (``trainer.py:89-122``) is
  unnecessary on TPU but the knob is validated with the same degradation
  spirit (unknown values warn and fall back to "no").
- Checkpoints: reference directory layout (``checkpoints/step-N/`` +
  ``policy_config.json`` + weights + ``training_config.json`` at the run
  root, ``trainer.py:146-152,246-255``) with orbax for the resumable train
  state. Unlike the reference, resume restores ``global_step``/``epoch`` —
  the reference restarts counters at 0 (``trainer.py:86-87,257-262``), a
  quirk SURVEY.md §5 flags as a bug, not a feature.

Scheduler parity: linear warmup then linear decay computed over *optimizer
updates* while ``global_step`` counts *batches* — the reference's dual-clock
quirk (``trainer.py:184,223-231``) is preserved so stop conditions and LR
curves match with gradient_accumulation_steps > 1.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


@dataclass
class TrainingConfig:
    """Parity fields from reference ``trainer.py:20-39``."""

    output_dir: str = "outputs/train"
    num_epochs: int = 10
    max_steps: Optional[int] = None
    gradient_accumulation_steps: int = 1
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    betas: tuple[float, float] = (0.9, 0.95)
    eps: float = 1e-8
    warmup_ratio: float = 0.03
    max_grad_norm: float = 1.0
    mixed_precision: Optional[str] = "bf16"
    logging_steps: int = 50
    eval_steps: int = 500
    save_steps: int = 1000
    seed: int = 42
    resume_from: Optional[str] = None
    gradient_checkpointing: bool = False
    report_to: list[str] = field(default_factory=lambda: ["tensorboard"])

    # --- TPU-native observability (SURVEY.md §5: tracing/profiling + the
    # functional-stack analog of race detection) ---
    # Capture a jax.profiler trace for steps [profile_start_step,
    # profile_start_step + profile_num_steps) into <output_dir>/logs/profile.
    profile_start_step: Optional[int] = None
    profile_num_steps: int = 3
    # Raise on NaN from any jitted computation (jax debug_nans).
    debug_nans: bool = False
    # Preemption-safe checkpointing: on SIGTERM/SIGINT finish the in-flight
    # step, save checkpoints/preempt-stepN, then exit. This is the
    # TPU-relevant "elastic recovery" (SURVEY.md §5): maintenance events
    # send SIGTERM before reclaiming the slice; resume_from the preempt
    # checkpoint continues exactly.
    save_on_preemption: bool = True
    # Asynchronous checkpoint writes: the step loop only snapshots state to
    # host (device_get); serialization + disk IO run on a background thread
    # (joined before the next save / at end of training).
    async_save: bool = True
    # Keep N batches prepared AND placed on device ahead of the step loop
    # (host prep + host->device transfer overlap compute; the reference
    # transfers synchronously per step, ``trainer.py:172``). 1 = eager.
    prefetch_batches: int = 2
    # Keep only the newest N step-* checkpoint dirs (None/0 = keep all).
    # Preemption/final checkpoints are never pruned.
    keep_last_n: Optional[int] = 5
    # FSDP (ZeRO-3-style): additionally shard every large parameter — and,
    # through inheritance, its gradient and AdamW moments — over the mesh's
    # ``data`` axis (parallel/sharding.py::fsdp_param_shardings). Memory per
    # chip for params+grads+opt-state drops by |data| while the math stays
    # DP-identical (GSPMD all-gathers params at use, reduce-scatters grads).
    # Required for full-backbone (``train_backbone=True``) 7B training on
    # v5e-16GB chips; a no-op without a mesh.
    fsdp: bool = False


class Trainer:
    """Lightweight trainer tailored for FastVLM policy fine-tuning."""

    def __init__(
        self,
        model,
        train_dataloader: Iterable[Dict],
        eval_dataloader: Optional[Iterable[Dict]] = None,
        config: TrainingConfig | None = None,
        mesh=None,
    ) -> None:
        """``mesh``: optional ``jax.sharding.Mesh`` ("data" x "model"). When
        given, parameters are placed per the TP rules and every batch is
        split over the data axis — GSPMD inserts the DP gradient all-reduce
        and TP collectives (the role of the reference's Accelerate/DDP/NCCL
        stack, ``trainer.py:55,68-78,175``)."""
        self.config = config or TrainingConfig()
        self._validate_precision()
        if self.config.debug_nans:
            jax.config.update("jax_debug_nans", True)

        self.model = model
        self.train_dataloader = train_dataloader
        self.eval_dataloader = eval_dataloader
        self.mesh = mesh

        self.num_training_steps = self._compute_total_training_steps()
        warmup_steps = int(self.num_training_steps * self.config.warmup_ratio)
        self._schedule = _linear_warmup_decay(
            self.config.learning_rate, self.num_training_steps, warmup_steps
        )

        tx = optax.chain(
            optax.clip_by_global_norm(self.config.max_grad_norm)
            if self.config.max_grad_norm is not None
            else optax.identity(),
            optax.adamw(
                learning_rate=self._schedule,
                b1=self.config.betas[0],
                b2=self.config.betas[1],
                eps=self.config.eps,
                weight_decay=self.config.weight_decay,
            ),
        )
        if self.config.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, self.config.gradient_accumulation_steps)
        self._tx = tx

        self.trainable = model.trainable_params()
        self.frozen = model.frozen_params()
        if self.mesh is not None:
            from ..parallel import shard_params

            # Sharded init: opt state inherits the param shardings through
            # zeros_like et al. With config.fsdp the shardings additionally
            # split large leaves over the data axis (ZeRO-3 memory scaling).
            self.trainable = shard_params(
                self.mesh, self.trainable, fsdp=self.config.fsdp
            )
            self.frozen = shard_params(self.mesh, self.frozen, fsdp=self.config.fsdp)
        self.opt_state = tx.init(self.trainable)

        self._rng = jax.random.PRNGKey(self.config.seed)
        self.global_step = 0
        self.epoch = 0
        self._writer = None

        loss_fn = model.loss_fn

        def train_step(trainable, opt_state, frozen, arrays, rng):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, metrics), grads = grad_fn(
                trainable, frozen, arrays, dropout_rng=rng, train=True
            )
            updates, opt_state = tx.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            metrics = dict(metrics)
            metrics["grad_norm"] = optax.global_norm(grads)
            return trainable, opt_state, metrics

        def eval_step(trainable, frozen, arrays):
            _, metrics = loss_fn(trainable, frozen, arrays, train=False)
            return metrics

        out_shardings = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # Pin updated params/opt-state to their input (TP/FSDP) layout:
            # without the constraint XLA may keep all-gathered copies of
            # FSDP-sharded leaves, forfeiting the memory the sharding buys.
            # Leaves optax created eagerly (e.g. step counters) carry a
            # single-device sharding — normalize them to mesh-replicated so
            # the program has one consistent device set.
            replicated = NamedSharding(self.mesh, PartitionSpec())

            def mesh_sharding(x):
                s = getattr(x, "sharding", None)
                if isinstance(s, NamedSharding) and s.mesh == self.mesh:
                    return s
                return replicated

            param_sh = jax.tree_util.tree_map(mesh_sharding, self.trainable)
            opt_sh = jax.tree_util.tree_map(mesh_sharding, self.opt_state)
            out_shardings = (param_sh, opt_sh, None)
        self._train_step = jax.jit(
            train_step, donate_argnums=(0, 1), out_shardings=out_shardings
        )
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------

    def _validate_precision(self) -> None:
        precision = self.config.mixed_precision
        if precision in (None, "no", "bf16", "bfloat16", "fp16", "float16"):
            return
        logger.warning(
            "Mixed precision '%s' not supported on this backend; falling back "
            "to 'no'. (TPU runs bf16 natively via the model dtype config.)",
            precision,
        )
        self.config.mixed_precision = "no"

    def _compute_total_training_steps(self) -> int:
        """Optimizer-update count (parity: reference ``trainer.py:223-231``)."""
        if self.config.max_steps:
            return self.config.max_steps
        try:
            batches_per_epoch = len(self.train_dataloader)
        except TypeError:
            batches_per_epoch = 0
        if batches_per_epoch > 0:
            updates = max(
                batches_per_epoch // self.config.gradient_accumulation_steps, 1
            )
            return updates * self.config.num_epochs
        raise ValueError(
            "Unable to infer total training steps from dataloader; please set max_steps."
        )

    # ------------------------------------------------------------------
    # logging

    def _init_trackers(self) -> None:
        output_dir = Path(self.config.output_dir)
        self._metrics_file = open(
            output_dir / "logs" / "metrics.jsonl", "a", encoding="utf-8"
        )
        if "tensorboard" in (self.config.report_to or []):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=str(output_dir / "logs"))
                hparams = {
                    k: (v if isinstance(v, (int, float, bool, str)) else str(v))
                    for k, v in asdict(self.config).items()
                }
                self._writer.add_text(
                    "vla_fastvlm/config", json.dumps(hparams, indent=2)
                )
            except Exception as exc:  # tensorboard optional
                logger.warning("tensorboard tracker unavailable: %s", exc)
                self._writer = None

    def _log(self, metrics: Dict[str, float], step: int) -> None:
        payload = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._metrics_file.write(json.dumps(payload) + "\n")
        self._metrics_file.flush()
        if self._writer is not None:
            for key, value in metrics.items():
                self._writer.add_scalar(key, float(value), step)

    # ------------------------------------------------------------------
    # fitting

    def fit(self) -> None:
        output_dir = Path(self.config.output_dir)
        if jax.process_index() == 0:
            output_dir.mkdir(parents=True, exist_ok=True)
            (output_dir / "checkpoints").mkdir(exist_ok=True)
            (output_dir / "logs").mkdir(exist_ok=True)
            with open(output_dir / "training_config.json", "w", encoding="utf-8") as f:
                json.dump(asdict(self.config), f, indent=2)
        self._init_trackers()

        if self.config.resume_from:
            self._load_checkpoint(self.config.resume_from)

        self._preempted = False
        restore_handlers = self._install_preemption_handlers()
        try:
            start_epoch = self.epoch
            for epoch in range(start_epoch, self.config.num_epochs):
                self.epoch = epoch
                if hasattr(self.train_dataloader, "set_epoch"):
                    self.train_dataloader.set_epoch(epoch)
                self._train_one_epoch()
                if self._preempted or self.global_step >= self.num_training_steps:
                    break
        finally:
            restore_handlers()
            self._end_training()

    def _install_preemption_handlers(self):
        if not self.config.save_on_preemption:
            return lambda: None
        import signal

        def handler(signum, frame):
            logger.warning(
                "Received signal %s: saving preemption checkpoint after the "
                "current step.",
                signum,
            )
            self._preempted = True

        previous = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                previous[sig] = signal.signal(sig, handler)
            except ValueError:  # non-main thread
                pass

        def restore():
            for sig, old in previous.items():
                signal.signal(sig, old)

        return restore

    def _end_training(self) -> None:
        # Close out a still-open profiler trace: if training stops (max_steps,
        # preemption, exception) before profile_start_step + profile_num_steps
        # the trace would otherwise dangle and the profile output is lost.
        if getattr(self, "_profiling", False):
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("Stopped jax.profiler trace (training ended)")
        # Drain any in-flight async checkpoint write before teardown.
        self._join_pending_save()
        executor = getattr(self, "_save_executor", None)
        if executor is not None:
            executor.shutdown(wait=True)
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
        self._metrics_file.close()

    def _maybe_profile(self) -> None:
        cfg = self.config
        if cfg.profile_start_step is None:
            return
        if self.global_step == cfg.profile_start_step:
            profile_dir = str(Path(cfg.output_dir) / "logs" / "profile")
            logger.info("Starting jax.profiler trace -> %s", profile_dir)
            jax.profiler.start_trace(profile_dir)
            self._profiling = True
        elif (
            getattr(self, "_profiling", False)
            and self.global_step >= cfg.profile_start_step + cfg.profile_num_steps
        ):
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("Stopped jax.profiler trace")

    def _train_one_epoch(self) -> None:
        cfg = self.config
        # step_time accounting: jitted steps dispatch asynchronously (and on
        # tunneled backends even block_until_ready lies — CLAUDE.md), so
        # per-step wall clock on a non-logging step measures dispatch only.
        # Instead, time the window between metric materializations (each
        # float(...) fetch is a true sync) and report the amortized per-step
        # time over the window.
        window_start = time.perf_counter()
        window_steps = 0
        from ..data.prefetch import device_prefetch

        stream = device_prefetch(
            self.train_dataloader,
            size=max(1, cfg.prefetch_batches),
            placer=lambda b: self._place_batch(self.model.prepare_batch(b)),
        )
        for arrays in stream:
            self._maybe_profile()
            self._rng, step_rng = jax.random.split(self._rng)
            self.trainable, self.opt_state, metrics = self._train_step(
                self.trainable, self.opt_state, self.frozen, arrays, step_rng
            )
            # Parity quirk: global_step counts *batches* (reference
            # ``trainer.py:184``) while the schedule/stop-count use updates.
            self.global_step += 1
            window_steps += 1
            synced = False

            if self.global_step % cfg.logging_steps == 0:
                updates = self.global_step // cfg.gradient_accumulation_steps
                # Metric materialization = device sync: closes the window.
                loss_value = float(metrics["loss"])
                step_time = (time.perf_counter() - window_start) / window_steps
                self._log(
                    {
                        "train/loss": loss_value,
                        "train/mse": metrics["mse"],
                        "train/grad_norm": metrics["grad_norm"],
                        "train/lr": float(self._schedule(updates)),
                        "train/epoch": self.epoch,
                        "train/step_time_s": step_time,
                    },
                    step=self.global_step,
                )
                synced = True

            if self.global_step % cfg.eval_steps == 0 and self.eval_dataloader is not None:
                eval_metrics = self.evaluate()
                self._log(eval_metrics, step=self.global_step)
                synced = True

            if self.global_step % cfg.save_steps == 0:
                self._save_checkpoint(suffix=f"step-{self.global_step}")
                synced = True

            if synced:
                window_start = time.perf_counter()
                window_steps = 0

            if getattr(self, "_preempted", False):
                self._save_checkpoint(suffix=f"preempt-step-{self.global_step}")
                break

            if cfg.max_steps and self.global_step >= cfg.max_steps:
                break

    def _place_batch(self, arrays: Dict) -> Dict:
        if self.mesh is None:
            # Explicit async device_put so prefetched batches transfer while
            # the previous step computes (instead of implicitly at step call).
            return {
                key: jax.device_put(value) if hasattr(value, "shape") else value
                for key, value in arrays.items()
            }
        from ..parallel import shard_batch

        return shard_batch(self.mesh, arrays)

    def evaluate(self) -> Dict[str, float]:
        """Sample-weighted mean eval MSE (parity: reference ``trainer.py:208-221``)."""
        if self.eval_dataloader is None:
            return {}
        total_loss = 0.0
        total_count = 0
        for batch in self.eval_dataloader:
            arrays = self._place_batch(self.model.prepare_batch(batch))
            metrics = self._eval_step(self.trainable, self.frozen, arrays)
            n = arrays["actions"].shape[0]
            total_loss += float(metrics["mse"]) * n
            total_count += n
        return {"eval/mse": total_loss / max(total_count, 1)}

    # ------------------------------------------------------------------
    # checkpointing

    def _sync_model_params(self) -> None:
        self.model.load_params(self.model.merge_trainable(self.trainable))

    def _join_pending_save(self) -> None:
        future = getattr(self, "_save_future", None)
        if future is not None:
            future.result()  # re-raises background write errors
            self._save_future = None

    def _save_checkpoint(self, suffix: str) -> None:
        from ..io.checkpoint import (
            prune_checkpoints,
            save_policy_checkpoint,
            save_train_state,
        )

        checkpoint_dir = Path(self.config.output_dir) / "checkpoints" / suffix
        self._sync_model_params()
        if jax.process_index() != 0:
            return
        # Snapshot to host now (params mutate next step), write in background.
        self._join_pending_save()
        params = jax.device_get(self.model.params)
        state = jax.device_get(
            {
                "opt_state": self.opt_state,
                "trainable": self.trainable,
                "global_step": self.global_step,
                "epoch": self.epoch,
                "rng": np.asarray(jax.device_get(self._rng)),
            }
        )
        model_config = self.model.config

        def write():
            save_policy_checkpoint(checkpoint_dir, model_config, params)
            save_train_state(checkpoint_dir, state)
            if self.config.keep_last_n:
                removed = prune_checkpoints(
                    checkpoint_dir.parent, self.config.keep_last_n
                )
                for path in removed:
                    logger.info("Pruned old checkpoint %s", path)
            logger.info("Saved checkpoint %s", checkpoint_dir)

        if self.config.async_save:
            import concurrent.futures

            if not hasattr(self, "_save_executor"):
                self._save_executor = concurrent.futures.ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="ckpt-save"
                )
            self._save_future = self._save_executor.submit(write)
        else:
            write()

    def _load_checkpoint(self, path: str) -> None:
        from ..io.checkpoint import load_train_state

        checkpoint_path = Path(path)
        if not checkpoint_path.exists():
            raise FileNotFoundError(f"Checkpoint path {path} does not exist.")
        logger.info("Resuming from checkpoint %s", path)
        template = {
            "opt_state": self.opt_state,
            "trainable": self.trainable,
            "global_step": self.global_step,
            "epoch": self.epoch,
            "rng": np.asarray(jax.device_get(self._rng)),
        }
        restored = load_train_state(checkpoint_path, template)
        self.opt_state = restored["opt_state"]
        self.trainable = restored["trainable"]
        self.global_step = int(restored["global_step"])
        self.epoch = int(restored["epoch"])
        self._rng = jnp.asarray(restored["rng"])
        self._sync_model_params()


def _linear_warmup_decay(peak_lr: float, total_steps: int, warmup_steps: int):
    """LambdaLR parity (reference ``trainer.py:233-244``):
    lr = peak * step/warmup during warmup, then linear to 0 at total."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0,
            (total_steps - count) / jnp.maximum(1.0, total_steps - warmup_steps),
        )
        return peak_lr * jnp.where(count < warmup_steps, warm, decay)

    return schedule
