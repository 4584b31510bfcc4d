"""Training loop: cosine LR, early stopping, best-checkpointing, resume.

Functional parity with reference training/trainer.py:42-257 (model.fit with
EarlyStopping/ModelCheckpoint/_SaveTrainState/_CSVHistoryLogger callbacks),
driven by the pjit data-parallel step from parallel/steps.py. Validation
reports loss + macro ROC-AUC (Keras AUC(multi_label=True) analog).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Iterable, Iterator

import numpy as np

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.ops.frontend import inputs_for_config
from birdnet_stm32_tpu.parallel.steps import TrainState, make_eval_step, make_train_step
from birdnet_stm32_tpu.training import checkpoint as ckpt
from birdnet_stm32_tpu.training.losses import make_loss_fn
from birdnet_stm32_tpu.training.optimizer import build_optimizer, cosine_schedule
from birdnet_stm32_tpu.utils.logging import info, ok, warn


def macro_roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Macro ROC-AUC over labels with both classes present (Keras
    AUC(multi_label=True) analog; degenerate columns are skipped)."""
    from sklearn.metrics import roc_auc_score

    aucs = []
    for c in range(y_true.shape[1]):
        col = y_true[:, c]
        if 0 < col.sum() < len(col):
            aucs.append(roc_auc_score(col, y_score[:, c]))
    return float(np.mean(aucs)) if aucs else float("nan")


@dataclass
class AdaptiveLoaderTuner:
    """Hill-climbs the loader's max_inflight_files against step throughput
    (reference cli/train.py:41-123, sans the RAM watermark — reservoirs here
    hold waveforms, not spectrograms)."""

    loader_control: dict
    measure_every: int = 200
    step_lo: int = 16
    step_hi: int = 256
    _t0: float = field(default_factory=time.perf_counter)
    _count: int = 0
    _last_rate: float = 0.0
    _direction: int = 1

    def on_step(self) -> None:
        self._count += 1
        if self._count % self.measure_every:
            return
        now = time.perf_counter()
        rate = self.measure_every / (now - self._t0)
        self._t0 = now
        if self._last_rate and rate < self._last_rate * 0.98:
            self._direction = -self._direction
        cur = int(self.loader_control.get("max_inflight_files", 64))
        new = int(np.clip(cur + self._direction * 16, self.step_lo, self.step_hi))
        self.loader_control["max_inflight_files"] = new
        self._last_rate = rate


def train_model(
    model,
    variables: dict,
    cfg: ModelConfig,
    train_batches: Iterator[tuple[np.ndarray, np.ndarray]],
    val_batches: Callable[[], Iterable[tuple[np.ndarray, np.ndarray]]],
    run_dir: str | Path,
    epochs: int = 50,
    steps_per_epoch: int = 100,
    learning_rate: float = 1e-3,
    optimizer: str = "adam",
    weight_decay: float = 0.0,
    gradient_clip_norm: float = 1.0,
    patience: int = 10,
    multilabel: bool = False,
    focal_gamma: float | None = None,
    label_smoothing: float = 0.0,
    class_weights: np.ndarray | None = None,
    batcher=None,
    mesh=None,
    resume: bool = False,
    resume_weights_only: bool = False,
    seed: int = 0,
    loader_tuner: AdaptiveLoaderTuner | None = None,
    qat: bool = False,
    qat_act: bool = False,
    loss_fn_override=None,
    kernel_l2: float = 1e-4,
    mixed_precision: bool = False,
    on_epoch_end=None,
    monitor: str = "val_loss",
) -> tuple[dict, list[dict]]:
    """Run the full training loop.

    Args:
        model: DSCNN built with class_activation='none'.
        variables: Initial {params, batch_stats}.
        cfg: Model config (saved as the run's sidecar).
        train_batches: Infinite iterator of (waveform [B,T], labels [B,C]).
        val_batches: Zero-arg callable returning a finite iterable of the same.
        run_dir: Output directory (checkpoint + sidecars).
        batcher: Optional jitted device transform (key, wave, labels) ->
            (model inputs, labels); defaults to plain feature extraction.
        qat: Use the QAT step (STE fake-quant, frozen BN).
        qat_act: With qat, also fake-quantize input/activations/logits
            (quant/qat.make_qat_train_step act_fq — simulates what PTQ
            actually quantizes; the reference recipe is weights-only).
        loss_fn_override: Replace the auto-selected loss (distillation uses
            this with [B, 2C] concatenated hard+teacher targets).
        on_epoch_end: Optional callback (epoch_index, metrics dict) invoked
            after each epoch's bookkeeping; exceptions propagate (the tuner
            raises Pruned through here to stop hopeless trials early).
        monitor: Best-checkpoint / early-stop criterion — 'val_loss'
            (lower-better; the reference's Keras-callback default) or
            'val_roc_auc' (higher-better). Mixup's label-union soft
            targets can push val BCE UP while ranking quality is still
            improving (measured: a 10-class run minimized val_loss at
            epoch 3 with AUC 0.62 and kept climbing to AUC 0.92 by 13),
            so val_loss selects an early bad checkpoint on small corpora
            — monitor the AUC there.
        Other args mirror the reference trainer's surface.

    Returns:
        (best variables, history list of per-epoch metric dicts).
    """
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)

    if monitor not in ("val_loss", "val_roc_auc"):
        raise ValueError(f"monitor must be 'val_loss' or 'val_roc_auc', got {monitor!r}")
    lower_better = monitor == "val_loss"
    initial_epoch = 0
    resumed_best_val = float("inf") if lower_better else float("-inf")
    if resume and (run_dir / "best").exists():
        info("resume", f"loading checkpoint from {run_dir}")
        _, variables, _ = ckpt.load_checkpoint(run_dir, class_activation="none")
        tstate = ckpt.load_train_state(run_dir)
        initial_epoch = int(tstate.get("epoch", 0))
        # Restore the best-val watermark so the first post-resume epoch
        # can't overwrite a better pre-crash checkpoint (cold cosine
        # restarts routinely degrade the first epochs). The watermark is
        # only meaningful under the SAME monitor: an AUC (higher-better)
        # read as a loss watermark would let the first mediocre epoch
        # clobber the best checkpoint — reset it on mismatch.
        if tstate.get("best_val") is not None:
            if tstate.get("monitor", "val_loss") == monitor:
                resumed_best_val = float(tstate["best_val"])
            else:
                warn("resume", f"previous run monitored "
                     f"{tstate.get('monitor', 'val_loss')!r}, this one "
                     f"{monitor!r} — best-checkpoint watermark reset: the "
                     "old watermark is not comparable on the new metric, "
                     "so the existing best/ may be replaced by the first "
                     "epoch that improves on the new one")
        info("resume", f"resuming from epoch {initial_epoch}")

    total_steps = (epochs - initial_epoch) * steps_per_epoch
    from birdnet_stm32_tpu.models.blocks import BN_MOMENTUM

    bn_settle = int(3.0 / max(1e-6, 1.0 - BN_MOMENTUM))  # ~300 @ 0.99
    if not resume and not qat and total_steps < bn_settle:  # QAT freezes BN
        warn("train", f"only {total_steps} total steps: BatchNorm running "
                      f"statistics (momentum {BN_MOMENTUM}) need ~{bn_settle} "
                      "steps to wash out their init — val metrics and saved "
                      "checkpoints will under-report the model until then. "
                      "Raise --epochs/--steps_per_epoch for real runs.")
    schedule = cosine_schedule(learning_rate, epochs, steps_per_epoch)
    tx = build_optimizer(optimizer, schedule, weight_decay, gradient_clip_norm)
    loss_fn = loss_fn_override if loss_fn_override is not None else make_loss_fn(
        multilabel=multilabel, focal_gamma=focal_gamma,
        label_smoothing=label_smoothing, class_weights=class_weights,
    )

    if qat:
        from birdnet_stm32_tpu.quant.qat import make_qat_train_step

        step_fn = make_qat_train_step(model, tx, loss_fn, mesh=mesh, kernel_l2=kernel_l2,
                                      frontend_trainable=cfg.frontend_trainable,
                                      act_fq=qat_act)
    else:
        step_fn = make_train_step(
            model, tx, loss_fn, mesh=mesh, frontend_trainable=cfg.frontend_trainable,
            kernel_l2=kernel_l2,
            compute_dtype=jnp.bfloat16 if mixed_precision else None,
        )
    eval_fn = make_eval_step(model, loss_fn, mesh=mesh,
                             activation="sigmoid" if multilabel else "softmax")
    # Final val batch may not divide the mesh's device count (the val
    # loader drains its tail); run it through an unsharded twin on
    # host-fetched variables instead of crashing the data sharding.
    eval_fn_tail = None
    n_shards = int(mesh.devices.size) if mesh is not None else 1
    # Multi-host: per-host local batches must be stitched into logical
    # global arrays before a global-mesh jit consumes them.
    multihost = mesh is not None and jax.process_count() > 1
    if multihost:
        from birdnet_stm32_tpu.parallel.distributed import globalize_batch
    state = TrainState.create(variables, tx)
    resumed_step = 0
    if resume and initial_epoch > 0 and not resume_weights_only:
        restored = ckpt.restore_full_state(run_dir, state)
        if restored is not None:
            state = restored
            resumed_step = int(jax.device_get(state.step))
            info("resume", f"optimizer state restored (step {resumed_step}: "
                           "adam moments + schedule position continue)")
        else:
            info("resume", "no full-state checkpoint; optimizer restarts "
                           "fresh (reference semantics)")
    if mesh is not None:
        from birdnet_stm32_tpu.parallel.mesh import replicated

        state = jax.device_put(state, replicated(mesh))

    if batcher is None:
        def batcher(key, wave, labels):  # noqa: ANN001
            return inputs_for_config(jnp.asarray(wave), cfg), jnp.asarray(labels)

    root_key = jax.random.key(seed)
    # Host-side twin of state.step: no device read in the hot loop. Starts at
    # the restored step so batcher RNG keys don't repeat epoch-1 draws.
    host_step = resumed_step
    history: list[dict] = []
    best_val = resumed_best_val
    best_variables = variables
    bad_epochs = 0
    saved_any = False

    for epoch in range(initial_epoch, epochs):
        t0 = time.perf_counter()
        train_losses = []
        # Per-epoch stage split (SURVEY §5.1 tracing): host WAIT times per
        # stage — data = blocked on the loader, dispatch = H2D transfer +
        # batcher/step enqueue (on this tunnel jnp.asarray blocks for the
        # copy, so this column IS the transfer time; on local backends it
        # is near zero and the device runs behind). Recorded into
        # history.csv so a slow run diagnoses itself.
        t_data = t_dispatch = 0.0
        for _ in range(steps_per_epoch):
            t1 = time.perf_counter()
            wave, labels = next(train_batches)
            t2 = time.perf_counter()
            bkey = jax.random.fold_in(root_key, host_step)
            x, y = batcher(bkey, jnp.asarray(wave), jnp.asarray(labels))
            if multihost:
                x, y = globalize_batch((x, y), mesh)
            state, metrics = step_fn(state, x, y, root_key)
            t_data += t2 - t1
            t_dispatch += time.perf_counter() - t2
            host_step += 1
            train_losses.append(metrics["loss"])
            if loader_tuner is not None:
                loader_tuner.on_step()

        t_val0 = time.perf_counter()
        val_num, val_den, y_true, y_score = 0.0, 0, [], []
        for wave, labels in val_batches():
            w = jnp.asarray(wave)
            # [B, T] waveforms get the frontend; >=3-D batches are already
            # model inputs (e.g. distillation yields features so the
            # teacher's frontend pass isn't recomputed here).
            x = w if w.ndim > 2 else inputs_for_config(w, cfg)
            y = jnp.asarray(labels)
            if multihost:
                # A per-host tail that doesn't fill the local devices can't
                # be expressed as an even global sharding; skip it (the
                # single-host path below evaluates tails exactly).
                if x.shape[0] % (n_shards // jax.process_count()) != 0:
                    continue
                x, y = globalize_batch((x, y), mesh)
            b = int(x.shape[0])
            if mesh is not None and b % n_shards != 0 and not multihost:
                if eval_fn_tail is None:
                    eval_fn_tail = make_eval_step(
                        model, loss_fn, mesh=None,
                        activation="sigmoid" if multilabel else "softmax")
                loss, scores = eval_fn_tail(jax.device_get(state), x, y)
            else:
                loss, scores = eval_fn(state, x, y)
            # Weight by batch size so the partial tail batch doesn't skew
            # the epoch mean (matches Keras's sample-weighted running mean).
            val_num += float(loss) * b
            val_den += b
            y_true.append(np.asarray(labels))
            if multihost:
                # `scores` is a data-sharded GLOBAL array: np.asarray on
                # non-addressable shards raises. Fetch this host's shards
                # (in batch order) — they align with the host-local
                # `labels` because make_array_from_process_local_data puts
                # each process's rows on its own devices. Every host then
                # computes AUC over its local slice.
                local = sorted(scores.addressable_shards,
                               key=lambda s: s.index[0].start or 0)
                y_score.append(np.concatenate([np.asarray(s.data) for s in local]))
            else:
                y_score.append(np.asarray(scores))

        # ONE host read for the epoch's losses: float() per step scalar is
        # 80 serial blocking reads x the ~25 ms tunnel floor (~2 s/epoch).
        train_loss = float(np.mean(np.asarray(jnp.stack(train_losses))))
        val_loss = val_num / val_den if val_den else float("nan")
        if y_true:
            yt, ys = np.concatenate(y_true), np.concatenate(y_score)
            # Distillation targets are [B, 2C] (hard ++ teacher); score the hard half.
            auc = macro_roc_auc(yt[:, : ys.shape[1]], ys)
        else:
            auc = float("nan")
        epoch_metrics = {
            "loss": train_loss,
            "val_loss": val_loss,
            "val_roc_auc": auc,
            "seconds": time.perf_counter() - t0,
            "data_wait_s": round(t_data, 3),
            "dispatch_s": round(t_dispatch, 3),
            "val_s": round(time.perf_counter() - t_val0, 3),
        }
        history.append(epoch_metrics)
        ckpt.append_history_csv(run_dir, epoch + 1, epoch_metrics)
        mval = val_loss if lower_better else auc
        improved = (np.isfinite(mval)
                    and (mval < best_val if lower_better else mval > best_val))
        new_best = mval if improved else best_val
        ckpt.save_train_state(
            run_dir, epoch + 1, multilabel=multilabel, monitor=monitor,
            best_val=None if not np.isfinite(new_best) else new_best)
        ckpt.save_full_state(run_dir, state)  # preemption-safe resume point
        if on_epoch_end is not None:
            on_epoch_end(epoch, epoch_metrics)
        info("train", f"epoch {epoch + 1}/{epochs} loss={train_loss:.4f} "
                      f"val_loss={val_loss:.4f} val_auc={auc:.4f}")

        if improved:
            best_val = mval
            best_variables = jax.device_get(state.variables())
            ckpt.save_checkpoint(run_dir, best_variables, cfg)
            ok("train", f"new best {monitor}={mval:.4f}, checkpoint saved")
            saved_any = True
            bad_epochs = 0
        else:
            if not lower_better and not np.isfinite(mval) and not saved_any:
                warn("train", f"{monitor} is NaN (degenerate validation "
                     "labels?) — no best checkpoint saved yet")
            bad_epochs += 1
            if bad_epochs >= patience:
                warn("train", f"early stopping after {patience} stale epochs")
                break

    if not saved_any and not (resume and (run_dir / "best").exists()):
        # A monitored metric that never went finite (e.g. every val batch's
        # label columns degenerate -> macro AUC NaN) must not leave the run
        # directory without a checkpoint: convert/evaluate/resume all need
        # best/. Save the final state and say so.
        warn("train", f"{monitor} never improved/went finite — saving the "
             "FINAL epoch's weights as best/ so the run stays usable")
        best_variables = jax.device_get(state.variables())
        ckpt.save_checkpoint(run_dir, best_variables, cfg)

    ckpt.save_training_curves(run_dir, history)
    return best_variables, history
