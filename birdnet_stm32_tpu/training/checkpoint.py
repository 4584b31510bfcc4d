"""Checkpointing: orbax params/stats + the reference's sidecar contract.

A run directory holds:
    best/                 orbax checkpoint {params, batch_stats}
    model_config.json     ModelConfig sidecar (the cross-layer contract,
                          reference training/config.py + cli/train.py:443-468)
    labels.txt            ordered class names (cli/train.py:526-529)
    train_state.json      {"epoch": N} for resume (trainer.py:135-140)
    history.csv           per-epoch metrics (trainer.py:142-162)

Resume semantics are a superset of the reference's (trainer.py:96-116
there restores model weights + epoch only, with a fresh cosine schedule):
when a `last/` full-state checkpoint exists, --resume also restores the
optimizer state (adam moments, schedule position) — the orbax params/
opt-state checkpointing SURVEY §5.4 calls for, which makes training
preemption-safe on TPU. Without `last/` (or with --resume_weights_only)
resume falls back to the reference's exact semantics.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from birdnet_stm32_tpu.config import ModelConfig


def save_checkpoint(run_dir: str | Path, variables: dict, cfg: ModelConfig) -> None:
    """Write the orbax checkpoint + sidecar config + labels."""
    run_dir = Path(run_dir).absolute()
    run_dir.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        payload = {"params": variables["params"]}
        if variables.get("batch_stats"):
            payload["batch_stats"] = variables["batch_stats"]
        best = run_dir / "best"
        ckptr.save(best, payload, force=True)
    cfg.save(run_dir / "model_config.json")
    if cfg.class_names:
        (run_dir / "labels.txt").write_text("".join(f"{c}\n" for c in cfg.class_names))


def save_full_state(run_dir: str | Path, state) -> None:
    """Preemption-safe FULL training state under run_dir/last: step, params,
    BN stats, and optimizer state (adam moments + the schedule's step count),
    written after every epoch. A preempted/killed run resumed with --resume
    continues mid-schedule instead of cold-restarting the optimizer (the
    reference restores weights only, trainer.py:96-116)."""
    run_dir = Path(run_dir).absolute()
    run_dir.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(run_dir / "last", jax.device_get(state), force=True)


def restore_full_state(run_dir: str | Path, template):
    """Restore the TrainState saved by save_full_state into `template` (a
    freshly created TrainState with the identical tree structure — same
    model arch and optimizer). Returns None when no last/ checkpoint
    exists or it doesn't match the template (e.g. the optimizer changed
    between runs), so callers can fall back to weights-only resume."""
    last = Path(run_dir).absolute() / "last"
    if not last.exists():
        return None
    try:
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(last, jax.device_get(template))
    except Exception:
        return None


def keras_run_dir(path: str | Path) -> Path | None:
    """Resolve a reference-style .keras path that does not exist on disk to
    the run directory this framework trained into (cli/train.py maps
    --checkpoint_path ckpt/name.keras to the ckpt/ run dir; QAT/probe runs
    land in ckpt/name_qat/ etc.). Returns None when `path` is a real file
    or no run dir matches."""
    p = Path(path)
    if p.suffix != ".keras" or p.exists():
        return None
    for cand in (p.with_suffix(""), p.parent):
        if (cand / "model_config.json").exists():
            return cand
    return None


def load_checkpoint(run_dir: str | Path, class_activation: str | None = None):
    """Load (model, variables, cfg) from a run directory."""
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, shape_init

    run_dir = Path(run_dir).absolute()
    cfg = ModelConfig.load(run_dir / "model_config.json")
    activation = class_activation or ("sigmoid" if _is_multilabel(run_dir) else "softmax")
    model = build_dscnn(cfg, class_activation=activation)
    template = shape_init(model, cfg)
    target = {"params": template["params"]}
    if "batch_stats" in template:
        target["batch_stats"] = template["batch_stats"]
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(run_dir / "best", target)
    return model, restored, cfg


def _is_multilabel(run_dir: Path) -> bool:
    state = run_dir / "train_state.json"
    if state.exists():
        return bool(json.loads(state.read_text()).get("multilabel", False))
    return False


def save_train_state(run_dir: str | Path, epoch: int, **extra) -> None:
    """{"epoch": N, ...} for resume (reference trainer.py:135-140)."""
    p = Path(run_dir) / "train_state.json"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps({"epoch": int(epoch), **extra}))


def load_train_state(run_dir: str | Path) -> dict:
    p = Path(run_dir) / "train_state.json"
    return json.loads(p.read_text()) if p.exists() else {}


def append_history_csv(run_dir: str | Path, epoch: int, metrics: dict) -> None:
    """Append one epoch row (header on first write), trainer.py:142-162."""
    import csv

    p = Path(run_dir) / "history.csv"
    write_header = not p.exists()
    fieldnames = ["epoch"] + sorted(metrics.keys())
    if not write_header:
        # Resume appends to an existing file: keep ITS column set (a run
        # resumed across a version that added metric columns must not
        # write misaligned rows; extra keys are dropped). A truncated /
        # empty file (crash between create and writeheader) falls back to
        # a fresh header instead of ['']-fieldnames that would drop every
        # metric silently.
        with open(p) as f:
            existing = f.readline().strip().split(",")
        if existing and existing[0] == "epoch":
            fieldnames = existing
        else:
            write_header = True
    with open(p, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames,
                                extrasaction="ignore")
        if write_header:
            writer.writeheader()
        row = {"epoch": epoch}
        row.update({k: f"{float(v):.6f}" for k, v in metrics.items()})
        writer.writerow(row)


def save_training_curves(run_dir: str | Path, history: list[dict]) -> None:
    """Loss/ROC-AUC curves PNG (reference trainer.py:193-242)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    if not history:
        return
    epochs = np.arange(1, len(history) + 1)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(epochs, [h.get("loss", np.nan) for h in history], label="train")
    axes[0].plot(epochs, [h.get("val_loss", np.nan) for h in history], label="val")
    axes[0].set_title("loss")
    axes[0].set_xlabel("epoch")
    axes[0].legend()
    axes[1].plot(epochs, [h.get("val_roc_auc", np.nan) for h in history], label="val roc-auc")
    axes[1].set_title("ROC-AUC")
    axes[1].set_xlabel("epoch")
    axes[1].legend()
    fig.tight_layout()
    fig.savefig(Path(run_dir) / "curves.png", dpi=100)
    plt.close(fig)
