"""Hyperparameter search: random sampling with median pruning.

The reference uses Optuna's TPE + MedianPruner (training/tuner.py:18-211);
Optuna is not available in this environment, so this is a self-contained
random-search tuner over the same space with the same per-epoch median
pruning rule: a trial is stopped when its intermediate val-AUC falls below
the median of completed trials at the same epoch.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

import numpy as np

# Search space (reference tuner.py:18-61).
SPACE = {
    "alpha": ("float", 0.25, 1.5),
    "depth_multiplier": ("int", 1, 3),
    "embeddings_size": ("choice", [64, 128, 256]),
    "learning_rate": ("logfloat", 1e-4, 1e-2),
    "dropout_rate": ("float", 0.2, 0.6),
    "batch_size": ("choice", [16, 32, 64]),
    "mixup_probability": ("float", 0.0, 0.5),
    "label_smoothing": ("float", 0.0, 0.1),
    "optimizer": ("choice", ["adam", "adamw", "sgd"]),
    "weight_decay": ("logfloat", 1e-6, 1e-3),
    "gradient_clip_norm": ("choice", [0.0, 1.0, 5.0]),
    "use_se": ("choice", [True, False]),
    "use_inverted_residual": ("choice", [True, False]),
    "use_attention_pooling": ("choice", [True, False]),
}
CONDITIONAL = {
    "se_reduction": ("choice", [4, 8, 16]),        # only if use_se
    "expansion_factor": ("choice", [2, 4, 6]),      # only if use_inverted_residual
}


def sample_params(rng: np.random.Generator) -> dict:
    """Draw one configuration from the search space."""
    def draw(spec):
        kind = spec[0]
        if kind == "float":
            return float(rng.uniform(spec[1], spec[2]))
        if kind == "logfloat":
            return float(np.exp(rng.uniform(np.log(spec[1]), np.log(spec[2]))))
        if kind == "int":
            return int(rng.integers(spec[1], spec[2] + 1))
        if kind == "choice":
            return spec[1][int(rng.integers(len(spec[1])))]
        raise ValueError(kind)

    params = {k: draw(v) for k, v in SPACE.items()}
    if params["use_se"]:
        params["se_reduction"] = draw(CONDITIONAL["se_reduction"])
    if params["use_inverted_residual"]:
        params["expansion_factor"] = draw(CONDITIONAL["expansion_factor"])
    return params


class Pruned(Exception):
    """Raised inside an objective to stop a bad trial early."""


@dataclass
class Trial:
    number: int
    params: dict
    intermediate: list[float] = field(default_factory=list)
    value: float | None = None
    pruned: bool = False

    def report(self, value: float, step: int, study: "Study") -> None:
        self.intermediate.append(float(value))
        if study.should_prune(step, value):
            self.pruned = True
            raise Pruned()


@dataclass
class Study:
    """Random-search study with median pruning (maximization)."""

    seed: int = 0
    n_warmup_trials: int = 3
    n_warmup_steps: int = 1
    trials: list[Trial] = field(default_factory=list)

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def should_prune(self, step: int, value: float) -> bool:
        completed = [t for t in self.trials if t.value is not None]
        if len(completed) < self.n_warmup_trials or step < self.n_warmup_steps:
            return False
        peers = [t.intermediate[step] for t in completed if len(t.intermediate) > step]
        if len(peers) < self.n_warmup_trials:
            return False
        return value < float(np.median(peers))

    def optimize(self, objective: Callable[[Trial], float], n_trials: int) -> None:
        for i in range(n_trials):
            trial = Trial(number=len(self.trials), params=sample_params(self._rng))
            self.trials.append(trial)
            try:
                trial.value = float(objective(trial))
            except Pruned:
                trial.value = None

    @property
    def best_trial(self) -> Trial:
        done = [t for t in self.trials if t.value is not None]
        if not done:
            raise RuntimeError("no completed trials")
        return max(done, key=lambda t: t.value)


def run_tuning(objective: Callable[[Trial], float], n_trials: int,
               out_dir: str | Path, seed: int = 0) -> Trial:
    """Run a study and persist best params JSON (reference tuner.py:223-247)."""
    study = Study(seed=seed)
    study.optimize(objective, n_trials)
    best = study.best_trial
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "best_params.json").write_text(json.dumps(
        {"value": best.value, "params": best.params, "trial": best.number}, indent=2))
    return best
