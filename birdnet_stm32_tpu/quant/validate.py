"""Quantization validation metrics: cosine, Pearson, MSE/MAE sweeps.

Parity with reference conversion/validate.py:7-103, including its edge-case
semantics: two near-zero vectors are perfectly similar (1.0), one zero and
one non-zero are dissimilar (0.0).
"""

from __future__ import annotations

import numpy as np


def cosine_similarity(a: np.ndarray, b: np.ndarray, eps: float = 1e-8) -> float:
    """Cosine similarity with the reference's zero-vector conventions
    (validate.py:7-29: eps 1e-8; both near-zero -> 1.0, one -> 0.0)."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < eps and nb < eps:
        return 1.0
    if na < eps or nb < eps:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def pearson_correlation(a: np.ndarray, b: np.ndarray, eps: float = 1e-12) -> float:
    """Pearson r, reference degenerate semantics (validate.py:32-48): when
    the PRODUCT of centered norms is < eps — i.e. EITHER side is constant —
    return 1.0 (its zero-variance guard), not 0.0."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    a = a - a.mean()
    b = b - b.mean()
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom < eps:
        return 1.0
    return float(np.dot(a, b) / denom)


def validate_runners(runner_a, runner_b, inputs: np.ndarray, batch_size: int = 32) -> dict:
    """Compare two runners sample-by-sample (reference validate_models:51-103).

    Args:
        runner_a: Reference runner (e.g. float model).
        runner_b: Candidate runner (e.g. INT8 sim).
        inputs: [N, ...] model inputs.
        batch_size: Inference batch size.

    Returns:
        Dict of mean/std/min/max for cosine, and mean MSE/MAE/Pearson.
    """
    if len(inputs) == 0:
        # Defined defaults instead of a zero-size reduction crash
        # (reference validate_models tolerates empty result lists).
        return {"cosine_mean": float("nan"), "cosine_std": float("nan"),
                "cosine_min": float("nan"), "cosine_max": float("nan"),
                "pearson_mean": float("nan"), "mse_mean": float("nan"),
                "mae_mean": float("nan"), "n_samples": 0}
    cosines, pearsons, mses, maes = [], [], [], []
    for i in range(0, len(inputs), batch_size):
        chunk = inputs[i : i + batch_size]
        ya = np.asarray(runner_a.predict(chunk))
        yb = np.asarray(runner_b.predict(chunk))
        for j in range(chunk.shape[0]):
            cosines.append(cosine_similarity(ya[j], yb[j]))
            pearsons.append(pearson_correlation(ya[j], yb[j]))
            mses.append(float(np.mean((ya[j] - yb[j]) ** 2)))
            maes.append(float(np.mean(np.abs(ya[j] - yb[j]))))
    c = np.asarray(cosines)
    return {
        "cosine_mean": float(c.mean()),
        "cosine_std": float(c.std()),
        "cosine_min": float(c.min()),
        "cosine_max": float(c.max()),
        "pearson_mean": float(np.mean(pearsons)),
        "mse_mean": float(np.mean(mses)),
        "mae_mean": float(np.mean(maes)),
        "n_samples": len(cosines),
    }
