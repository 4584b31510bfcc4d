"""Quantization validation metrics: cosine, Pearson, MSE/MAE sweeps.

Parity with reference conversion/validate.py:7-103, including its edge-case
semantics: two near-zero vectors are perfectly similar (1.0), one zero and
one non-zero are dissimilar (0.0).
"""

from __future__ import annotations

import numpy as np


def cosine_similarity(a: np.ndarray, b: np.ndarray, eps: float = 1e-12) -> float:
    """Cosine similarity with the reference's zero-vector conventions."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < eps and nb < eps:
        return 1.0
    if na < eps or nb < eps:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def pearson_correlation(a: np.ndarray, b: np.ndarray, eps: float = 1e-12) -> float:
    """Pearson r with the same degenerate-input conventions."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    sa, sb = a.std(), b.std()
    if sa < eps and sb < eps:
        return 1.0
    if sa < eps or sb < eps:
        return 0.0
    return float(np.corrcoef(a, b)[0, 1])


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
