"""Chunk-to-file score pooling: average, max, log-mean-exp.

Parity with reference evaluation/pooling.py:6-47, plus a batched segment
variant so a whole evaluation's chunk scores pool on device in one shot.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

POOLING_METHODS = ("avg", "mean", "average", "max", "lme", "log_mean_exp", "log_mean_exponential")


# Method-name aliases accepted by the reference CLI (pooling.py:37-47).
_AVG_NAMES = frozenset({"avg", "mean", "average"})
_LME_NAMES = frozenset({"lme", "log_mean_exp", "log_mean_exponential"})


def lme_pooling(scores: np.ndarray, beta: float = 10.0) -> np.ndarray:
    """Temperature-weighted soft pooling over the chunk axis.

    Numerically: log(mean(exp(beta * s))) / beta, computed in shifted form
    (subtract the per-class max before exponentiating) so large beta can't
    overflow. The temperature interpolates mean (beta -> 0) and max
    (beta -> inf). Behavioral parity: reference pooling.py:6-23, including
    its epsilon inside the log.
    """
    if scores.size == 0:
        return scores
    z = beta * scores
    shift = z.max(axis=0, keepdims=True)
    soft_mean = np.exp(z - shift).mean(axis=0, keepdims=True)
    return ((shift + np.log(soft_mean + 1e-12)) / beta).ravel()


def pool_scores(chunk_scores: np.ndarray, method: str = "average", beta: float = 10.0) -> np.ndarray:
    """[N_chunks, C] -> [C] file-level scores (reference pooling.py:25-48)."""
    if chunk_scores.ndim != 2:
        raise ValueError("chunk_scores must be [N_chunks, C]")
    if len(chunk_scores) == 0:
        return np.zeros(chunk_scores.shape[1], np.float32)
    m = method.lower()
    if m in _AVG_NAMES:
        return chunk_scores.mean(axis=0)
    if m == "max":
        return chunk_scores.max(axis=0)
    if m in _LME_NAMES:
        return lme_pooling(chunk_scores, beta=beta)
    raise ValueError(f"Unsupported pooling method: {method}")


def segment_pool(
    chunk_scores: jax.Array,
    file_ids: jax.Array,
    num_files: int,
    method: str = "average",
    beta: float = 10.0,
) -> jax.Array:
    """Pool [N, C] chunk scores into [num_files, C] by file id, on device.

    TPU-first evaluation pools every file at once with segment reductions
    instead of the reference's per-file Python loop (metrics.py:75-147).
    """
    method = method.lower()
    raw_counts = jax.ops.segment_sum(jnp.ones_like(chunk_scores[:, :1]),
                                     file_ids, num_files)
    empty = raw_counts <= 0  # [num_files, 1]
    counts = jnp.maximum(raw_counts, 1.0)
    if method in ("avg", "mean", "average"):
        sums = jax.ops.segment_sum(chunk_scores, file_ids, num_files)
        return sums / counts
    if method == "max":
        # segment_max fills empty segments with -inf; pool_scores (the host
        # twin) returns zeros for a chunk-less file — match it so AP/AUC
        # downstream stay finite.
        pooled = jax.ops.segment_max(chunk_scores, file_ids, num_files)
        return jnp.where(empty, 0.0, pooled)
    if method in ("lme", "log_mean_exp", "log_mean_exponential"):
        m = jax.ops.segment_max(beta * chunk_scores, file_ids, num_files)
        m = jnp.where(empty, 0.0, m)  # keep the empty rows' math finite
        shifted = jnp.exp(beta * chunk_scores - m[file_ids])
        mean = jax.ops.segment_sum(shifted, file_ids, num_files) / counts
        pooled = (m + jnp.log(mean + 1e-12)) / beta
        return jnp.where(empty, 0.0, pooled)
    raise ValueError(f"Unsupported pooling method: {method}")
