"""DCT-II with orthonormal scaling, as an MXU matmul.

Used by the MFCC frontend (reference: librosa.feature.mfcc with
norm="ortho", audio/spectrogram.py:79-83). On TPU a dense [M, K] DCT basis
matmul is faster than any FFT-based factorization at these sizes (M=64).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dct_matrix(n_in: int, n_out: int, dtype=np.float32) -> np.ndarray:
    """Orthonormal DCT-II basis.

    y[k] = s_k * sum_n x[n] * 2*cos(pi*(2n+1)*k / (2N)), with
    s_0 = sqrt(1/(4N)) and s_k = sqrt(1/(2N)) for k > 0 — identical to
    `scipy.fft.dct(x, type=2, norm="ortho")`.

    Args:
        n_in: Input length N (number of mel bands).
        n_out: Number of coefficients kept.

    Returns:
        [n_in, n_out] matrix so that `coeffs = x @ dct_matrix`.
    """
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)
    basis = 2.0 * np.cos(np.pi * (2.0 * n[:, None] + 1.0) * k[None, :] / (2.0 * n_in))
    scale = np.full((n_out,), np.sqrt(1.0 / (2.0 * n_in)))
    scale[0] = np.sqrt(1.0 / (4.0 * n_in))
    return (basis * scale[None, :]).astype(dtype)


def dct2_ortho(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Apply orthonormal DCT-II along the last axis.

    Args:
        x: [..., n_in] input.
        n_out: Number of output coefficients.

    Returns:
        [..., n_out] DCT coefficients.
    """
    mat = jnp.asarray(dct_matrix(x.shape[-1], n_out), dtype=x.dtype)
    return x @ mat
