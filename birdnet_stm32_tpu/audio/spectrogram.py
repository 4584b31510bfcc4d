"""Host-convenience spectrogram API, import-path compatible with the
reference (`birdnet_stm32/audio/spectrogram.py:5-60`).

The actual feature extractor is the batched, jitted, device-side
`birdnet_stm32_tpu.ops.spectrogram.spectrogram_batch` (same parameter
names and semantics). This module exposes the reference's single-sample
host signatures on top of it so existing user code ports verbatim:

    from birdnet_stm32_tpu.audio.spectrogram import get_spectrogram_from_audio
"""

from __future__ import annotations

import numpy as np

from birdnet_stm32_tpu.ops.spectrogram import VALID_MODES, spectrogram_batch

__all__ = ["VALID_MODES", "get_spectrogram_from_audio", "normalize"]


def normalize(S: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0, 1] (reference audio/spectrogram.py:12-21)."""
    S = np.asarray(S)
    return (S - S.min()) / (S.max() - S.min() + 1e-10)


def get_spectrogram_from_audio(
    audio: np.ndarray,
    sample_rate: int = 24000,
    n_fft: int = 512,
    mel_bins: int = 64,
    spec_width: int = 256,
    mag_scale: str = "none",
    mode: str = "mel",
    n_mfcc: int = 20,
) -> np.ndarray:
    """Single-sample twin of the reference extractor (audio/spectrogram.py:24-149).

    Runs the device-side batched pipeline on a batch of one and returns a
    numpy [bins, spec_width] array in [0, 1], freq-major like the reference.
    """
    import jax.numpy as jnp

    audio = np.asarray(audio, np.float32)
    if audio.ndim != 1:
        raise ValueError(f"expected 1D mono audio, got shape {audio.shape}")
    out = spectrogram_batch(
        jnp.asarray(audio)[None],
        sample_rate=sample_rate,
        n_fft=n_fft,
        mel_bins=mel_bins,
        spec_width=spec_width,
        mag_scale=mag_scale,
        mode=mode,
        n_mfcc=n_mfcc,
    )
    return np.asarray(out[0])
