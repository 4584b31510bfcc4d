"""Waveform batch -> model-input batch for every frontend.

Replicates the reference's per-chunk feature preparation that is scattered
across data/generator.py:115-165 and evaluation/metrics.py:50-71, as one
jitted batched function:

- librosa  -> mel spectrogram with the configured mag_scale, [B, M, W, 1]
- mfcc     -> MFCC features (mag_scale forced to 'none'),    [B, n_mfcc, W, 1]
- log_mel  -> log1p mel (mag_scale forced to 'none'),        [B, M, W, 1]
- hybrid   -> linear |STFT| normalized to [0, 1],            [B, F, W, 1]
- raw      -> peak-normalized waveform,                      [B, T, 1]

The in-graph halves (mel mixer, learned filterbank, trainable magnitude
scaling) live in models/frontend_layer.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch


@partial(
    jax.jit,
    static_argnames=(
        "audio_frontend",
        "sample_rate",
        "n_fft",
        "mel_bins",
        "spec_width",
        "mag_scale",
        "n_mfcc",
        "chunk_samples",
        "stft_precision",
        "feature_dtype",
    ),
)
def waveform_to_input(
    audio: jax.Array,
    audio_frontend: str,
    sample_rate: int,
    n_fft: int,
    mel_bins: int,
    spec_width: int,
    mag_scale: str,
    n_mfcc: int,
    chunk_samples: int,
    stft_precision: str = "highest",
    feature_dtype=None,
) -> jax.Array:
    """Map [B, T] waveforms to the model input for the given frontend.

    feature_dtype=jnp.bfloat16 emits bf16 features via the bf16-I/O STFT
    (ops/stft.py) — for consumers (bf16 serving) that cast to bf16 anyway.
    """
    if audio_frontend == "raw":
        x = audio[:, :chunk_samples]
        if x.shape[1] < chunk_samples:
            x = jnp.pad(x, ((0, 0), (0, chunk_samples - x.shape[1])))
        peak = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        x = (x / (peak + 1e-6))[..., None]  # [B, T, 1]
        return x.astype(feature_dtype) if feature_dtype is not None else x

    if audio_frontend == "hybrid":
        S = spectrogram_batch(
            audio, sample_rate=sample_rate, n_fft=n_fft, mel_bins=-1,
            spec_width=spec_width, mag_scale="none", mode="linear",
            stft_precision=stft_precision, feature_dtype=feature_dtype,
        )
    elif audio_frontend in ("mfcc", "log_mel"):
        S = spectrogram_batch(
            audio, sample_rate=sample_rate, n_fft=n_fft, mel_bins=mel_bins,
            spec_width=spec_width, mag_scale="none", mode=audio_frontend, n_mfcc=n_mfcc,
            stft_precision=stft_precision, feature_dtype=feature_dtype,
        )
    elif audio_frontend == "librosa":
        S = spectrogram_batch(
            audio, sample_rate=sample_rate, n_fft=n_fft, mel_bins=mel_bins,
            spec_width=spec_width, mag_scale=mag_scale, mode="mel",
            stft_precision=stft_precision, feature_dtype=feature_dtype,
        )
    else:
        raise ValueError(f"Invalid audio frontend: {audio_frontend!r}")
    return S[..., None]  # [B, bins, W, 1]


def inputs_for_config(audio: jax.Array, cfg: ModelConfig,
                      stft_precision: str = "highest",
                      feature_dtype=None) -> jax.Array:
    """Convenience wrapper taking a ModelConfig.

    stft_precision: 'highest' (librosa-parity, default) | 'high'
    (serving-grade, ~1e-6 relative error, ~half the frontend MXU work) |
    'default' (fastest, measurable score drift — see docs/performance.md).
    feature_dtype: None (parity) | jnp.bfloat16 (bf16 serving — bf16-I/O
    STFT, half the frontend's intermediate HBM traffic).
    """
    return waveform_to_input(
        audio,
        audio_frontend=cfg.audio_frontend,
        sample_rate=cfg.sample_rate,
        n_fft=cfg.fft_length,
        mel_bins=cfg.num_mels,
        spec_width=cfg.spec_width,
        mag_scale=cfg.mag_scale,
        n_mfcc=cfg.n_mfcc,
        chunk_samples=cfg.chunk_samples,
        stft_precision=stft_precision,
        feature_dtype=feature_dtype,
    )
