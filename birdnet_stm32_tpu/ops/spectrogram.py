"""Batched spectrogram features on device.

TPU-native twin of the reference host feature extractor
`get_spectrogram_from_audio` (audio/spectrogram.py:24-149): one jitted call
maps a [B, T] waveform batch to [B, bins, W] features, instead of per-file
librosa calls inside multiprocessing workers. Modes and magnitude-scaling
semantics (including normalization placement, PCEN's 2^31 PCM scaling, and
power_to_db's ref=max over *unsliced* frames in mfcc mode) are replicated
exactly; golden tests pin them against a pure-numpy reference.

The pipeline is MXU/VPU friendly: frame gather -> rFFT -> |.| -> mel matmul
-> elementwise compression, all fused by XLA within one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.ops import magnitude as mag_ops
from birdnet_stm32_tpu.ops.dct import dct2_ortho
from birdnet_stm32_tpu.ops.mel import mel_filterbank
from birdnet_stm32_tpu.ops.stft import stft_magnitude

VALID_MODES = ("mel", "mfcc", "log_mel", "linear")


@partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "mel_bins", "spec_width", "mag_scale", "mode", "n_mfcc", "stft_precision", "feature_dtype"),
)
def spectrogram_batch(
    audio: jax.Array,
    sample_rate: int = 24000,
    n_fft: int = 512,
    mel_bins: int = 64,
    spec_width: int = 256,
    mag_scale: str = "none",
    mode: str = "mel",
    n_mfcc: int = 20,
    stft_precision: str = "highest",
    feature_dtype=None,
) -> jax.Array:
    """Compute magnitude spectrogram features for a batch of waveforms.

    Args:
        audio: [B, T] mono waveforms.
        sample_rate: Sample rate in Hz.
        n_fft: FFT size.
        mel_bins: Mel band count; <= 0 selects linear STFT bins.
        spec_width: Output frame count W (hop = T // W).
        mag_scale: 'none' | 'pcen' | 'pwl' | 'db' (mel/linear modes only).
        mode: 'mel' | 'mfcc' | 'log_mel' | 'linear'.
        n_mfcc: Coefficients kept in mfcc mode.
        feature_dtype: None keeps audio.dtype end-to-end (the parity
            path). jnp.bfloat16 serves consumers that cast features to
            bf16 anyway (bf16 serving): the STFT runs its bf16-I/O
            formulation (ops/stft.py — half the intermediate HBM traffic),
            the epilogue computes in f32 off bf16-resident tensors, and
            the output is bf16. Ignored in mfcc mode (power_to_db's
            dynamic range wants the f32 pipeline; only the final cast
            applies).

    Returns:
        [B, bins, spec_width] features in [0, 1] (bins = mel_bins, n_mfcc,
        or n_fft//2+1 depending on mode), freq-major like the reference.
    """
    if mode not in VALID_MODES:
        raise ValueError(f"Invalid mode: {mode!r}")
    B, T = audio.shape
    if mode == "mfcc" and mel_bins <= 0:
        raise ValueError("mfcc mode needs mel_bins > 0 (DCT runs over mel bands)")
    # hop = T // spec_width (reference spectrogram.py:61); max(1, .) guards
    # T < spec_width like config.hop_length. spec_width <= 0 means "all
    # frames" at n_fft//2 — the REFERENCE's explicit fallback
    # (spectrogram.py:63), not librosa's default (which is n_fft//4).
    hop = max(1, T // spec_width) if spec_width > 0 else n_fft // 2
    sample_axes = (1, 2)

    linear_mode = mel_bins <= 0 or mode == "linear"
    # librosa (center=True) yields 1 + T//hop frames; the reference slices to
    # spec_width *before* any stats except in mfcc mode, where power_to_db's
    # ref/top_db max runs over the full frame count.
    n_frames_full = 1 + T // hop
    if mode == "mfcc" or spec_width <= 0:
        n_frames = n_frames_full
    else:
        n_frames = min(spec_width, n_frames_full)

    S = stft_magnitude(audio, n_fft=n_fft, hop=hop, n_frames=n_frames, center=True,
                       precision=stft_precision,
                       out_dtype=None if mode == "mfcc" else feature_dtype)  # [B, W, F]

    if not linear_mode:
        power = 2.0 if mode == "mfcc" else 1.0
        if power != 1.0:
            S = jnp.square(S)
        fb = jnp.asarray(
            # fmax floors like the reference (spectrogram.py:74: sample_rate // 2)
            # so odd sample rates produce identical band edges.
            mel_filterbank(sample_rate, n_fft, mel_bins, fmin=150.0,
                           fmax=float(sample_rate // 2)),
            dtype=S.dtype,
        )
        S = S @ fb  # [B, W, M] on the MXU

    S = jnp.swapaxes(S, 1, 2)  # [B, bins, W] freq-major
    out_dtype = feature_dtype or S.dtype

    if mode == "mfcc":
        ref = jnp.max(S, axis=sample_axes, keepdims=True)
        S_log = mag_ops.power_to_db(S, ref=ref, top_db=80.0, axis=sample_axes)
        S = dct2_ortho(jnp.swapaxes(S_log, 1, 2), n_mfcc)  # DCT over mel axis
        S = jnp.swapaxes(S, 1, 2)
        if spec_width > 0:
            S = S[:, :, :spec_width]
        return mag_ops.normalize_minmax(S, axis=sample_axes).astype(out_dtype)

    if feature_dtype is not None and S.dtype != jnp.float32:
        # Epilogue math in f32 (XLA fuses the upcast into the reads of the
        # bf16-resident magnitude/mel tensor — no extra HBM traffic).
        S = S.astype(jnp.float32)

    if mode == "log_mel":
        S = jnp.log1p(S)
        return mag_ops.normalize_minmax(S, axis=sample_axes).astype(out_dtype)

    # 'mel' and 'linear' modes share the mag_scale behavior matrix.
    if mag_scale == "pcen":
        S = mag_ops.pcen(S * (2.0**31), sr=sample_rate, hop_length=hop)
    elif mag_scale == "pwl":
        S = mag_ops.pwl_compress(mag_ops.normalize_minmax(S, axis=sample_axes))
    elif mag_scale == "db":
        ref = jnp.max(S, axis=sample_axes, keepdims=True)
        S = mag_ops.amplitude_to_db(S, ref=ref, top_db=80.0, axis=sample_axes)

    return mag_ops.normalize_minmax(S, axis=sample_axes).astype(out_dtype)
