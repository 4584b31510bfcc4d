"""Independent numpy implementation of the reference DSP semantics.

This is the tests' golden oracle: a direct, loop-based transcription of the
documented librosa 0.11 semantics the reference relies on (librosa itself is
not installed in this environment). Deliberately written in the most naive
way possible — per-frame loops, float64 — so it shares no code path with the
framework's vectorized JAX ops.
"""

from __future__ import annotations

import numpy as np
from scipy.fft import dct as scipy_dct
from scipy.signal import lfilter, lfilter_zi


def hann_periodic(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft_mag(y, n_fft, hop):
    """librosa.stft magnitude: center=True, zero pad, periodic hann. [F, W].

    Even n_fft only (the symmetric n_fft//2 centering pad and the full-frame
    argument below assume it; every reference config uses powers of two)."""
    if n_fft % 2:
        raise ValueError(f"stft_mag implements even n_fft only (got {n_fft})")
    pad = n_fft // 2
    yp = np.pad(y.astype(np.float64), (pad, pad))
    n_frames = 1 + len(y) // hop
    win = hann_periodic(n_fft)
    cols = []
    for k in range(n_frames):
        # Every frame is full: the last start (len(y)//hop)*hop + n_fft
        # <= len(y) + n_fft == len(yp) (librosa's centered padding never
        # produces partial trailing frames).
        fr = yp[k * hop : k * hop + n_fft]
        cols.append(np.abs(np.fft.rfft(fr * win)))
    return np.stack(cols, axis=1)


def hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        idx = f >= min_log_hz
        mels[idx] = min_log_mel + np.log(f[idx] / min_log_hz) / logstep
    elif f >= min_log_hz:
        mels = min_log_mel + np.log(f / min_log_hz) / logstep
    return mels


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    idx = m >= min_log_mel
    freqs[idx] = min_log_hz * np.exp(logstep * (m[idx] - min_log_mel))
    return freqs


def mel_fb(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel(htk=False, norm='slaney'). [M, F]."""
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    weights = np.zeros((n_mels, len(fftfreqs)))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights


def melspectrogram(y, sr, n_fft, hop, n_mels, power, fmin, fmax):
    S = stft_mag(y, n_fft, hop) ** power
    return mel_fb(sr, n_fft, n_mels, fmin, fmax) @ S


def power_to_db(S, ref, amin=1e-10, top_db=80.0):
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def amplitude_to_db(S, ref, amin=1e-5, top_db=80.0):
    return power_to_db(S**2, ref=ref**2, amin=amin**2, top_db=top_db)


def pcen(S, sr, hop_length, gain=0.98, bias=2.0, power=0.5, time_constant=0.400, eps=1e-6, axis=1):
    t_frames = time_constant * sr / float(hop_length)
    b = (np.sqrt(1 + 4 * t_frames**2) - 1) / (2 * t_frames**2)
    zi_base = lfilter_zi([b], [1, b - 1])
    S_move = np.moveaxis(S, axis, -1)
    zi_full = (zi_base * np.moveaxis(np.take(S, [0], axis=axis), axis, -1)).astype(np.float64)
    M, _ = lfilter([b], [1, b - 1], S_move, axis=-1, zi=zi_full)
    M = np.moveaxis(M, -1, axis)
    smooth = np.exp(-gain * (np.log(eps) + np.log1p(M / eps)))
    return (bias**power) * np.expm1(power * np.log1p(S * smooth / bias))


def normalize(S):
    return (S - S.min()) / (S.max() - S.min() + 1e-10)


def get_spectrogram(audio, sr, n_fft=512, mel_bins=64, spec_width=256, mag_scale="none", mode="mel", n_mfcc=20):
    """Behavioral twin of reference audio/spectrogram.py:24-149 (hop =
    T//spec_width at :61; mode/mag-scale matrix at :42-147), written as a
    straight numpy pipeline for golden tests."""
    hop = (len(audio) // spec_width) if spec_width > 0 else n_fft // 2

    if mode == "mfcc":
        S_mel = melspectrogram(audio, sr, n_fft, hop, mel_bins, 2.0, 150, sr // 2)
        S_log = power_to_db(S_mel, ref=S_mel.max())
        S = scipy_dct(S_log, axis=-2, type=2, norm="ortho")[:n_mfcc]
        return normalize(S[:, :spec_width])

    if mode == "log_mel":
        S = melspectrogram(audio, sr, n_fft, hop, mel_bins, 1.0, 150, sr // 2)
        return normalize(np.log1p(S[:, :spec_width]))

    if mel_bins <= 0 or mode == "linear":
        S = stft_mag(audio, n_fft, hop)
    else:
        S = melspectrogram(audio, sr, n_fft, hop, mel_bins, 1.0, 150, sr // 2)
    S = S[:, :spec_width]

    if mag_scale == "pcen":
        S = pcen(S * (2.0**31), sr, hop, axis=1)
    elif mag_scale == "pwl":
        # 4-segment piecewise-linear compression (reference
        # spectrogram.py:139-144 constants): base slope on the min-max
        # normalized magnitude plus hinge terms at each breakpoint.
        Sn = (S - S.min()) / (S.max() - S.min() + 1e-10)
        S = 0.40 * Sn
        for knee, slope in ((0.10, 0.25), (0.35, 0.15), (0.65, 0.08)):
            S = S + slope * np.maximum(Sn - knee, 0.0)
    elif mag_scale == "db":
        S = amplitude_to_db(S, ref=S.max())
    return normalize(S)
