"""Generate committed DSP golden files pinning the test oracle to
EXTERNAL implementations (VERDICT r1 finding #2: every 'librosa parity'
claim previously bottomed out in tests/ref_dsp.py, a self-authored numpy
twin — nothing independent pinned its conventions).

Two tiers, by what's installed:

1. ``tests/goldens/external_goldens.npz`` — generated HERE (this
   environment has torch-cpu + scipy, but no librosa/torchaudio):
   - |STFT| magnitudes from ``torch.stft`` (center=True, periodic Hann,
     constant/zero padding — librosa's exact conventions) in float64, for
     fixed deterministic signals across the shipped geometries. Pins the
     framing/centering/window conventions of tests/ref_dsp.py and
     ops/stft.py to an implementation we didn't write.
   - DCT-II ortho matrices from ``scipy.fft.dct``. (ref_dsp already calls
     scipy directly; this pins ops/dct.py's matrix form too.)

2. ``tests/goldens/librosa_goldens.npz`` — run this script in ANY
   environment with librosa >= 0.10 installed to produce the real-librosa
   goldens (mel filterbanks + full get_spectrogram_from_audio outputs for
   the whole mode x mag_scale matrix, reference
   birdnet_stm32/audio/spectrogram.py:24-147). librosa is NOT installable
   here (zero egress, no wheel on disk) — tests/test_dsp_goldens.py gates
   on the file when present and records the blocked state otherwise.

Both files embed provenance (library versions, generation parameters).
Signals are fully deterministic (seeded PRNG + closed-form chirps), so
regeneration is reproducible anywhere.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

OUT_DIR = Path(__file__).resolve().parents[1] / "tests" / "goldens"

# (sr, n_fft, spec_width, mel_bins): the shipped flagship geometry plus the
# small test geometries the suite exercises.
GEOMETRIES = [
    (22050, 512, 256, 64),
    (8000, 256, 32, 32),
    (4000, 128, 32, 16),
]
DURATION_S = 1.0  # keeps the committed NPZ small; conventions don't scale


def make_signals(sr: int) -> dict[str, np.ndarray]:
    """Deterministic test signals (float64)."""
    t = np.arange(int(sr * DURATION_S)) / sr
    rng = np.random.default_rng(1234)
    return {
        "chirp": (np.sin(2 * np.pi * (0.05 * sr * t + 0.08 * sr * t**2))
                  * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))),
        "noise": rng.normal(0.0, 0.25, t.shape),
    }


def gen_external() -> Path:
    import scipy
    import scipy.fft
    import torch

    arrays: dict[str, np.ndarray] = {}
    for sr, n_fft, spec_width, _ in GEOMETRIES:
        for name, y in make_signals(sr).items():
            hop = max(1, len(y) // spec_width)
            S = torch.stft(
                torch.from_numpy(y),  # float64 -> float64 precision golden
                n_fft=n_fft,
                hop_length=hop,
                window=torch.hann_window(n_fft, periodic=True, dtype=torch.float64),
                center=True,
                pad_mode="constant",  # zero pad == librosa stft default
                return_complex=True,
            ).abs().numpy()  # [F, frames]
            n_frames = 1 + len(y) // hop  # librosa frame count
            arrays[f"stft/{name}/{sr}/{n_fft}/{hop}"] = S[:, :n_frames]
    for n in (16, 32, 64):
        eye = np.eye(n)
        arrays[f"dct2_ortho/{n}"] = scipy.fft.dct(eye, type=2, norm="ortho", axis=1)

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    out = OUT_DIR / "external_goldens.npz"
    np.savez_compressed(
        out,
        __provenance__=np.array(
            f"torch=={torch.__version__} scipy=={scipy.__version__} "
            f"numpy=={np.__version__}; scripts/gen_dsp_goldens.py; "
            f"signals: seeded rng(1234) noise + closed-form chirp, {DURATION_S}s"),
        **arrays,
    )
    print(f"[goldens] wrote {out} ({out.stat().st_size} bytes, {len(arrays)} arrays)")
    return out


def gen_librosa() -> Path | None:
    try:
        import librosa
    except ImportError:
        print("[goldens] librosa not installed — skipping librosa_goldens.npz "
              "(run this script in an environment with librosa >= 0.10)")
        return None

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    arrays: dict[str, np.ndarray] = {}
    # Mel filterbanks: the reference's exact call (spectrogram.py:117-130).
    for sr, n_fft, _, mel_bins in GEOMETRIES:
        arrays[f"mel_fb/{sr}/{n_fft}/{mel_bins}"] = librosa.filters.mel(
            sr=sr, n_fft=n_fft, n_mels=mel_bins, fmin=150, fmax=sr // 2)

    # Full reference feature matrix: a faithful transcription of
    # get_spectrogram_from_audio (reference audio/spectrogram.py:24-147)
    # evaluated with REAL librosa calls.
    def normalize(S):
        return (S - S.min()) / (S.max() - S.min() + 1e-10)

    def reference_features(audio, sr, n_fft, spec_width, mel_bins, mode, mag):
        hop = max(1, len(audio) // spec_width) if spec_width > 0 else n_fft // 2
        if mode == "mfcc":
            S = librosa.feature.melspectrogram(
                y=audio, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=mel_bins,
                power=2.0, fmin=150, fmax=sr // 2)
            M = librosa.feature.mfcc(S=librosa.power_to_db(S), n_mfcc=20)
            return normalize(M[:, :spec_width])
        if mode == "log_mel":
            S = librosa.feature.melspectrogram(
                y=audio, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=mel_bins,
                power=1.0, fmin=150, fmax=sr // 2)[:, :spec_width]
            return normalize(np.log1p(S))
        if mode == "linear":
            S = np.abs(librosa.stft(y=audio, n_fft=n_fft, hop_length=hop))[:, :spec_width]
        else:  # mel
            S = librosa.feature.melspectrogram(
                y=audio, sr=sr, n_fft=n_fft, hop_length=hop, n_mels=mel_bins,
                power=1.0, fmin=150, fmax=sr // 2)[:, :spec_width]
        if mag == "pcen":
            S = librosa.pcen(S * (2**31), sr=sr, hop_length=hop)
        elif mag == "pwl":
            Sn = normalize(S)
            y_ = 0.40 * Sn
            for tthr, k in zip((0.10, 0.35, 0.65), (0.25, 0.15, 0.08)):
                y_ = y_ + k * np.maximum(Sn - tthr, 0.0)
            S = y_
        elif mag == "db":
            S = librosa.amplitude_to_db(S, ref=np.max)
        return normalize(S)

    combos = ([("mel", m) for m in ("none", "pcen", "pwl", "db")]
              + [("linear", m) for m in ("none", "pcen", "pwl", "db")]
              + [("mfcc", "none"), ("log_mel", "none")])
    for sr, n_fft, spec_width, mel_bins in GEOMETRIES:
        for name, y in make_signals(sr).items():
            y32 = y.astype(np.float32)
            for mode, mag in combos:
                key = f"features/{name}/{sr}/{n_fft}/{mode}/{mag}"
                arrays[key] = reference_features(
                    y32, sr, n_fft, spec_width, mel_bins, mode, mag).astype(np.float32)

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    out = OUT_DIR / "librosa_goldens.npz"
    np.savez_compressed(
        out,
        __provenance__=np.array(
            f"librosa=={librosa.__version__} numpy=={np.__version__}; "
            "scripts/gen_dsp_goldens.py"),
        **arrays,
    )
    print(f"[goldens] wrote {out} ({out.stat().st_size} bytes, {len(arrays)} arrays)")
    return out


if __name__ == "__main__":
    gen_external()
    gen_librosa()
