"""Persistent synthetic test dataset generator.

Parity with reference tests/fixtures/generate_fixtures.py:17-72: a
class-structured sine/chirp/noise WAV dataset (train/test x bird_a/bird_b/
noise) for integration tests and manual CLI runs. The pytest suite uses the
equivalent in-tmpdir `wav_dataset` fixture (tests/conftest.py); this script
exists for reproducing a dataset on disk.

Usage: python tests/fixtures/generate_fixtures.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def generate_fixtures(out_dir: str | Path, sample_rate: int = 22050,
                      duration: float = 3.0, seed: int = 42) -> Path:
    """Build train/test splits of a 3-class synthetic dataset."""
    from birdnet_stm32_tpu.audio.io import save_wav

    out_dir = Path(out_dir)
    rng = np.random.default_rng(seed)
    t = np.arange(int(sample_rate * duration)) / sample_rate

    def sine(f, amp=0.6):
        return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)

    def chirp(f0, f1, amp=0.6):
        k = (f1 - f0) / (2 * t[-1])
        return (amp * np.sin(2 * np.pi * (f0 + k * t) * t)).astype(np.float32)

    def noise(scale=0.25):
        return rng.normal(0.0, scale, len(t)).astype(np.float32)

    per_split = {"train": 4, "test": 2}
    for split, n in per_split.items():
        for cls, make in (("bird_a", lambda i: sine(1000 + 120 * i)),
                          ("bird_b", lambda i: chirp(600 + 80 * i, 2800)),
                          ("noise", lambda i: noise())):
            d = out_dir / split / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                save_wav(make(i) + 0.02 * noise(1.0), d / f"{cls}_{i:02d}.wav",
                         sample_rate)
    return out_dir


if __name__ == "__main__":
    # Script mode puts tests/fixtures/ on sys.path, not the repo root.
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    dest = sys.argv[1] if len(sys.argv) > 1 else str(Path(__file__).parent / "data")
    print(f"fixtures written to {generate_fixtures(dest)}")
