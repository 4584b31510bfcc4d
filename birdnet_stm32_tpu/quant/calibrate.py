"""Representative calibration data for PTQ.

Policy parity with reference conversion/quantize.py:19-108: random sample of
files, center chunk per file, frontend-shaped tensors, near-silent chunks
dropped (RMS for raw, mean-abs for spectrograms). Feature extraction runs
on device via ops.frontend instead of librosa.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from birdnet_stm32_tpu.audio.io import load_audio_file
from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.ops.frontend import inputs_for_config


def random_representative_inputs(
    cfg: ModelConfig,
    num_samples: int = 100,
    seed: int = 0,
) -> np.ndarray:
    """[N, ...] random model-input tensors for calibration/validation when
    no audio is available (reference cli/convert.py:124-144: uniform [0,1)
    for spectrogram-shaped frontends, normal for raw waveforms)."""
    rng = np.random.default_rng(seed)
    shape = (num_samples, *cfg.input_shape())
    if cfg.audio_frontend == "raw":
        return rng.standard_normal(shape).astype(np.float32)
    return rng.random(shape, dtype=np.float32)


def representative_inputs(
    file_paths: list[str],
    cfg: ModelConfig,
    num_samples: int = 100,
    snr_threshold: float = 0.01,
    seed: int = 0,
) -> np.ndarray:
    """[N, ...] model-input calibration tensors (N <= num_samples)."""
    if not file_paths:
        raise ValueError("No audio files found for representative dataset generation.")
    rng = np.random.default_rng(seed)
    sampled = list(rng.choice(file_paths, size=min(num_samples, len(file_paths)), replace=False))
    rep_max_duration = max(30.0, cfg.chunk_duration * 5.0)

    waves = []
    for path in sampled:
        chunks = load_audio_file(path, sample_rate=cfg.sample_rate,
                                 max_duration=rep_max_duration,
                                 chunk_duration=cfg.chunk_duration)
        if chunks.shape[0] == 0:
            continue
        center = chunks[chunks.shape[0] // 2]
        if snr_threshold > 0 and cfg.audio_frontend == "raw":
            if float(np.sqrt(np.mean(center**2))) < snr_threshold:
                continue
        waves.append(center)
    if not waves:
        raise ValueError("All calibration chunks were filtered as silent.")

    x = np.asarray(inputs_for_config(jnp.asarray(np.stack(waves)), cfg))
    if snr_threshold > 0 and cfg.audio_frontend != "raw":
        keep = np.abs(x).mean(axis=tuple(range(1, x.ndim))) >= snr_threshold
        if not keep.any():
            # Same loud failure as the raw path: calibrating INT8 ranges on
            # all-silent data would be silently wrong.
            raise ValueError("All calibration chunks were filtered as silent.")
        x = x[keep]
    return x.astype(np.float32)


def stratified_sample_paths(paths: list[str], labels: list[str], per_class: int,
                            seed: int = 0) -> list[str]:
    """Stratified calibration sampling (reference cli/convert.py:97-113)."""
    rng = np.random.default_rng(seed)
    by_class: dict[str, list[str]] = {}
    for p, l in zip(paths, labels):
        by_class.setdefault(l, []).append(p)
    out = []
    for l, files in sorted(by_class.items()):
        take = min(per_class, len(files))
        out.extend(rng.choice(files, size=take, replace=False).tolist())
    rng.shuffle(out)
    return out
