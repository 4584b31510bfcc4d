"""Fused Pallas frontend kernel tests (interpreter mode; Mosaic compilation
requires real TPU topology info, unavailable on the CPU test mesh and on
tunneled single-chip backends — see pallas_available()).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.ops.pallas.frontend_kernel import (
    fused_hybrid_frontend,
    hybrid_frontend_input,
)
from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch


def test_fused_kernel_matches_xla(rng):
    B, T = 8, 22050
    y = jnp.asarray(rng.normal(0, 0.5, (B, T)).astype(np.float32))
    W = 64
    hop = T // W
    ref = np.asarray(spectrogram_batch(y, sample_rate=22050, n_fft=512, mel_bins=-1,
                                       spec_width=W, mag_scale="none", mode="linear"))
    got = np.asarray(fused_hybrid_frontend(y, 512, hop, min(W, 1 + T // hop),
                                           batch_tile=8, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_kernel_multi_tile(rng):
    B, T = 16, 8000
    y = jnp.asarray(rng.normal(0, 0.5, (B, T)).astype(np.float32))
    hop = T // 32
    out = np.asarray(fused_hybrid_frontend(y, 256, hop, 32, batch_tile=8, interpret=True))
    assert out.shape == (16, 129, 32)
    # Per-sample normalization: every sample spans [0, 1].
    assert np.allclose(out.max(axis=(1, 2)), 1.0, atol=1e-5)
    assert np.allclose(out.min(axis=(1, 2)), 0.0, atol=1e-6)


def test_fused_kernel_guards():
    y = jnp.zeros((8, 8000), jnp.float32)
    with pytest.raises(ValueError, match="2\\*hop"):
        fused_hybrid_frontend(y, 512, 100, 32, interpret=True)
    with pytest.raises(ValueError, match="divisible"):
        fused_hybrid_frontend(jnp.zeros((6, 8000), jnp.float32), 256, 250, 32,
                              interpret=True)


def test_hybrid_frontend_input_wrapper(rng):
    cfg = ModelConfig(sample_rate=8000, num_mels=32, spec_width=32, fft_length=256,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=["a", "b"], audio_frontend="hybrid", mag_scale="pwl")
    y = jnp.asarray(rng.normal(0, 0.5, (8, cfg.chunk_samples)).astype(np.float32))
    out = hybrid_frontend_input(y, cfg, interpret=True)
    assert out.shape == (8, cfg.fft_bins, cfg.spec_width, 1)
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config

    np.testing.assert_allclose(np.asarray(out), np.asarray(inputs_for_config(y, cfg)),
                               atol=1e-5)


def test_hybrid_frontend_input_pads_partial_batch(rng):
    """B not divisible by batch_tile is padded in and sliced back."""
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, num_classes=2,
                      class_names=["a", "b"], audio_frontend="hybrid",
                      mag_scale="pwl")
    y = jnp.asarray(rng.normal(0, 0.5, (6, 4000)).astype(np.float32))
    out = np.asarray(hybrid_frontend_input(y, cfg, interpret=True))
    full = np.asarray(hybrid_frontend_input(
        jnp.concatenate([y, y[:2]]), cfg, interpret=True))[:6]
    assert out.shape[0] == 6
    np.testing.assert_allclose(out, full, atol=1e-6)


def test_hybrid_frontend_input_falls_back_on_small_hop(rng):
    """2*hop < n_fft violates the kernel precondition -> XLA fallback with
    identical features, instead of a ValueError."""
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=256,
                      fft_length=128, chunk_duration=1.0, num_classes=2,
                      class_names=["a", "b"], audio_frontend="hybrid",
                      mag_scale="pwl")
    # hop = 4000 // 256 = 15; 2*15 < 128
    y = jnp.asarray(rng.normal(0, 0.5, (2, 4000)).astype(np.float32))
    out = np.asarray(hybrid_frontend_input(y, cfg, interpret=True))
    ref = np.asarray(spectrogram_batch(y, sample_rate=4000, n_fft=128, mel_bins=-1,
                                       spec_width=256, mag_scale="none",
                                       mode="linear"))[..., None]
    np.testing.assert_allclose(out, ref, atol=1e-6)
