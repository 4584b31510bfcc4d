"""Fused Pallas frontend kernel tests.

Run in interpreter mode wherever Mosaic cannot compile (the CPU test mesh,
tunneled single-chip backends — see pallas_available()) and with REAL
Mosaic compilation on capable backends, so the same suite upgrades to an
on-device kernel validation on a directly-attached TPU
(docs/hardware-validation.md §1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.ops.pallas.frontend_kernel import (
    fused_hybrid_frontend,
    hybrid_frontend_input,
    pallas_available,
)

# Compile real Mosaic kernels where the backend supports it; fall back to
# the (bit-identical) interpreter elsewhere.
INTERPRET = not pallas_available()
from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch


def test_fused_kernel_matches_xla(rng):
    B, T = 8, 22050
    y = jnp.asarray(rng.normal(0, 0.5, (B, T)).astype(np.float32))
    W = 64
    hop = T // W
    ref = np.asarray(spectrogram_batch(y, sample_rate=22050, n_fft=512, mel_bins=-1,
                                       spec_width=W, mag_scale="none", mode="linear"))
    got = np.asarray(fused_hybrid_frontend(y, 512, hop, min(W, 1 + T // hop),
                                           batch_tile=8, interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_kernel_multi_tile(rng):
    B, T = 16, 8000
    y = jnp.asarray(rng.normal(0, 0.5, (B, T)).astype(np.float32))
    hop = T // 32
    out = np.asarray(fused_hybrid_frontend(y, 256, hop, 32, batch_tile=8, interpret=INTERPRET))
    assert out.shape == (16, 129, 32)
    # Per-sample normalization: every sample spans [0, 1].
    assert np.allclose(out.max(axis=(1, 2)), 1.0, atol=1e-5)
    assert np.allclose(out.min(axis=(1, 2)), 0.0, atol=1e-6)


def test_fused_kernel_guards():
    y = jnp.zeros((8, 8000), jnp.float32)
    with pytest.raises(ValueError, match="2\\*hop"):
        fused_hybrid_frontend(y, 512, 100, 32, interpret=INTERPRET)
    # Any batch size runs since the per-sample-grid rewrite (the former
    # batch-tile divisibility constraint is gone).
    out = fused_hybrid_frontend(jnp.zeros((6, 8000), jnp.float32), 256, 250, 32,
                                interpret=INTERPRET)
    assert out.shape == (6, 129, 32)


def test_hybrid_frontend_input_wrapper(rng):
    cfg = ModelConfig(sample_rate=8000, num_mels=32, spec_width=32, fft_length=256,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=["a", "b"], audio_frontend="hybrid", mag_scale="pwl")
    y = jnp.asarray(rng.normal(0, 0.5, (8, cfg.chunk_samples)).astype(np.float32))
    out = hybrid_frontend_input(y, cfg, interpret=INTERPRET)
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
    out = np.asarray(hybrid_frontend_input(y, cfg, interpret=INTERPRET))
    full = np.asarray(hybrid_frontend_input(
        jnp.concatenate([y, y[:2]]), cfg, interpret=INTERPRET))[:6]
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
    out = np.asarray(hybrid_frontend_input(y, cfg, interpret=INTERPRET))
    ref = np.asarray(spectrogram_batch(y, sample_rate=4000, n_fft=128, mel_bins=-1,
                                       spec_width=256, mag_scale="none",
                                       mode="linear"))[..., None]
    np.testing.assert_allclose(out, ref, atol=1e-6)


# --- Full-epilogue kernel (round 2): mel + mag-scale + mfcc + int8 entry ----

EPILOGUE_COMBOS = [
    ("linear", "none"),
    ("mel", "none"),
    ("mel", "pwl"),
    ("mel", "pcen"),
    ("mel", "db"),
    ("log_mel", "none"),
    ("mfcc", "none"),
]


@pytest.mark.parametrize("mode,mag", EPILOGUE_COMBOS)
def test_fused_epilogue_matches_xla(rng, mode, mag):
    """Every mode x mag_scale the export matrix produces, computed fully
    in-kernel, matches spectrogram_batch (the golden-tested XLA path)."""
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import fused_spectrogram

    B, T, sr = 8, 8000, 8000
    n_fft, W, M = 256, 32, 32
    y = jnp.asarray(rng.normal(0, 0.5, (B, T)).astype(np.float32))
    ref = np.asarray(spectrogram_batch(
        y, sample_rate=sr, n_fft=n_fft,
        mel_bins=(-1 if mode == "linear" else M), spec_width=W,
        mag_scale=mag, mode=mode, n_mfcc=13))
    got = np.asarray(fused_spectrogram(
        y, mode=mode, mag_scale=mag, sample_rate=sr, n_fft=n_fft,
        mel_bins=M, spec_width=W, n_mfcc=13, interpret=INTERPRET))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


# --- Batched-tile grid (round 5): sublane-stacked samples ------------------


@pytest.mark.parametrize("mode,mag", EPILOGUE_COMBOS)
def test_tile_grid_matches_sample_grid(rng, mode, mag):
    """The round-5 batched-tile formulation (tile samples per program,
    stacked along sublanes) produces the same features as the per-sample
    grid. Same math per sample — the only drift is the backend's dot
    blocking changing summation order with the stacked M (ulp-level), and
    pcen's local-transpose smoother reordering a few float ops."""
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import fused_spectrogram

    B, T, sr = 8, 8000, 8000
    y = jnp.asarray(rng.normal(0, 0.5, (B, T)).astype(np.float32))
    kw = dict(mode=mode, mag_scale=mag, sample_rate=sr, n_fft=256,
              mel_bins=32, spec_width=32, n_mfcc=13, interpret=INTERPRET)
    a = np.asarray(fused_spectrogram(y, grid="sample", **kw))
    b = np.asarray(fused_spectrogram(y, grid="tile", batch_tile=4, **kw))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_tile_grid_int8_entry_matches_sample_grid(rng):
    """The tile grid's frame-major int8-entry epilogue emits the same
    codes as the per-sample grid (zero transposes in-kernel) — up to the
    occasional one-code flip where the backend's M-dependent dot blocking
    lands a feature value on a rounding boundary."""
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import fused_spectrogram

    y = jnp.asarray(rng.normal(0, 0.5, (8, 8000)).astype(np.float32))
    kw = dict(mode="linear", n_fft=256, spec_width=32,
              quant=(1.0 / 255.0, -128), interpret=INTERPRET)
    a = np.asarray(fused_spectrogram(y, grid="sample", **kw))
    b = np.asarray(fused_spectrogram(y, grid="tile", batch_tile=2, **kw))
    assert a.dtype == b.dtype == np.int8
    assert a.shape == b.shape
    diff = a.astype(np.int32) - b.astype(np.int32)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.01


def test_tile_grid_rejects_indivisible_batch():
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import fused_spectrogram

    y = jnp.zeros((6, 8000), jnp.float32)
    with pytest.raises(ValueError, match="batch_tile"):
        fused_spectrogram(y, mode="linear", n_fft=256, spec_width=32,
                          grid="tile", batch_tile=4, interpret=INTERPRET)
    with pytest.raises(ValueError, match="grid"):
        fused_spectrogram(y, mode="linear", n_fft=256, spec_width=32,
                          grid="bogus", interpret=INTERPRET)


@pytest.mark.parametrize("frontend", ["hybrid", "librosa", "mfcc", "log_mel"])
def test_frontend_input_matches_inputs_for_config(rng, frontend):
    """The general fused dispatch produces the same model input as the XLA
    composition for every spectrogram frontend."""
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import frontend_input

    cfg = ModelConfig(sample_rate=8000, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=2, class_names=["a", "b"],
                      audio_frontend=frontend, mag_scale="pwl", n_mfcc=13)
    y = jnp.asarray(rng.normal(0, 0.5, (6, cfg.chunk_samples)).astype(np.float32))
    got = np.asarray(frontend_input(y, cfg, interpret=INTERPRET))
    ref = np.asarray(inputs_for_config(y, cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_frontend_input_raw_falls_back(rng):
    """raw has no spectrogram to fuse: the dispatch must return the XLA
    path's peak-normalized waveform."""
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import frontend_input

    cfg = ModelConfig(sample_rate=8000, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=2, class_names=["a", "b"],
                      audio_frontend="raw", mag_scale="none")
    y = jnp.asarray(rng.normal(0, 0.5, (4, cfg.chunk_samples)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(frontend_input(y, cfg, interpret=INTERPRET)),
                                  np.asarray(inputs_for_config(y, cfg)))


def test_fused_int8_entry_epilogue(rng):
    """quant=(scale, zp) emits the executor entry tensor: the kernel's own
    float output quantized with the executor's exact formula, in the entry
    TRANSPOSE orientation [B, 1, W, bins]."""
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import fused_spectrogram

    B, T = 8, 8000
    n_fft, W = 256, 32
    scale, zp = 1.0 / 255.0, -128
    y = jnp.asarray(rng.normal(0, 0.5, (B, T)).astype(np.float32))
    f32 = np.asarray(fused_spectrogram(y, mode="linear", n_fft=n_fft,
                                       spec_width=W, interpret=INTERPRET))
    got = np.asarray(fused_spectrogram(y, mode="linear", n_fft=n_fft,
                                       spec_width=W, quant=(scale, zp),
                                       interpret=INTERPRET))
    assert got.shape == (B, 1, W, n_fft // 2 + 1)
    assert got.dtype == np.int8
    v = (f32 / np.float32(scale)).astype(np.float32)
    q = np.clip(np.sign(v) * np.floor(np.abs(v) + 0.5) + zp, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, np.transpose(q, (0, 2, 1))[:, None, :, :])


@pytest.mark.slow
@pytest.mark.integration
def test_serving_pallas_int8_entry_path(tmp_path, rng):
    """make_fused_classifier(pallas_mode='interpret') routes the INT8
    executor through the kernel's fused int8-quantize entry (prequantized
    executor) and matches the XLA path bit-for-bit."""
    import jax

    from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import TFLiteSimRunner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    cfg = ModelConfig(sample_rate=8000, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=4, class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl")
    model = build_dscnn(cfg, class_activation="softmax")
    v = init_model(model, cfg, jax.random.key(0))
    calib = np.random.default_rng(0).uniform(
        0, 1, (8, *cfg.input_shape())).astype(np.float32)
    path = tmp_path / "m.tflite"
    path.write_bytes(convert_to_tflite(v, cfg, calib, quantize="int8"))

    runner = TFLiteSimRunner(str(path))
    wave = rng.normal(0, 0.5, (8, cfg.chunk_samples)).astype(np.float32)
    off = make_fused_classifier(runner, cfg, pallas_mode="off")(wave)
    on = make_fused_classifier(runner, cfg, pallas_mode="interpret")(wave)
    np.testing.assert_array_equal(off, on)

    # Float runner: kernel features == XLA features within tolerance.
    from birdnet_stm32_tpu.models.runners import FlaxRunner

    fr = FlaxRunner(model, v, cfg)
    f_off = make_fused_classifier(fr, cfg, pallas_mode="off")(wave)
    f_on = make_fused_classifier(fr, cfg, pallas_mode="interpret")(wave)
    np.testing.assert_allclose(f_on, f_off, atol=5e-5)
