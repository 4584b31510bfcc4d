"""Golden tests: JAX DSP ops vs the independent numpy oracle (ref_dsp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from birdnet_stm32_tpu.ops import magnitude as mag_ops
from birdnet_stm32_tpu.ops.dct import dct_matrix
from birdnet_stm32_tpu.ops.mel import hz_to_mel, mel_filterbank, mel_to_hz
from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch
from birdnet_stm32_tpu.ops.stft import stft_magnitude

from tests import ref_dsp


def test_mel_scale_roundtrip():
    f = np.array([0.0, 100.0, 500.0, 999.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    np.testing.assert_allclose(hz_to_mel(f), ref_dsp.hz_to_mel(f), rtol=1e-12)


@pytest.mark.parametrize("sr,n_fft,n_mels", [(22050, 512, 64), (24000, 512, 64), (16000, 256, 40)])
def test_mel_filterbank_matches_librosa_semantics(sr, n_fft, n_mels):
    ours = mel_filterbank(sr, n_fft, n_mels, fmin=150.0, fmax=sr / 2.0)
    golden = ref_dsp.mel_fb(sr, n_fft, n_mels, 150.0, sr / 2).T
    np.testing.assert_allclose(ours, golden, atol=1e-7)


def test_mel_filterbank_triangle_properties():
    fb = mel_filterbank(22050, 512, 64, fmin=150.0)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # Every band has support.
    assert (fb.sum(axis=0) > 0).all()


def test_dct_matrix_matches_scipy():
    from scipy.fft import dct as scipy_dct

    x = np.random.default_rng(0).normal(size=(64,))
    golden = scipy_dct(x, type=2, norm="ortho")[:20]
    ours = x @ dct_matrix(64, 20)
    np.testing.assert_allclose(ours, golden, atol=1e-6)


def test_stft_matches_oracle(sine_wave):
    y, sr = sine_wave
    hop = len(y) // 256
    golden = ref_dsp.stft_mag(y, 512, hop)[:, :256]  # [F, W]
    ours = stft_magnitude(jnp.asarray(y)[None, :], n_fft=512, hop=hop, n_frames=256)
    ours_fm = np.asarray(ours)[0].T  # -> [F, W]
    np.testing.assert_allclose(ours_fm, golden, atol=2e-3, rtol=1e-4)


def test_stft_noncentered_firmware_semantics(noise_wave):
    y, _ = noise_wave
    hop = 258
    ours = np.asarray(stft_magnitude(jnp.asarray(y)[None], n_fft=512, hop=hop, n_frames=4, center=False))[0]
    win = ref_dsp.hann_periodic(512)
    for k in range(4):
        frame = y[k * hop : k * hop + 512].astype(np.float64)
        golden = np.abs(np.fft.rfft(frame * win))
        np.testing.assert_allclose(ours[k], golden, atol=2e-3, rtol=1e-4)


def test_pcen_matches_librosa_semantics(noise_wave):
    y, sr = noise_wave
    hop = len(y) // 256
    S = ref_dsp.stft_mag(y, 512, hop)[:, :256] * (2.0**31)
    golden = ref_dsp.pcen(S, sr, hop, axis=1)
    ours = np.asarray(mag_ops.pcen(jnp.asarray(S, dtype=jnp.float32), sr=sr, hop_length=hop))
    np.testing.assert_allclose(ours, golden, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("mode,mag", [
    ("mel", "none"), ("mel", "pwl"), ("mel", "db"), ("mel", "pcen"),
    ("log_mel", "none"), ("mfcc", "none"), ("linear", "none"), ("linear", "pwl"),
])
def test_spectrogram_batch_matches_oracle(sine_wave, noise_wave, mode, mag):
    y1, sr = sine_wave
    y2, _ = noise_wave
    mel_bins = -1 if mode == "linear" else 64
    batch = jnp.stack([jnp.asarray(y1), jnp.asarray(y2)])
    ours = np.asarray(
        spectrogram_batch(batch, sample_rate=sr, n_fft=512, mel_bins=mel_bins,
                          spec_width=256, mag_scale=mag, mode=mode, n_mfcc=20)
    )
    for i, y in enumerate([y1, y2]):
        golden = ref_dsp.get_spectrogram(y, sr, 512, mel_bins, 256, mag, mode, 20)
        assert ours[i].shape == golden.shape
        # Normalized [0,1] outputs: compare with absolute tolerance. PCEN's
        # EMA over 2^31-scaled magnitudes accumulates float32 rounding the
        # float64 oracle doesn't, so it gets a looser bound.
        atol = 2.5e-2 if mag == "pcen" else 5e-3
        np.testing.assert_allclose(ours[i], golden, atol=atol)
        corr = np.corrcoef(ours[i].ravel(), golden.ravel())[0, 1]
        assert corr > 0.9999, f"{mode}/{mag} corr={corr}"


def test_spectrogram_output_range(noise_wave):
    y, sr = noise_wave
    S = np.asarray(spectrogram_batch(jnp.asarray(y)[None], sample_rate=sr, spec_width=256))
    assert S.min() >= 0.0 and S.max() <= 1.0 + 1e-6


def test_stft_precision_api():
    """The precision knob is accepted everywhere and is a no-op on CPU
    (all precisions compute in f32 there); shapes and values agree."""
    import jax.numpy as jnp

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config
    from birdnet_stm32_tpu.ops.stft import stft_magnitude

    y = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32))
    hi = stft_magnitude(y, n_fft=128, hop=125, n_frames=32, precision="highest")
    md = stft_magnitude(y, n_fft=128, hop=125, n_frames=32, precision="high")
    assert hi.shape == md.shape
    np.testing.assert_allclose(np.asarray(hi), np.asarray(md), rtol=1e-5, atol=1e-6)

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      audio_frontend="hybrid", mag_scale="pwl")
    a = inputs_for_config(y, cfg)
    b = inputs_for_config(y, cfg, stft_precision="high")
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    with pytest.raises(KeyError):
        stft_magnitude(y, n_fft=128, hop=125, n_frames=32, precision="fast")


def test_stft_bf16_io_tracks_f32():
    """The bf16-I/O STFT (out_dtype=bfloat16, the bf16-serving frontend)
    tracks the f32 path within bf16 rounding on BOTH formulations: the
    size-2 conv path (2*hop >= n_fft) and the gather fallback. The 2-limb
    kernel split keeps the DFT bases at ~2^-17 relative error, so the
    only losses are the one-time input rounding and the output store."""
    from birdnet_stm32_tpu.ops.stft import stft_magnitude

    y = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4000)).astype(np.float32))
    for hop in (125, 40):  # conv path; gather path (2*40 < 128)
        n_frames = (4000 - 128) // hop
        ref = np.asarray(stft_magnitude(y, n_fft=128, hop=hop, n_frames=n_frames,
                                        precision="highest"))
        lo = stft_magnitude(y, n_fft=128, hop=hop, n_frames=n_frames,
                            precision="high", out_dtype=jnp.bfloat16)
        assert lo.dtype == jnp.bfloat16
        scale = ref.max()
        np.testing.assert_allclose(np.asarray(lo, np.float32) / scale, ref / scale,
                                   atol=0.02)
    # out_dtype=bfloat16 with precision='highest' stays on the f32 pipeline
    # (librosa-parity compute) and only casts the result.
    hi16 = stft_magnitude(y, n_fft=128, hop=125, n_frames=30,
                          precision="highest", out_dtype=jnp.bfloat16)
    assert hi16.dtype == jnp.bfloat16


@pytest.mark.parametrize("mode,mag", [("linear", "none"), ("mel", "pwl"),
                                      ("log_mel", "none"), ("mfcc", "none"),
                                      ("mel", "db"), ("mel", "pcen")])
def test_spectrogram_feature_dtype_bf16(noise_wave, mode, mag):
    """feature_dtype=bfloat16 emits bf16 features that track the f32
    pipeline within bf16 resolution for every mode x mag_scale combo
    (mfcc keeps its f32 internals and only casts the output)."""
    y, sr = noise_wave
    kw = dict(sample_rate=sr, n_fft=256, mel_bins=20, spec_width=64,
              mode=mode, mag_scale=mag, n_mfcc=8)
    ref = np.asarray(spectrogram_batch(jnp.asarray(y)[None], **kw))
    lo = spectrogram_batch(jnp.asarray(y)[None], stft_precision="high",
                           feature_dtype=jnp.bfloat16, **kw)
    assert lo.dtype == jnp.bfloat16
    assert lo.shape == ref.shape
    # Features are [0, 1]-normalized (or DCT coefficients of a normalized
    # log spectrum); absolute tolerance at bf16 resolution of that range.
    np.testing.assert_allclose(np.asarray(lo, np.float32), ref, atol=0.05)


def test_spectrogram_odd_sample_rate_fmax_floors(rng):
    """fmax floors to sr // 2 like the reference (spectrogram.py:74), so odd
    sample rates produce identical mel band edges."""
    sr = 11025
    y = np.sin(2 * np.pi * 3000 * np.arange(sr * 2) / sr).astype(np.float32)
    y += 0.05 * rng.normal(size=y.shape).astype(np.float32)
    ours = np.asarray(spectrogram_batch(jnp.asarray(y)[None], sample_rate=sr,
                                        n_fft=512, mel_bins=64, spec_width=128,
                                        mag_scale="none", mode="mel"))[0]
    golden = ref_dsp.get_spectrogram(y, sr, 512, 64, 128, "none", "mel")
    np.testing.assert_allclose(ours, golden, atol=5e-3)
    # And the filterbank's top band edge comes from the floored Nyquist.
    fb_floor = mel_filterbank(sr, 512, 64, fmin=150.0, fmax=float(sr // 2))
    fb_ours = np.asarray(
        spectrogram_batch(jnp.asarray(y)[None], sample_rate=sr, n_fft=512,
                          mel_bins=64, spec_width=128, mag_scale="none",
                          mode="mel"))
    assert fb_ours is not None and fb_floor.shape == (257, 64)


def test_spectrogram_short_audio_no_zero_hop():
    """T < spec_width clamps hop to 1 instead of dividing by zero."""
    y = jnp.zeros((1, 100), jnp.float32)
    S = np.asarray(spectrogram_batch(y, sample_rate=4000, n_fft=64, mel_bins=16,
                                     spec_width=256, mag_scale="none", mode="mel"))
    assert S.shape[0] == 1 and np.all(np.isfinite(S))


def test_host_compat_spectrogram_api(sine_wave):
    """The reference-import-path shim (audio/spectrogram.py there) returns
    the single-sample slice of the batched device op, and normalize matches
    the reference's min-max formula (reference audio/spectrogram.py:12-21)."""
    from birdnet_stm32_tpu.audio.spectrogram import (
        get_spectrogram_from_audio,
        normalize,
    )

    audio, _sr = sine_wave
    one = get_spectrogram_from_audio(audio, sample_rate=22050,
                                     mel_bins=32, spec_width=64)
    batched = np.asarray(spectrogram_batch(jnp.asarray(audio)[None],
                                           sample_rate=22050, mel_bins=32,
                                           spec_width=64))[0]
    np.testing.assert_array_equal(one, batched)
    assert one.shape == (32, 64)

    S = np.array([[1.0, 3.0], [5.0, 2.0]])
    np.testing.assert_allclose(normalize(S),
                               (S - S.min()) / (S.max() - S.min() + 1e-10))

    with pytest.raises(ValueError):
        get_spectrogram_from_audio(np.zeros((2, 100), np.float32))
