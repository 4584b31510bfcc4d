"""Exactness-preserving int16 waveform shipping.

For mono PCM16 WAVs at the model rate, --int16_io ships the decoder's RAW
sample codes plus the window's peak code, and the device reconstructs the
host's peak-normalized float32 waveform BIT-EXACTLY: PCM16->f32 (c/32768)
and peak/32768 are exact (reference wav_reader.c:76-129 semantics), and
the device dequant divides with correctly-rounded f32 division
(serving._div_exact_int), so it rounds the same real quotient c/peak the
host's numpy division does. Everything else falls back to the requantizing
path (one PCM16 LSB of error, scale column 32767).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.audio.io import (
    load_audio_file,
    load_chunks_int16,
    save_wav,
)
from birdnet_stm32_tpu.models.serving import (
    _dequantize_int16,
    _div_exact_int,
    decode_for_classify,
    quantize_waveform_int16,
)


def _host_normalize(codes: np.ndarray, peak: int) -> np.ndarray:
    """The host float path's math, exactly as load_audio_window performs
    it: PCM16 -> f32 (exact /32768), then IEEE-754 division by the
    window peak (also an exact f32 after /32768)."""
    t = codes.astype(np.float32) / np.float32(32768.0)
    if peak <= 0:
        return t
    return t / (np.float32(peak) / np.float32(32768.0))


def test_div_exact_matches_numpy_all_codes():
    """Every int16 code against a spread of peaks: the device dequant's
    correctly-rounded division == numpy's IEEE division, bit for bit."""
    codes = np.arange(-32768, 32768, dtype=np.int32).astype(np.float32)
    rng = np.random.default_rng(7)
    peaks = np.unique(np.concatenate([
        rng.integers(1, 32769, 40), [1, 2, 3, 32765, 32767, 32768]]))
    f = jax.jit(_div_exact_int)
    for pk in peaks:
        want = codes / np.float32(pk)  # numpy: correctly rounded
        got = np.asarray(f(jnp.asarray(codes), jnp.float32(pk)))
        np.testing.assert_array_equal(
            got.view(np.int32), want.view(np.int32),
            err_msg=f"_div_exact_int wrong at peak {pk}")


def test_div_exact_recovers_from_perturbed_start():
    """Seed the candidate search with a division result that is 1-2 ulp
    wrong (the measured TPU fast-division error) — it must still return
    the correctly-rounded quotient."""
    rng = np.random.default_rng(3)
    c = rng.integers(-32768, 32769, 4096).astype(np.float32)
    b = rng.integers(1, 32769, 4096).astype(np.float32)
    want = c / b
    inf = np.float32(np.inf)
    for perturb in (
        lambda q: np.nextafter(q, inf),
        lambda q: np.nextafter(q, -inf),
        lambda q: np.nextafter(np.nextafter(q, inf), inf),
        lambda q: np.nextafter(np.nextafter(q, -inf), -inf),
    ):
        got = np.asarray(jax.jit(_div_exact_int)(
            jnp.asarray(c), jnp.asarray(b), q0=jnp.asarray(perturb(want))))
        np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_load_chunks_int16_reconstructs_host_floats(tmp_path):
    """Raw-code chunks, device-dequantized, == load_audio_file's float32
    chunks bitwise (non-full-scale peak, multi-chunk file with padded
    tail)."""
    sr = 8000
    rng = np.random.default_rng(11)
    # 2.5 chunks of 1 s at peak ~0.4: peak code lands mid-range.
    wave = (rng.normal(0, 0.13, int(sr * 2.5))).astype(np.float32) * 0.9
    wave = np.clip(wave, -0.999, 0.999)
    path = tmp_path / "a.wav"
    save_wav(wave, path, sample_rate=sr)

    raw = load_chunks_int16(path, sample_rate=sr, chunk_duration=1.0)
    assert raw is not None and raw.dtype == np.int16
    n_chunks, width = raw.shape
    assert width == sr + 1  # trailing scale column
    peak = int(raw[0, -1])
    assert 0 < peak < 32767  # genuinely non-full-scale
    assert np.all(raw[:, -1] == peak)

    host = load_audio_file(path, sample_rate=sr, max_duration=None,
                           chunk_duration=1.0)
    assert host.shape == (n_chunks, sr)
    dev = np.asarray(jax.jit(_dequantize_int16)(jnp.asarray(raw)))
    np.testing.assert_array_equal(
        dev.view(np.int32), host.view(np.int32),
        err_msg="device dequant of raw codes != host peak-normalized floats")


def test_load_chunks_int16_eligibility(tmp_path):
    """Rate mismatch and non-WAV files are ineligible (None);
    decode_for_classify then falls back to the requantizing path with
    scale column 32767."""
    sr = 8000
    wave = np.sin(np.linspace(0, 40.0, sr)).astype(np.float32) * 0.5
    path = tmp_path / "b.wav"
    save_wav(wave, path, sample_rate=sr)

    assert load_chunks_int16(path, sample_rate=16000) is None  # wrong rate
    assert load_chunks_int16(tmp_path / "missing.wav", sample_rate=sr) is None

    from birdnet_stm32_tpu.config import ModelConfig

    cfg = ModelConfig(sample_rate=16000, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=4, class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl")
    chunks, src_rate, _dur, _ms = decode_for_classify(path, cfg, int16_io=True)
    assert chunks.dtype == np.int16
    assert chunks.shape[1] == cfg.chunk_samples + 1
    assert np.all(chunks[:, -1] == 32767)  # requantized fallback marker

    # Eligible at the file's own rate: raw codes with the window peak.
    cfg8 = ModelConfig(sample_rate=sr, num_mels=32, spec_width=32,
                       fft_length=256, chunk_duration=1.0, embeddings_size=32,
                       num_classes=4, class_names=list("abcd"), alpha=0.25,
                       audio_frontend="hybrid", mag_scale="pwl")
    raw, _r, _d, _m = decode_for_classify(path, cfg8, int16_io=True)
    assert raw.dtype == np.int16 and raw.shape[1] == sr + 1
    assert int(raw[0, -1]) not in (0, 32767)


def test_full_scale_peak_encoding(tmp_path):
    """A window containing code -32768 has peak 32768, which doesn't fit
    int16; the scale column encodes it as -32768 and the device dequant
    takes |scale|."""
    sr = 4000
    codes = np.zeros(sr, np.int16)
    codes[5] = -32768
    codes[17] = 12345
    import wave as wave_mod

    path = tmp_path / "fs.wav"
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(codes.tobytes())

    raw = load_chunks_int16(path, sample_rate=sr, chunk_duration=1.0)
    assert raw is not None
    assert int(raw[0, -1]) == -32768  # encodes peak 32768
    host = load_audio_file(path, sample_rate=sr, max_duration=None,
                           chunk_duration=1.0)
    dev = np.asarray(jax.jit(_dequantize_int16)(jnp.asarray(raw)))
    np.testing.assert_array_equal(dev.view(np.int32), host.view(np.int32))
    assert dev[0, 5] == -1.0 and dev[0, 17] == np.float32(12345.0 / 32768.0)


def test_int16_scores_bit_exact_vs_float_path(tmp_path, rng):
    """End-to-end: the fused classifier fed raw int16 codes produces
    BIT-IDENTICAL scores to the float32 path on an eligible PCM16 file —
    the exactness-preserving shipping guarantee (vs the requantizing
    fallback's one-LSB waveform error)."""
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    sr = 8000
    cfg = ModelConfig(sample_rate=sr, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=4, class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl")
    model = build_dscnn(cfg, class_activation="softmax")
    v = init_model(model, cfg, jax.random.key(0))
    runner = FlaxRunner(model, v, cfg)

    wave = (rng.normal(0, 0.1, int(sr * 2.2))).astype(np.float32)
    wave = np.clip(wave, -0.999, 0.999) * 0.7
    path = tmp_path / "c.wav"
    save_wav(wave, path, sample_rate=sr)

    f32_chunks, *_ = decode_for_classify(path, cfg)
    i16_chunks, *_ = decode_for_classify(path, cfg, int16_io=True)
    assert i16_chunks.dtype == np.int16
    assert int(i16_chunks[0, -1]) not in (0, 32767)  # raw path taken

    s_f32 = make_fused_classifier(runner, cfg)(f32_chunks)
    s_i16 = make_fused_classifier(runner, cfg, input_dtype="int16")(i16_chunks)
    np.testing.assert_array_equal(
        s_i16.view(np.int32), s_f32.view(np.int32),
        err_msg="int16-shipped scores != float32-path scores bitwise")


def test_int16_composes_with_bf16_serving(tmp_path, rng):
    """--int16_io + --bf16 in one dispatch: raw PCM16 codes are dequantized
    exactly on device, then flow through the bf16-I/O frontend into the
    bf16 model. Scores must track the f32 int16 path within bf16
    resolution (the bf16 tier's own gate, not the bit-exact one — shipping
    stays exact, the bf16 compute tier is the approximation)."""
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    sr = 8000
    cfg = ModelConfig(sample_rate=sr, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=4, class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl")
    model = build_dscnn(cfg, class_activation="softmax")
    v = init_model(model, cfg, jax.random.key(0))

    wave = np.clip(rng.normal(0, 0.1, int(sr * 2.2)), -0.999, 0.999).astype(np.float32)
    path = tmp_path / "c16.wav"
    save_wav(wave * 0.7, path, sample_rate=sr)
    i16_chunks, *_ = decode_for_classify(path, cfg, int16_io=True)

    r32 = FlaxRunner(model, v, cfg)
    r16 = FlaxRunner(model, v, cfg, dtype=jnp.bfloat16)
    s_f32 = make_fused_classifier(r32, cfg, input_dtype="int16")(i16_chunks)
    s_b16 = make_fused_classifier(r16, cfg, input_dtype="int16")(i16_chunks)
    assert s_b16.dtype == np.float32
    np.testing.assert_allclose(s_b16, s_f32, atol=0.02)


def test_quantize_waveform_int16_wire_format(rng):
    """Requantizing fallback emits [B, T+1] with scale 32767 and one-LSB
    round-trip error through the device dequant."""
    wave = rng.uniform(-1, 1, (3, 256)).astype(np.float32)
    q = quantize_waveform_int16(wave)
    assert q.shape == (3, 257) and q.dtype == np.int16
    assert np.all(q[:, -1] == 32767)
    back = np.asarray(jax.jit(_dequantize_int16)(jnp.asarray(q)))
    assert np.max(np.abs(back - wave)) <= (1.0 / 32767.0) * 0.5 + 1e-7


@pytest.mark.parametrize("zeros", [True, False])
def test_dequantize_zero_and_padding_rows(zeros):
    """All-zero rows (classify_in_batches padding, silent windows with
    scale 0) dequantize to exact zeros, no NaN from 0/0."""
    w = np.zeros((2, 65), np.int16)
    if not zeros:
        w[0, :-1] = 100
        w[0, -1] = 200
    out = np.asarray(jax.jit(_dequantize_int16)(jnp.asarray(w)))
    assert np.all(np.isfinite(out))
    assert np.all(out[1] == 0.0)
    if not zeros:
        np.testing.assert_array_equal(out[0], np.float32(0.5))
