"""WAV I/O tests: RIFF reader, resample, window, chunking invariants."""

import numpy as np
import pytest

from birdnet_stm32_tpu.audio.io import (
    estimate_num_chunks,
    fast_resample,
    load_audio_file,
    load_audio_window,
    save_wav,
    split_audio_into_chunks,
    wav_info,
)


def test_wav_roundtrip(tmp_path, rng):
    y = rng.uniform(-0.9, 0.9, 16000).astype(np.float32)
    p = tmp_path / "x.wav"
    save_wav(y, p, 16000)
    info = wav_info(p)
    assert info.sample_rate == 16000 and info.channels == 1 and info.bits == 16
    loaded = load_audio_window(p, sample_rate=16000, max_duration=None)
    # peak-normalized copy of y
    corr = np.corrcoef(loaded, y)[0, 1]
    assert corr > 0.999


def test_load_missing_file_returns_empty():
    assert load_audio_window("/nonexistent/file.wav").size == 0


def test_load_non_wav_returns_empty(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"this is not audio")
    assert load_audio_window(p).size == 0


def test_resample_preserves_tone(rng):
    sr0, sr1 = 48000, 24000
    t = np.arange(sr0) / sr0
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    z = fast_resample(y, sr0, sr1)
    assert abs(len(z) - sr1) <= 2
    f = np.fft.rfftfreq(len(z), 1 / sr1)
    peak = f[np.argmax(np.abs(np.fft.rfft(z)))]
    assert abs(peak - 440) < 5


def test_short_file_preserves_leading_audio(tmp_path):
    """Regression parity: a sub-chunk file keeps its content, padded once."""
    sr = 16000
    y = np.linspace(1.0, 0.5, sr // 2).astype(np.float32)  # 0.5 s
    p = tmp_path / "short.wav"
    save_wav(y, p, sr)
    chunks = load_audio_file(p, sample_rate=sr, chunk_duration=1.0)
    assert chunks.shape == (1, sr)
    assert chunks[0, 0] > 0.9  # leading content intact (peak-normalized)
    assert np.all(chunks[0, sr // 2 :] == 0.0)  # zero-padded tail


def test_split_chunks_tail():
    sr = 100
    y = np.arange(250, dtype=np.float32)
    chunks = split_audio_into_chunks(y, sample_rate=sr, chunk_duration=1.0)
    # starts 0, 100 and a shifted tail at 150
    assert chunks.shape == (3, 100)
    assert chunks[2, 0] == 150.0
    assert estimate_num_chunks(250, sr, 1.0) == 3


def test_split_overlap():
    sr = 100
    y = np.arange(300, dtype=np.float32)
    chunks = split_audio_into_chunks(y, sample_rate=sr, chunk_duration=1.0, chunk_overlap=0.5)
    starts = chunks[:, 0]
    assert list(starts[:4]) == [0.0, 50.0, 100.0, 150.0]
    assert estimate_num_chunks(300, sr, 1.0, 0.5) == chunks.shape[0]


def test_random_offset_window(tmp_path, rng):
    sr = 16000
    y = rng.normal(0, 0.5, sr * 10).astype(np.float32)
    p = tmp_path / "long.wav"
    save_wav(y, p, sr)
    w = load_audio_window(p, sample_rate=sr, max_duration=2.0, random_offset=True,
                          rng=np.random.default_rng(5))
    assert len(w) == sr * 2


def test_stereo_downmix(tmp_path):
    import wave as wave_mod

    sr = 8000
    left = (np.sin(2 * np.pi * 500 * np.arange(sr) / sr) * 32000).astype("<i2")
    right = np.zeros(sr, "<i2")
    inter = np.empty(2 * sr, "<i2")
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "stereo.wav"
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(inter.tobytes())
    y = load_audio_window(p, sample_rate=sr, max_duration=None)
    assert len(y) == sr
    # downmix of (tone, silence) = half-amplitude tone, peak-normalized to 1
    assert np.abs(y).max() == pytest.approx(1.0, abs=1e-3)


@pytest.mark.parametrize("bits,fmt", [(8, "u1"), (24, None), (32, "<i4")])
def test_other_bit_depths(tmp_path, rng, bits, fmt):
    import struct

    sr = 8000
    y = rng.uniform(-0.5, 0.5, sr).astype(np.float32)
    p = tmp_path / f"b{bits}.wav"
    if bits == 8:
        data = ((y * 127) + 128).astype(np.uint8).tobytes()
    elif bits == 24:
        v = (y * 8388607).astype(np.int32)
        b = np.zeros((sr, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        data = b.tobytes()
    else:
        data = (y * 2147483000).astype("<i4").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * bits // 8, bits // 8, bits)
    hdr += b"data" + struct.pack("<I", len(data))
    p.write_bytes(hdr + data)
    z = load_audio_window(p, sample_rate=sr, max_duration=None)
    assert len(z) == sr
    assert np.corrcoef(z, y)[0, 1] > 0.99
