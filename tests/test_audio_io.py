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


class TestDecodedWaveformCache:
    """audio/io.cached_waveform + load_audio_window(cache_dir=...)."""

    def test_same_rate_window_bit_exact(self, tmp_path, rng):
        from birdnet_stm32_tpu.audio.io import cached_waveform

        sr = 16000
        y = rng.uniform(-0.9, 0.9, sr * 4).astype(np.float32)
        p = tmp_path / "x.wav"
        save_wav(y, p, sr)
        cache = tmp_path / "cache"
        direct = load_audio_window(p, sample_rate=sr, max_duration=None)
        via_cache = load_audio_window(p, sample_rate=sr, max_duration=None,
                                      cache_dir=cache)
        # No resampling involved: the cached slice is the same bytes.
        np.testing.assert_array_equal(direct, via_cache)
        entries = list(cache.glob("*.npy"))
        assert len(entries) == 1
        # Second read serves from the entry (memmap) and matches.
        again = load_audio_window(p, sample_rate=sr, max_duration=None,
                                  cache_dir=cache)
        np.testing.assert_array_equal(direct, again)
        full = cached_waveform(p, sr, cache)
        assert full.shape[0] == sr * 4

    def test_resampled_window_close_to_direct(self, tmp_path):
        sr0, sr1 = 16000, 8000
        t = np.arange(sr0 * 3) / sr0
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        p = tmp_path / "tone.wav"
        save_wav(y, p, sr0)
        direct = load_audio_window(p, sample_rate=sr1, max_duration=2.0)
        cached = load_audio_window(p, sample_rate=sr1, max_duration=2.0,
                                   cache_dir=tmp_path / "cache")
        assert cached.shape == direct.shape
        # Full-file resample vs window resample: identical except the
        # polyphase ramp at the slice edges.
        interior = slice(64, -64)
        np.testing.assert_allclose(cached[interior], direct[interior],
                                   atol=2e-3)

    def test_random_offset_still_varies(self, tmp_path, rng):
        sr = 8000
        y = rng.normal(0, 0.5, sr * 20).astype(np.float32)
        p = tmp_path / "long.wav"
        save_wav(y, p, sr)
        cache = tmp_path / "cache"
        w1 = load_audio_window(p, sample_rate=sr, max_duration=2.0,
                               random_offset=True,
                               rng=np.random.default_rng(1), cache_dir=cache)
        w2 = load_audio_window(p, sample_rate=sr, max_duration=2.0,
                               random_offset=True,
                               rng=np.random.default_rng(2), cache_dir=cache)
        assert len(w1) == len(w2) == sr * 2
        assert not np.array_equal(w1, w2)  # crop augmentation survives caching
        # One decode, two windows: still a single cache entry.
        assert len(list(cache.glob("*.npy"))) == 1

    def test_corrupt_entry_rebuilt(self, tmp_path, rng):
        sr = 8000
        y = rng.uniform(-0.5, 0.5, sr).astype(np.float32)
        p = tmp_path / "x.wav"
        save_wav(y, p, sr)
        cache = tmp_path / "cache"
        ref = load_audio_window(p, sample_rate=sr, cache_dir=cache)
        entry = next(cache.glob("*.npy"))
        entry.write_bytes(b"not an npy file")
        out = load_audio_window(p, sample_rate=sr, cache_dir=cache)
        np.testing.assert_array_equal(out, ref)
        assert np.load(entry, mmap_mode="r").shape[0] == sr  # rebuilt

    def test_rewritten_file_is_cache_miss(self, tmp_path, rng):
        import os

        sr = 8000
        p = tmp_path / "x.wav"
        cache = tmp_path / "cache"
        y1 = rng.uniform(-0.5, 0.5, sr).astype(np.float32)
        save_wav(y1, p, sr)
        out1 = load_audio_window(p, sample_rate=sr, cache_dir=cache)
        y2 = rng.uniform(-0.5, 0.5, sr * 2).astype(np.float32)
        save_wav(y2, p, sr)
        os.utime(p, ns=(1, 1))  # force a distinct mtime even on coarse clocks
        out2 = load_audio_window(p, sample_rate=sr, cache_dir=cache)
        assert out2.shape[0] == sr * 2
        assert out1.shape[0] == sr

    def test_failed_decode_negative_cached(self, tmp_path):
        p = tmp_path / "bad.wav"
        p.write_bytes(b"RIFFgarbage!")
        cache = tmp_path / "cache"
        out = load_audio_window(p, sample_rate=8000, cache_dir=cache)
        assert out.size == 0
        entry = next(cache.glob("*.npy"))
        assert np.load(entry).size == 0  # negative entry, no re-decode

    def test_loader_pipeline_uses_cache(self, tmp_path, rng):
        from birdnet_stm32_tpu.data.worker import LoaderConfig, process_file

        sr = 8000
        p = tmp_path / "a.wav"
        save_wav(rng.normal(0, 0.3, sr * 5).astype(np.float32), p, sr)
        cache = tmp_path / "cache"
        cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=3,
                           cache_dir=str(cache))
        label = np.eye(3, dtype=np.float32)[0]
        out = process_file((str(p), label, cfg, 0))
        assert out and out[0][0].shape == (sr,)
        assert len(list(cache.glob("*.npy"))) == 1

    def test_cached_window_is_writable(self, tmp_path):
        # A silent window skips the peak-divide copy; the cached path must
        # still hand back a writable array, not a read-only memmap view.
        sr = 8000
        y = np.zeros(sr * 2, np.float32)
        p = tmp_path / "silent.wav"
        save_wav(y, p, sr)
        cache = tmp_path / "cache"
        load_audio_window(p, sample_rate=sr, cache_dir=cache)  # build entry
        w = load_audio_window(p, sample_rate=sr, cache_dir=cache)  # memmap hit
        w += 1.0  # in-place augmentation must not raise
        assert w.flags.writeable and float(w[0]) == 1.0

    def test_codec_unavailable_not_negative_cached(self, tmp_path, rng, monkeypatch):
        # Environmental failure (codec library not built) must NOT persist:
        # once the codec exists the same cache_dir serves real audio.
        from birdnet_stm32_tpu.audio import native

        p = tmp_path / "x.mp3"
        p.write_bytes(b"\xff\xfb\x90\x00" + bytes(1000))
        cache = tmp_path / "cache"
        monkeypatch.setattr(native, "codec_available", lambda: False)
        out = load_audio_window(p, sample_rate=8000, cache_dir=cache)
        assert out.size == 0
        assert list(cache.glob("*.npy")) == []  # no poisoned entry

    def test_oversize_file_bypasses_cache(self, tmp_path, rng, monkeypatch):
        import birdnet_stm32_tpu.audio.io as aio

        sr = 8000
        y = rng.uniform(-0.5, 0.5, sr * 4).astype(np.float32)
        p = tmp_path / "big.wav"
        save_wav(y, p, sr)
        cache = tmp_path / "cache"
        monkeypatch.setattr(aio, "CACHE_MAX_DECODED_BYTES", sr * 4 * 2)  # < file
        direct = load_audio_window(p, sample_rate=sr, max_duration=1.0)
        out = load_audio_window(p, sample_rate=sr, max_duration=1.0,
                                cache_dir=cache)
        np.testing.assert_array_equal(out, direct)  # direct path, same bytes
        assert not cache.exists() or list(cache.glob("*.npy")) == []


def test_truncated_wav_header_clamped(tmp_path, rng):
    """A data-chunk size larger than the file (streamed/interrupted
    recorders write 0xFFFFFFFF) must clamp to the bytes on disk — both the
    numpy reader and the native one."""
    import struct

    sr, n = 8000, 4000
    y = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    p = tmp_path / "trunc.wav"
    save_wav(y, p, sr)
    raw = bytearray(p.read_bytes())
    # Find the data chunk and blow up its declared size.
    i = raw.find(b"data")
    raw[i + 4 : i + 8] = struct.pack("<I", 0xFFFFFFF0)
    p.write_bytes(bytes(raw))

    from birdnet_stm32_tpu.audio.io import wav_info

    info = wav_info(p)
    assert info.frames == n  # clamped, not 0xFFFFFFF0 // 2
    out = load_audio_window(p, sample_rate=sr, max_duration=None)
    assert len(out) == n and np.corrcoef(out, y)[0, 1] > 0.99

    from birdnet_stm32_tpu.audio import native

    if native.available():
        assert native.wav_info(p)[2] == n
        z = native.wav_read(p, 0, n)
        assert len(z) == n

    # And with the decode cache: no empty negative entry for a good file.
    cached = load_audio_window(p, sample_rate=sr, max_duration=None,
                               cache_dir=tmp_path / "cache")
    assert len(cached) == n
