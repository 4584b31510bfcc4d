"""Native C++ audio library tests: decode/resample/normalize parity against
the pure-numpy twins (audio/io.py) and scipy.
"""

import numpy as np
import pytest

from birdnet_stm32_tpu.audio import io as aio
from birdnet_stm32_tpu.audio import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture
def wav16(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 32000).astype(np.float32)
    p = tmp_path / "t.wav"
    aio.save_wav(x, p, 16000)
    return p, x


def test_wav_info(wav16):
    p, x = wav16
    sr, ch, fr = native.wav_info(p)
    assert (sr, ch, fr) == (16000, 1, len(x))


def test_decode_matches_numpy_reader(wav16):
    p, _ = wav16
    info = aio.wav_info(p)
    ref = aio._decode_frames(info, 0, info.frames).mean(axis=1)
    got = native.wav_read(p)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_windowed_read(wav16):
    p, _ = wav16
    full = native.wav_read(p)
    win = native.wav_read(p, start_frame=777, n_frames=1234)
    np.testing.assert_array_equal(win, full[777 : 777 + 1234])
    # Past-the-end reads truncate.
    tail = native.wav_read(p, start_frame=len(full) - 10, n_frames=1000)
    assert tail.shape == (10,)


def test_stereo_downmix(tmp_path, rng):
    import wave as wavemod

    left = rng.uniform(-0.5, 0.5, 2000).astype(np.float32)
    right = rng.uniform(-0.5, 0.5, 2000).astype(np.float32)
    inter = np.stack([left, right], axis=1).ravel()
    pcm = np.clip(inter * 32767, -32768, 32767).astype(np.int16)
    p = tmp_path / "stereo.wav"
    with wavemod.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    got = native.wav_read(p, downmix=True)
    ref = (pcm.reshape(-1, 2).astype(np.float32) / 32768.0).mean(axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("sr_in,sr_out", [(22050, 24000), (48000, 24000), (24000, 24000)])
def test_resample_matches_scipy(sr_in, sr_out, rng):
    from scipy.signal import resample_poly as scipy_rp

    x = rng.normal(0, 0.3, sr_in).astype(np.float32)
    got = native.resample_poly(x, sr_in, sr_out)
    g = np.gcd(sr_in, sr_out)
    ref = scipy_rp(x, sr_out // g, sr_in // g).astype(np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_load_audio_window_uses_native(wav16):
    """End-to-end load path gives the same result with and without native."""
    import birdnet_stm32_tpu.audio.native as nat

    p, _ = wav16
    fast = aio.load_audio_window(p, sample_rate=24000)
    saved_lib, saved_failed = nat._lib, nat._load_failed
    try:
        nat._lib, nat._load_failed = None, True  # force numpy fallback
        slow = aio.load_audio_window(p, sample_rate=24000)
    finally:
        nat._lib, nat._load_failed = saved_lib, saved_failed
    assert fast.shape == slow.shape
    np.testing.assert_allclose(fast, slow, atol=1e-4)


def test_extensible_float_wav(tmp_path, rng):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) float32 files resolve the SubFormat."""
    import struct

    x = rng.uniform(-0.5, 0.5, 1000).astype(np.float32)
    data = x.tobytes()
    # fmt chunk: cbSize=22, valid bits, channel mask, SubFormat GUID
    # (first two bytes = 3 -> IEEE float).
    sub = struct.pack("<H", 3) + b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000 * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4) + sub
    riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    p = tmp_path / "ext.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)

    got = native.wav_read(p)
    np.testing.assert_allclose(got, x, atol=1e-7)
    # The pure-python reader agrees.
    info = aio.wav_info(p)
    assert info.audio_format == 3
    ref = aio._decode_frames(info, 0, info.frames)[:, 0]
    np.testing.assert_allclose(got, ref, atol=1e-7)
