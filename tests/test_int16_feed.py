"""int16 training feed: worker rows, selection parity, device dequant.

The train loader can ship [T+1] int16 code+scale rows instead of float32
waveforms (half the host->device bytes per step). For mono PCM16 WAVs at
the model rate the shipped codes are RAW decoder output and the device
reconstruction is BIT-EXACT vs the float path (models/serving.py exact
division); other sources requantize at ~1 PCM16 LSB.
"""

import numpy as np
import pytest

from birdnet_stm32_tpu.audio.io import save_wav
from birdnet_stm32_tpu.data.worker import LoaderConfig, process_file


def _write_wav(path, sr, seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = 0.6 * np.sin(2 * np.pi * 880.0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 0.5 * t))
    sig += 0.02 * rng.normal(size=t.size)
    save_wav(np.clip(sig, -1, 1).astype(np.float32), path, sr)


def _dequant_rows(rows):
    """Host twin of the device dequant (numpy f32 division is correctly
    rounded, same as models/serving._div_exact_int on device)."""
    out = []
    for row, lab in rows:
        codes = row[:-1].astype(np.float32)
        scale = np.float32(max(abs(int(row[-1])), 1))
        out.append((codes / scale, lab))
    return out


@pytest.mark.parametrize("seconds", [2.0, 9.0])
def test_exact_path_bitwise_vs_float_feed(tmp_path, seconds):
    """PCM16 at the model rate: same rng -> same window, same chunk
    selection, and bit-identical reconstructed waveforms."""
    sr = 4000
    p = tmp_path / "a.wav"
    _write_wav(p, sr, seconds)
    label = np.array([1.0, 0.0], np.float32)
    kw = dict(sample_rate=sr, chunk_duration=1.0, num_classes=2,
              max_chunks_per_file=2, snr_threshold=0.1, seed=7,
              load_duration=30.0, random_offset=True)
    task_f = (str(p), label, LoaderConfig(**kw), 123)
    task_i = (str(p), label, LoaderConfig(ship_int16=True, **kw), 123)
    rows_f = process_file(task_f)
    rows_i = process_file(task_i)
    assert len(rows_f) == len(rows_i) >= 1
    for (xf, lf), (xi, li) in zip(rows_f, _dequant_rows(rows_i)):
        assert xi.dtype == np.float32 and xi.shape == xf.shape
        np.testing.assert_array_equal(xf, xi)  # BIT-exact
        np.testing.assert_array_equal(lf, li)
    # The raw rows really are int16 code+scale.
    assert all(r.dtype == np.int16 and r.shape == (sr + 1,) for r, _ in rows_i)


def test_fallback_requantizes_other_rates(tmp_path):
    """A WAV at a different rate can't ship raw codes: the float decode
    (resample) runs and requantizes at <= 1 PCM16 LSB, scale column 32767."""
    sr_file, sr_model = 8000, 4000
    p = tmp_path / "b.wav"
    _write_wav(p, sr_file, 3.0)
    label = np.array([0.0, 1.0], np.float32)
    kw = dict(sample_rate=sr_model, chunk_duration=1.0, num_classes=2,
              max_chunks_per_file=1, snr_threshold=0.1, seed=3,
              load_duration=30.0, random_offset=False)
    rows_f = process_file((str(p), label, LoaderConfig(**kw), 5))
    rows_i = process_file((str(p), label, LoaderConfig(ship_int16=True, **kw), 5))
    assert len(rows_f) == len(rows_i) >= 1
    assert all(int(r[-1]) == 32767 for r, _ in rows_i)
    for (xf, _), (xi, _) in zip(rows_f, _dequant_rows(rows_i)):
        assert np.max(np.abs(xf - xi)) <= 1.0 / 32767.0 + 1e-7


def test_noise_fallback_row_shape(tmp_path):
    """A failed decode ships one requantized noise row with a zero label."""
    p = tmp_path / "corrupt.wav"
    p.write_bytes(b"RIFFgarbage")
    cfg = LoaderConfig(sample_rate=4000, chunk_duration=1.0, num_classes=3,
                       ship_int16=True)
    rows = process_file((str(p), np.array([1.0, 0, 0], np.float32), cfg, 1))
    assert len(rows) == 1
    row, lab = rows[0]
    assert row.dtype == np.int16 and row.shape == (4001,)
    np.testing.assert_array_equal(lab, np.zeros(3, np.float32))


def test_loader_yields_int16_batches(tmp_path):
    from birdnet_stm32_tpu.data.pipeline import AudioLoader

    sr = 4000
    for i in range(4):
        _write_wav(tmp_path / f"{i}.wav", sr, 2.0, seed=i)
    paths = sorted(str(p) for p in tmp_path.glob("*.wav"))
    labels = np.eye(2, dtype=np.float32)[[0, 1, 0, 1]]
    cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=2,
                       max_chunks_per_file=1, ship_int16=True)
    loader = AudioLoader(paths, labels, cfg, batch_size=4, num_workers=0,
                         infinite=False, shuffle=False)
    w, y = next(iter(loader))
    assert w.dtype == np.int16 and w.shape == (4, sr + 1)
    assert y.shape == (4, 2)


def test_batcher_int16_matches_float(tmp_path):
    """make_train_batcher(input_dtype='int16') on code rows == the float
    batcher on the float feed, bit-exact for the exact shipping path
    (same key -> same SpecAugment/mixup draws)."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.data.pipeline import make_train_batcher

    sr = 4000
    p = tmp_path / "c.wav"
    _write_wav(p, sr, 5.0)
    label = np.array([1.0, 0.0], np.float32)
    kw = dict(sample_rate=sr, chunk_duration=1.0, num_classes=2,
              max_chunks_per_file=4, snr_threshold=0.0, seed=0,
              load_duration=30.0, random_offset=False)
    rows_f = process_file((str(p), label, LoaderConfig(**kw), 9))
    rows_i = process_file((str(p), label, LoaderConfig(ship_int16=True, **kw), 9))
    wf = np.stack([r for r, _ in rows_f])
    wi = np.stack([r for r, _ in rows_i])
    y = np.stack([l for _, l in rows_f])

    mcfg = ModelConfig(sample_rate=sr, chunk_duration=1.0, fft_length=128,
                       num_mels=16, spec_width=32, num_classes=2,
                       class_names=["a", "b"])
    kw_b = dict(spec_augment=True, mixup_alpha=0.2, mixup_probability=1.0)
    bf = make_train_batcher(mcfg, **kw_b)
    bi = make_train_batcher(mcfg, input_dtype="int16", **kw_b)
    key = jax.random.key(42)
    xf, yf = bf(key, wf, y)
    xi, yi = bi(key, wi, y)
    np.testing.assert_array_equal(np.asarray(xf), np.asarray(xi))
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yi))


def test_batcher_rejects_unknown_input_dtype():
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.data.pipeline import make_train_batcher

    with pytest.raises(ValueError, match="input_dtype"):
        make_train_batcher(ModelConfig(), input_dtype="int8")


def test_stereo_wav_falls_back_to_requant(tmp_path):
    """Stereo PCM16 is ineligible for raw-code shipping (downmix changes
    sample values): the worker must take the float-decode + requantize
    path (scale 32767), still within 1 LSB of the float feed."""
    import wave as wave_mod

    sr = 4000
    rng = np.random.default_rng(0)
    t = np.arange(sr * 2) / sr
    left = 0.5 * np.sin(2 * np.pi * 500 * t)
    right = 0.3 * np.sin(2 * np.pi * 900 * t) + 0.02 * rng.normal(size=t.size)
    pcm = np.stack([left, right], axis=1)
    codes = np.clip(np.round(pcm * 32767), -32768, 32767).astype("<i2")
    p = tmp_path / "stereo.wav"
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(codes.tobytes())

    label = np.array([1.0, 0.0], np.float32)
    kw = dict(sample_rate=sr, chunk_duration=1.0, num_classes=2,
              max_chunks_per_file=1, snr_threshold=0.0, seed=0,
              load_duration=30.0, random_offset=False)
    rows_f = process_file((str(p), label, LoaderConfig(**kw), 2))
    rows_i = process_file((str(p), label, LoaderConfig(ship_int16=True, **kw), 2))
    assert len(rows_f) == len(rows_i) >= 1
    assert all(int(r[-1]) == 32767 for r, _ in rows_i)  # requant marker
    for (xf, _), (xi, _) in zip(rows_f, _dequant_rows(rows_i)):
        assert np.max(np.abs(xf - xi)) <= 1.0 / 32767.0 + 1e-7
