"""Multi-format audio support via the native libav codec.

The reference decodes mp3/flac/ogg/m4a through soundfile/audioread
(data/dataset.py SUPPORTED_AUDIO_EXTS, audio/io.py:63-130); here the same
formats flow through native/audio_codec.cc. Tests gate on codec
availability so WAV-only hosts still pass.
"""

import numpy as np
import pytest

from birdnet_stm32_tpu.audio import native
from birdnet_stm32_tpu.audio.io import audio_info, load_audio_file, load_audio_window
from birdnet_stm32_tpu.data.dataset import (
    load_file_paths_from_directory,
    supported_audio_extensions,
)

pytestmark = pytest.mark.skipif(
    not native.codec_available(), reason="libav codec not available")

SR = 22050


def _tone(seconds=2.0, f=1200.0):
    t = np.arange(int(SR * seconds)) / SR
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


@pytest.mark.parametrize("ext", ["flac", "ogg", "mp3", "m4a"])
def test_roundtrip_by_format(tmp_path, ext):
    y = _tone()
    p = tmp_path / f"tone.{ext}"
    native.codec_encode(p, y, SR)
    got, sr = native.codec_decode(p)
    assert sr == SR
    assert abs(len(got) - len(y)) < SR // 4  # codec delay/padding bounded
    # Align (mp3 adds encoder delay) and compare a 1-s window.
    k = SR
    lag = int(np.argmax(np.correlate(got[: k + 2048], y[:k], mode="valid")))
    a, b = got[lag : lag + k], y[:k]
    m = min(len(a), len(b))
    cos = float(np.dot(a[:m], b[:m]) /
                (np.linalg.norm(a[:m]) * np.linalg.norm(b[:m]) + 1e-12))
    assert cos > 0.98, f"{ext}: cosine {cos}"


def test_load_audio_window_flac_resamples_and_normalizes(tmp_path):
    y = _tone()
    p = tmp_path / "tone.flac"
    native.codec_encode(p, y, SR)
    w = load_audio_window(p, sample_rate=16000, max_duration=10,
                          chunk_duration=1.0)
    assert w.size > 0
    assert abs(w.size - 32000) < 1600  # 2 s at 16 kHz
    assert np.isclose(np.abs(w).max(), 1.0, atol=1e-5)  # peak-normalized


def test_load_audio_file_chunks_ogg(tmp_path):
    p = tmp_path / "tone.ogg"
    native.codec_encode(p, _tone(3.0), SR)
    chunks = load_audio_file(p, sample_rate=SR, chunk_duration=1.0)
    assert chunks.shape[0] >= 3 and chunks.shape[1] == SR


def test_audio_info_probes_compressed(tmp_path):
    p = tmp_path / "tone.flac"
    native.codec_encode(p, _tone(), SR)
    info = audio_info(p)
    assert info.sample_rate == SR
    assert abs(info.duration - 2.0) < 0.25


def test_discovery_includes_compressed_formats(tmp_path):
    assert ".flac" in supported_audio_extensions()
    y = _tone()
    from birdnet_stm32_tpu.audio.io import save_wav

    save_wav(y, tmp_path / "bird_a" / "a.wav", SR)
    native.codec_encode(tmp_path / "bird_a" / "b.flac", y, SR)
    native.codec_encode(tmp_path / "bird_b" / "c.ogg", y, SR)
    paths, labels, class_names = load_file_paths_from_directory(tmp_path)
    assert len(paths) == 3
    assert class_names == ["bird_a", "bird_b"]


def test_offset_decode_is_sample_exact_on_flac(tmp_path):
    """codec_decode(offset, n) must equal the same slice of a full decode
    — validates the coarse-seek + PTS-skip path in audio_codec.cc (FLAC
    is lossless, so equality is exact)."""
    y = _tone(5.0)
    p = tmp_path / "t.flac"
    native.codec_encode(p, y, SR)
    full, sr = native.codec_decode(p)
    assert sr == SR
    for start in (0, 1000, SR // 2, 2 * SR + 7, 4 * SR):  # pre/post seek knee
        n = SR // 3
        win, _ = native.codec_decode(p, offset_frames=start, max_frames=n)
        ref = full[start:start + n]
        assert win.shape == ref.shape, f"offset {start}"
        np.testing.assert_array_equal(win, ref, err_msg=f"offset {start}")


def test_codec_wav_decode_matches_riff_reader(tmp_path):
    """The codec's WAV path and the in-repo RIFF reader agree (PCM16
    quantization is the only difference, bounded by 1/32768)."""
    from birdnet_stm32_tpu.audio.io import save_wav, wav_info

    y = _tone(2.0)
    p = tmp_path / "t.wav"
    save_wav(y, p, SR)  # 16-bit PCM
    got, sr = native.codec_decode(p)
    assert sr == SR
    info = wav_info(p)
    assert info.frames == len(got)
    riff = native.wav_read(p) if native.available() else None
    if riff is not None:
        assert np.abs(got - riff).max() <= 1.0 / 32768.0


def test_corrupt_compressed_file_degrades_to_empty(tmp_path):
    """Crash-tolerant loads (reference generator.py:101-103): a truncated
    or garbage compressed file must yield an empty window, which the
    pipeline then converts to a zero-label noise sample — never raise."""
    y = _tone()
    good = tmp_path / "good.flac"
    native.codec_encode(good, y, SR)
    truncated = tmp_path / "bad.flac"
    truncated.write_bytes(good.read_bytes()[: good.stat().st_size // 8])
    garbage = tmp_path / "junk.flac"  # flac demuxer requires fLaC magic
    garbage.write_bytes(b"\x00\xde\xad" * 1000)
    empty = tmp_path / "empty.ogg"
    empty.write_bytes(b"")
    for p in (truncated, garbage, empty):
        w = load_audio_window(p, sample_rate=16000, max_duration=10,
                              chunk_duration=1.0)
        assert isinstance(w, np.ndarray)
    # Truncated FLAC may decode a prefix, and libav may false-probe byte
    # soup as some audio format (same permissiveness as the reference's
    # audioread path) — so garbage only guarantees "never raise". A truly
    # unparseable (empty) file must come back empty.
    assert load_audio_window(empty, sample_rate=16000).size == 0


@pytest.mark.slow
@pytest.mark.integration
def test_evaluate_cli_on_compressed_dataset(tmp_path, capsys):
    """The evaluate verb runs end-to-end over a flac/ogg test set — the
    discovery, decode, chunking, and metrics paths all off-WAV."""
    import jax

    from birdnet_stm32_tpu.__main__ import main as dispatch
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    for cls, ext, f in [("bird_a", "flac", 900.0), ("bird_b", "ogg", 500.0)]:
        native.codec_encode(tmp_path / "data" / cls / f"x.{ext}",
                            _tone(2.0, f), SR)
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=2, class_names=["bird_a", "bird_b"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    model = build_dscnn(cfg, class_activation="softmax")
    x = inputs_for_config(np.zeros((1, int(cfg.sample_rate * cfg.chunk_duration)),
                                   np.float32), cfg)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    run_dir = tmp_path / "run"
    save_checkpoint(run_dir, variables, cfg)

    assert dispatch([
        "evaluate", "--model_path", str(run_dir),
        "--data_path_test", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "eval"), "--save_csv",
    ]) == 0
    out = capsys.readouterr().out
    assert "roc-auc" in out
    rows = (tmp_path / "eval" / "predictions.csv").read_text().splitlines()
    assert len(rows) == 3  # header + one row per compressed file


def test_mixed_format_loader_batches(tmp_path):
    """AudioLoader yields training batches from a wav+flac+ogg dataset."""
    from birdnet_stm32_tpu.audio.io import save_wav
    from birdnet_stm32_tpu.data.dataset import one_hot_labels
    from birdnet_stm32_tpu.data.pipeline import AudioLoader, LoaderConfig

    y = _tone(2.0)
    save_wav(y, tmp_path / "bird_a" / "a.wav", SR)
    native.codec_encode(tmp_path / "bird_a" / "b.flac", y, SR)
    native.codec_encode(tmp_path / "bird_b" / "c.ogg", _tone(2.0, 700), SR)
    paths, labels, class_names = load_file_paths_from_directory(tmp_path)
    loader = AudioLoader(
        paths, one_hot_labels(labels, class_names),
        LoaderConfig(sample_rate=4000, chunk_duration=1.0, snr_threshold=0.0,
                     random_offset=False),
        batch_size=3, num_workers=0, shuffle=False, infinite=False)
    wave, lab = next(iter(loader))
    assert wave.shape == (3, 4000) and lab.shape == (3, 2)
    assert np.isfinite(wave).all() and np.abs(wave).max() > 0.1


def test_decode_survives_undercounted_duration(tmp_path, monkeypatch):
    """Full-file decode must not truncate when the container's duration
    estimate undercounts (e.g. VBR mp3 without a Xing header): codec_decode
    grows the buffer and retries until the decoder stops short of capacity."""
    p = tmp_path / "long.flac"
    y = _tone(3.0)
    native.codec_encode(p, y, SR)

    real_info = native.codec_info

    def tiny_estimate(path):
        sr, ch, fr = real_info(path)
        return sr, ch, 16  # wildly undercounted frame estimate

    monkeypatch.setattr(native, "codec_info", tiny_estimate)
    decoded, sr = native.codec_decode(p)
    assert sr == SR
    # FLAC is lossless: the full signal must be present, not just the
    # estimate-sized prefix.
    assert abs(decoded.shape[0] - y.shape[0]) <= 16
    n = min(decoded.shape[0], y.shape[0])
    assert np.allclose(decoded[:n], y[:n], atol=1e-4)
