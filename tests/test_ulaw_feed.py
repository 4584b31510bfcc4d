"""8-bit mu-law training feed: codec bounds, worker rows, device dequant.

The train loader can ship [T] int8 mu-law rows instead of float32
waveforms (QUARTER of the host->device bytes per step, vs half for
int16). Log companding keeps the waveform error RELATIVE (~2.2% of each
sample's amplitude) rather than absolute — the right error shape for
spectrogram features. This feed is for TRAINING only (lossy by design);
its accuracy cost is measured by the ladder's float32_ulaw_feed row
(ACCURACY.json, scripts/bench_accuracy.py).
"""

import numpy as np
import pytest

from birdnet_stm32_tpu.audio.io import save_wav
from birdnet_stm32_tpu.data.worker import (
    LoaderConfig,
    process_file,
    ulaw_encode,
)

# Host twin of models/serving._dequantize_ulaw (same formula in numpy).
_LN256 = np.float32(np.log1p(255.0))


def _ulaw_decode_np(q):
    f = q.astype(np.float32) / 127.0
    return np.sign(f) * np.expm1(np.abs(f) * _LN256) / 255.0


def _write_wav(path, sr, seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = 0.6 * np.sin(2 * np.pi * 880.0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 0.5 * t))
    sig += 0.02 * rng.normal(size=t.size)
    save_wav(np.clip(sig, -1, 1).astype(np.float32), path, sr)


def test_codec_round_trip_relative_bound():
    """decode(encode(x)) is within half a companded step of x: the
    relative error bound is (e^(ln256/254) - 1) ~ 2.2% plus an absolute
    floor of half the smallest step (~1/(255*127*2)^-1 territory)."""
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(-1, 1, 4096).astype(np.float32),
        np.float32(10.0) ** rng.uniform(-5, 0, 4096).astype(np.float32),
        np.zeros(8, np.float32),
    ])
    y = _ulaw_decode_np(ulaw_encode(x))
    rel_step = np.expm1(_LN256 / 254.0)  # half-step up/down in log domain
    tol = np.abs(x) * rel_step + 1.1 * np.expm1(_LN256 / 254.0) / 255.0
    assert np.all(np.abs(y - x) <= tol + 1e-7)
    # Zero maps to zero exactly; codes stay in the symmetric int8 range.
    assert np.all(ulaw_encode(np.zeros(4, np.float32)) == 0)
    q = ulaw_encode(x)
    assert q.dtype == np.int8 and q.min() >= -127 and q.max() <= 127


def test_device_decoder_matches_numpy_twin():
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        from birdnet_stm32_tpu.models.serving import _dequantize_ulaw

        q = np.arange(-127, 128, dtype=np.int8).reshape(1, -1)
        dev = np.asarray(_dequantize_ulaw(q))
        np.testing.assert_allclose(dev, _ulaw_decode_np(q), atol=2e-7)


def test_worker_rows_match_float_selection(tmp_path):
    """Same rng -> same window and chunk selection as the float feed;
    decoded rows are within the mu-law bound of the float chunks."""
    sr = 4000
    p = tmp_path / "a.wav"
    _write_wav(p, sr, 9.0)
    label = np.array([1.0, 0.0], np.float32)
    kw = dict(sample_rate=sr, chunk_duration=1.0, num_classes=2,
              max_chunks_per_file=2, snr_threshold=0.1, seed=7,
              load_duration=30.0, random_offset=True)
    rows_f = process_file((str(p), label, LoaderConfig(**kw), 123))
    rows_u = process_file((str(p), label, LoaderConfig(ship_ulaw=True, **kw), 123))
    assert len(rows_f) == len(rows_u) >= 1
    for (xf, lf), (q, lu) in zip(rows_f, rows_u):
        assert q.dtype == np.int8 and q.shape == (sr,)
        xu = _ulaw_decode_np(q)
        assert np.max(np.abs(xf - xu)) <= 0.03 * np.abs(xf).max() + 1e-3
        np.testing.assert_array_equal(lf, lu)


def test_noise_fallback_row(tmp_path):
    p = tmp_path / "corrupt.wav"
    p.write_bytes(b"RIFFgarbage")
    cfg = LoaderConfig(sample_rate=4000, chunk_duration=1.0, num_classes=3,
                       ship_ulaw=True)
    rows = process_file((str(p), np.array([1.0, 0, 0], np.float32), cfg, 1))
    assert len(rows) == 1
    row, lab = rows[0]
    assert row.dtype == np.int8 and row.shape == (4000,)
    np.testing.assert_array_equal(lab, np.zeros(3, np.float32))


def test_ship_modes_mutually_exclusive():
    cfg = LoaderConfig(sample_rate=4000, chunk_duration=1.0, num_classes=2,
                       ship_int16=True, ship_ulaw=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        process_file(("x.wav", np.zeros(2, np.float32), cfg, 0))


def test_loader_yields_int8_batches(tmp_path):
    from birdnet_stm32_tpu.data.pipeline import AudioLoader

    sr = 4000
    for i in range(4):
        _write_wav(tmp_path / f"{i}.wav", sr, 2.0, seed=i)
    paths = sorted(str(p) for p in tmp_path.glob("*.wav"))
    labels = np.eye(2, dtype=np.float32)[[0, 1, 0, 1]]
    cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=2,
                       max_chunks_per_file=1, ship_ulaw=True)
    loader = AudioLoader(paths, labels, cfg, batch_size=4, num_workers=0,
                         infinite=False, shuffle=False)
    w, y = next(iter(loader))
    assert w.dtype == np.int8 and w.shape == (4, sr)
    assert y.shape == (4, 2)


def test_val_loader_never_ships_ulaw(tmp_path):
    """Regression: the validation loader must ship float32 even when the
    train feed is ulaw — the trainer's val loop feeds inputs_for_config
    directly, and raw int8 code rows would silently promote to garbage
    features (caught live on the flagship probe, round 5)."""
    from birdnet_stm32_tpu.cli.train import build_loaders, get_args

    sr = 4000
    for i in range(6):
        d = tmp_path / ("a" if i % 2 else "b")
        d.mkdir(exist_ok=True)
        _write_wav(d / f"{i}.wav", sr, 2.0, seed=i)
    args = get_args(["--data_path_train", str(tmp_path),
                     "--train_feed", "ulaw", "--val_split", "0.34",
                     "--sample_rate", str(sr), "--chunk_duration", "1.0"])
    train_loader, val_loader, _, _ = build_loaders(args, ship=args.train_feed)
    assert train_loader.cfg.ship_ulaw and not train_loader.cfg.ship_int16
    assert not val_loader.cfg.ship_ulaw and not val_loader.cfg.ship_int16
    w, _ = next(iter(val_loader))
    assert w.dtype == np.float32


def test_serving_ulaw_ingress_close_to_float(tmp_path):
    """make_fused_classifier(input_dtype='ulaw') on mu-law chunks tracks
    the float-ingress scores closely (companded-waveform error only),
    and decode_for_classify(ulaw_io=True) emits [N, T] int8 rows."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner
    from birdnet_stm32_tpu.models.serving import (
        decode_for_classify,
        make_fused_classifier,
    )

    sr = 8000
    cfg = ModelConfig(sample_rate=sr, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=4, class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl")
    model = build_dscnn(cfg, class_activation="softmax")
    v = init_model(model, cfg, jax.random.key(0))
    runner = FlaxRunner(model, v, cfg)

    rng = np.random.default_rng(0)
    wave = np.clip(rng.normal(0, 0.1, int(sr * 2.2)), -0.999, 0.999).astype(np.float32)
    path = tmp_path / "u.wav"
    save_wav(wave * 0.7, path, sample_rate=sr)

    f32_chunks, *_ = decode_for_classify(path, cfg)
    u_chunks, *_ = decode_for_classify(path, cfg, ulaw_io=True)
    assert u_chunks.dtype == np.int8
    assert u_chunks.shape == f32_chunks.shape  # [N, T], no scale column

    s_f32 = make_fused_classifier(runner, cfg)(f32_chunks)
    s_u = make_fused_classifier(runner, cfg, input_dtype="ulaw")(u_chunks)
    a, b = s_f32.ravel(), s_u.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.995
    np.testing.assert_allclose(s_u, s_f32, atol=0.1)

    with pytest.raises(ValueError, match="mutually exclusive"):
        decode_for_classify(path, cfg, int16_io=True, ulaw_io=True)


def test_batcher_ulaw_close_to_float(tmp_path):
    """make_train_batcher(input_dtype='ulaw') produces features close to
    the float batcher's (same key -> same SpecAugment/mixup draws; the
    only difference is the companded waveform error)."""
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
    rows_u = process_file((str(p), label, LoaderConfig(ship_ulaw=True, **kw), 9))
    wf = np.stack([r for r, _ in rows_f])
    wu = np.stack([r for r, _ in rows_u])
    y = np.stack([lab for _, lab in rows_f])

    mcfg = ModelConfig(sample_rate=sr, chunk_duration=1.0, fft_length=128,
                       num_mels=16, spec_width=32, num_classes=2,
                       class_names=["a", "b"])
    kw_b = dict(spec_augment=True, mixup_alpha=0.2, mixup_probability=1.0)
    bf = make_train_batcher(mcfg, **kw_b)
    bu = make_train_batcher(mcfg, input_dtype="ulaw", **kw_b)
    key = jax.random.key(42)
    xf, yf = bf(key, wf, y)
    xu, yu = bu(key, wu, y)
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yu))
    # Features are min-max normalized to [0, 1]; the companding error
    # perturbs them by a few percent at most.
    assert np.max(np.abs(np.asarray(xf) - np.asarray(xu))) < 0.2
    # Cosine similarity stays near 1 (fidelity, not just boundedness).
    a = np.asarray(xf).ravel()
    b = np.asarray(xu).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99
