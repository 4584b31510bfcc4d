"""Golden tests: device polyphase resampler vs scipy.signal.resample_poly.

The device resampler (ops/resample.py) must match the host/native one
(audio/io.py::fast_resample) because training decodes+resamples on the host
while serving may resample on device — any drift would shift the feature
distribution between the two paths.
"""

import numpy as np
import pytest
from scipy.signal import resample_poly

from birdnet_stm32_tpu.ops.resample import (
    kaiser_poly_filter,
    resample_output_len,
    resample_poly_device,
)

RATE_PAIRS = [
    (44100, 22050),  # up=1 down=2: pure strided conv
    (48000, 24000),
    (32000, 24000),  # up=3 down=4
    (22050, 24000),  # upsampling
    (48000, 22050),  # up=147 down=320: large filter
    (44100, 24000),  # up=80 down=147
]


@pytest.mark.parametrize("sr_in,sr_out", RATE_PAIRS)
def test_matches_scipy(sr_in, sr_out):
    from math import gcd

    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4801)).astype(np.float32)

    got = np.asarray(resample_poly_device(x, sr_in, sr_out))
    want = resample_poly(x.astype(np.float64), up, down, axis=-1)

    assert got.shape == want.shape
    assert got.shape[-1] == resample_output_len(x.shape[-1], sr_in, sr_out)
    # float32 conv vs float64 scipy: tolerance scales with filter length.
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_identity_and_1d():
    x = np.random.default_rng(1).normal(size=513).astype(np.float32)
    same = np.asarray(resample_poly_device(x, 24000, 24000))
    np.testing.assert_array_equal(same, x)

    y = np.asarray(resample_poly_device(x, 44100, 22050))
    want = resample_poly(x, 1, 2)
    assert y.ndim == 1
    np.testing.assert_allclose(y, want, atol=2e-5, rtol=1e-4)


def test_matches_host_fast_resample():
    """Device path == the host path used during training (io.py)."""
    from birdnet_stm32_tpu.audio.io import fast_resample

    x = np.random.default_rng(2).normal(size=9600).astype(np.float32)
    host = fast_resample(x, 48000, 24000)
    dev = np.asarray(resample_poly_device(x, 48000, 24000))
    np.testing.assert_allclose(dev, host, atol=2e-5, rtol=1e-4)


def test_filter_matches_scipy_design():
    """The numpy Kaiser design == scipy's firwin to float32 accuracy."""
    from scipy.signal import firwin

    for up, down in [(1, 2), (3, 4), (147, 320)]:
        max_rate = max(up, down)
        n_taps = 2 * 10 * max_rate + 1
        want = firwin(n_taps, 1.0 / max_rate, window=("kaiser", 5.0)) * up
        got = kaiser_poly_filter(up, down)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_serving_with_device_resample_matches_host_path():
    """classify(native-rate batch) == classify(host-resampled batch)."""
    import jax

    from birdnet_stm32_tpu.audio.io import fast_resample
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, audio_frontend="hybrid", mag_scale="pwl",
                      alpha=0.25)
    model = build_dscnn(cfg)
    runner = FlaxRunner(model, init_model(model, cfg, jax.random.key(0)), cfg)

    sr_src = 8000
    wave_src = np.random.default_rng(4).normal(
        size=(2, int(cfg.chunk_duration * sr_src))).astype(np.float32)

    native = make_fused_classifier(runner, cfg, input_sample_rate=sr_src)
    host = make_fused_classifier(runner, cfg)
    wave_host = np.stack([fast_resample(w, sr_src, cfg.sample_rate)
                          for w in wave_src])[:, :cfg.chunk_samples]

    np.testing.assert_allclose(native(wave_src), host(wave_host),
                               atol=1e-5, rtol=1e-4)


def test_benchmark_driver_device_resample(wav_dataset, capsys):
    """The [BENCH] driver with --device_resample decodes at native rate and
    classifies through the on-device resampler; scores stay consistent with
    the host-resample path."""
    import jax
    from pathlib import Path

    from birdnet_stm32_tpu.cli.benchmark import run_benchmark
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner

    root, sr = wav_dataset  # 16 kHz files
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    model = build_dscnn(cfg)
    runner = FlaxRunner(model, init_model(model, cfg, jax.random.key(0)), cfg)
    files = sorted(str(p) for p in Path(root).rglob("*.wav"))[:3]

    dev = run_benchmark(runner, cfg, cfg.class_names, files, batch_size=8,
                        device_resample=True)
    out = capsys.readouterr().out
    assert "compiling device-resample classifier for 16000 Hz" in out
    host = run_benchmark(runner, cfg, cfg.class_names, files, batch_size=8)
    for d, h in zip(dev["per_file"], host["per_file"]):
        assert d["top1"] == h["top1"]
        np.testing.assert_allclose(d["score"], h["score"], atol=1e-3)


def test_pipelined_driver_matches_serial(wav_dataset, capsys):
    """Pipelined serving (threaded decode + async dispatch) produces the
    same per-file predictions as the serial driver and keeps the protocol."""
    import jax
    from pathlib import Path

    from birdnet_stm32_tpu.cli.benchmark import (
        run_benchmark,
        run_benchmark_pipelined,
    )
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    model = build_dscnn(cfg)
    runner = FlaxRunner(model, init_model(model, cfg, jax.random.key(0)), cfg)
    files = sorted(str(p) for p in Path(root).rglob("*.wav"))

    piped = run_benchmark_pipelined(runner, cfg, cfg.class_names, files,
                                    batch_size=4, decode_workers=3,
                                    max_outstanding=2, device_resample=True)
    out = capsys.readouterr().out
    assert "=== DONE ===" in out and "pipelined" in out
    serial = run_benchmark(runner, cfg, cfg.class_names, files, batch_size=4,
                           device_resample=True)
    assert piped["chunks"] == serial["chunks"]
    assert len(piped["per_file"]) == len(serial["per_file"])
    for p, s in zip(piped["per_file"], serial["per_file"]):
        assert p["file"] == s["file"] and p["top1"] == s["top1"]
        np.testing.assert_allclose(p["score"], s["score"], atol=1e-5)


def test_chunk_batch_pads_to_model_geometry():
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.ops.resample import resample_chunk_batch

    cfg = ModelConfig(sample_rate=24000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=2, audio_frontend="hybrid", mag_scale="pwl")
    # 1 s at 44.1 kHz -> 24 kHz gives ceil(44100*80/147)=24000 exactly here;
    # use an off-by-one source length to exercise the pad path.
    wave = np.random.default_rng(3).normal(size=(3, 44099)).astype(np.float32)
    out = np.asarray(resample_chunk_batch(wave, 44100, cfg))
    assert out.shape == (3, cfg.chunk_samples)
