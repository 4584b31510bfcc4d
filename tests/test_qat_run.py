"""run_qat orchestration test: load checkpoint -> STE fine-tune -> _qat dir.

Mirrors reference training/qat.py:171-306 behavior: class-count mismatch is
rejected, BN stays frozen, and the fine-tuned checkpoint lands next to the
source run.
"""

import numpy as np
import pytest

import jax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.quant.qat import run_qat
from birdnet_stm32_tpu.training.checkpoint import load_checkpoint, save_checkpoint


def tiny_cfg(**kw):
    base = dict(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                chunk_duration=1.0, embeddings_size=32, num_classes=2,
                class_names=["a", "b"], audio_frontend="librosa",
                mag_scale="none", alpha=0.25)
    base.update(kw)
    return ModelConfig(**base)


def toy_batches(cfg, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    T = cfg.chunk_samples
    t = np.arange(T) / cfg.sample_rate

    def gen():
        while True:
            labels = rng.integers(0, 2, batch)
            waves = np.stack([
                (np.sin(2 * np.pi * (300 if l == 0 else 1500) * t)
                 + 0.05 * rng.normal(size=T)).astype(np.float32)
                for l in labels])
            yield waves, np.eye(2, dtype=np.float32)[labels]

    return gen()


@pytest.mark.slow
def test_run_qat_end_to_end(tmp_path):
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg, jax.random.key(0))
    run_dir = tmp_path / "run"
    save_checkpoint(run_dir, jax.device_get(variables), cfg)

    batches = toy_batches(cfg)
    val = [next(batches) for _ in range(2)]

    with pytest.raises(ValueError, match="class"):
        run_qat(run_dir, batches, lambda: iter(val), num_classes=5,
                epochs=1, steps_per_epoch=2)

    bn_before = np.asarray(variables["batch_stats"]["stem_bn"]["mean"])
    best, history = run_qat(run_dir, batches, lambda: iter(val), num_classes=2,
                            epochs=1, steps_per_epoch=4, learning_rate=1e-4)
    assert (run_dir.parent / "run_qat" / "best").exists()
    assert np.isfinite(history[0]["loss"])
    # BN frozen during QAT: running stats unchanged.
    np.testing.assert_array_equal(
        np.asarray(best["batch_stats"]["stem_bn"]["mean"]), bn_before)
    # Weights did move.
    assert not np.array_equal(np.asarray(best["params"]["pred"]["kernel"]),
                              np.asarray(variables["params"]["pred"]["kernel"]))
    # Reload round-trip.
    _, reloaded, rcfg = load_checkpoint(run_dir.parent / "run_qat")
    assert rcfg.num_classes == 2
    np.testing.assert_array_equal(np.asarray(reloaded["params"]["pred"]["kernel"]),
                                  np.asarray(best["params"]["pred"]["kernel"]))


@pytest.mark.slow
@pytest.mark.integration
def test_qat_then_convert(tmp_path):
    """The reference deployment workflow: train -> QAT fine-tune -> INT8
    export with the cosine gate (qat.py:171-306 + cli/convert.py)."""
    from birdnet_stm32_tpu.conversion.pipeline import convert_model

    cfg = tiny_cfg(audio_frontend="hybrid", mag_scale="pwl")
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg, jax.random.key(3))
    run_dir = tmp_path / "run"
    save_checkpoint(run_dir, jax.device_get(variables), cfg)

    batches = toy_batches(cfg)
    val = [next(batches) for _ in range(2)]
    run_qat(run_dir, batches, lambda: iter(val), num_classes=2,
            epochs=1, steps_per_epoch=4, learning_rate=1e-4)

    qat_model, qat_vars, qat_cfg = load_checkpoint(tmp_path / "run_qat")
    calib = np.random.default_rng(0).uniform(0, 1, (12, *qat_cfg.input_shape())).astype(np.float32)
    report = convert_model(qat_model, qat_vars, qat_cfg,
                           tmp_path / "qat_quantized.tflite",
                           calibration_inputs=calib, min_cosine_sim=0.90,
                           num_validation_samples=8)
    assert report["validation"]["cosine_mean"] >= 0.90
