"""Conversion tests: BN-fused TF forward parity, INT8 export, cosine gate.

Mirrors the reference's conversion coverage (tests/test_conversion.py,
tests/test_quantization_sim.py): exported artifact quality is gated by an
explicit cosine threshold against the float model.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.conversion.export_tflite import build_tf_forward, convert_to_tflite, fuse_bn
from birdnet_stm32_tpu.conversion.pipeline import convert_model
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model

tf = pytest.importorskip("tensorflow")


def tiny_cfg(**kw):
    base = dict(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                chunk_duration=1.0, embeddings_size=32, num_classes=3,
                class_names=["a", "b", "c"], audio_frontend="hybrid",
                mag_scale="pwl", alpha=0.25)
    base.update(kw)
    return ModelConfig(**base)


def _flax_fwd(model, v, x):
    return np.asarray(jax.jit(lambda v, x: model.apply(v, x, train=False))(v, jnp.asarray(x)))


def test_fuse_bn_math():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    gamma, beta = rng.normal(size=8).astype(np.float32), rng.normal(size=8).astype(np.float32)
    mean, var = rng.normal(size=8).astype(np.float32), rng.uniform(0.5, 2, 8).astype(np.float32)
    fk, fb = fuse_bn(k, {"scale": gamma, "bias": beta}, {"mean": mean, "var": var}, eps=1e-3)
    x = rng.normal(size=(2, 5, 5, 4)).astype(np.float32)
    y_ref = tf.nn.conv2d(x, k, strides=1, padding="SAME").numpy()
    y_ref = gamma * (y_ref - mean) / np.sqrt(var + 1e-3) + beta
    y_fused = tf.nn.bias_add(tf.nn.conv2d(x, fk, strides=1, padding="SAME"), fb).numpy()
    np.testing.assert_allclose(y_fused, y_ref, atol=1e-4)


@pytest.mark.parametrize("fe,mag,kw", [
    ("hybrid", "pwl", {}),
    ("hybrid", "pcen", {"use_inverted_residual": False}),
    ("raw", "none", {"use_attention_pooling": True}),
    ("librosa", "none", {"use_se": False}),
])
def test_tf_forward_parity(fe, mag, kw):
    cfg = tiny_cfg(audio_frontend=fe, mag_scale=mag, **kw)
    model = build_dscnn(cfg)
    v = init_model(model, cfg, jax.random.key(5))
    x = np.random.default_rng(0).uniform(0, 1, (2, *cfg.input_shape())).astype(np.float32)
    ref = _flax_fwd(model, v, x)
    got = build_tf_forward(v, cfg)(tf.constant(x)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_convert_model_int8_gate_and_report(tmp_path):
    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    v = init_model(model, cfg, jax.random.key(1))
    calib = np.random.default_rng(2).uniform(0, 1, (16, *cfg.input_shape())).astype(np.float32)
    out = tmp_path / "model_quantized.tflite"
    report = convert_model(model, v, cfg, out, calibration_inputs=calib,
                           min_cosine_sim=0.90, num_validation_samples=8)
    assert out.exists()
    assert report["validation"]["cosine_mean"] >= 0.90
    # Tiny model: flatbuffer overhead dominates, so only sanity-check.
    assert report["compression_ratio"] > 0
    saved = json.loads((out.with_name(out.stem + "_report.json")).read_text())
    assert saved["tflite_bytes"] == out.stat().st_size
    npz = np.load(out.with_name(out.stem + "_validation_data.npz"))
    assert npz["inputs"].shape[0] <= 25
    assert npz["float_outputs"].shape == npz["quant_outputs"].shape


@pytest.mark.slow
def test_convert_model_no_data_random_calibration(tmp_path):
    """Without calibration audio, full INT8 conversion falls back to a
    random representative dataset (reference cli/convert.py:124-144)."""
    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    v = init_model(model, cfg, jax.random.key(1))
    out = tmp_path / "model_quantized.tflite"
    report = convert_model(model, v, cfg, out, min_cosine_sim=0.80,
                           num_calibration_samples=16,
                           num_validation_samples=8)
    assert out.exists()
    assert report["validation"]["cosine_mean"] >= 0.80


def test_random_representative_inputs_shapes():
    from birdnet_stm32_tpu.quant.calibrate import random_representative_inputs

    spec = random_representative_inputs(tiny_cfg(), num_samples=5, seed=0)
    assert spec.shape == (5, *tiny_cfg().input_shape())
    assert spec.dtype == np.float32
    assert spec.min() >= 0.0 and spec.max() <= 1.0  # uniform, like the ref
    raw = random_representative_inputs(
        tiny_cfg(audio_frontend="raw", mag_scale="none"), num_samples=3, seed=0)
    assert raw.shape[1:] == tiny_cfg(audio_frontend="raw",
                                     mag_scale="none").input_shape()
    assert raw.min() < 0.0  # normal-distributed waveforms


def test_convert_model_gate_fails(tmp_path):
    """An impossible gate must raise (reference convert.py:187-195)."""
    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    v = init_model(model, cfg, jax.random.key(1))
    calib = np.random.default_rng(2).uniform(0, 1, (8, *cfg.input_shape())).astype(np.float32)
    with pytest.raises(RuntimeError, match="gate failed"):
        convert_model(model, v, cfg, tmp_path / "m.tflite", calibration_inputs=calib,
                      min_cosine_sim=1.0 + 1e-9, num_validation_samples=4)


def test_convert_float_mode_no_gate(tmp_path):
    cfg = tiny_cfg(audio_frontend="librosa", mag_scale="none")
    model = build_dscnn(cfg)
    v = init_model(model, cfg)
    calib = np.random.default_rng(0).uniform(0, 1, (4, *cfg.input_shape())).astype(np.float32)
    report = convert_model(model, v, cfg, tmp_path / "m.tflite",
                           calibration_inputs=calib, quantize="float")
    assert "validation" not in report
    assert (tmp_path / "m.tflite").exists()


def test_tf_forward_parity_learn_mel_scale():
    """learn_mel_scale models export by materializing the trained triangular
    basis as the mel-mixer constant."""
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="softmax", learn_mel_scale=True)
    v = init_model(model, cfg, jax.random.key(9))
    # Perturb the logits so the basis is non-trivial.
    v = jax.tree_util.tree_map(lambda x: x, v)
    v["params"]["audio_frontend"]["mel_seg_logits"] = (
        v["params"]["audio_frontend"]["mel_seg_logits"]
        + jnp.linspace(-0.5, 0.5, cfg.num_mels + 1))
    x = np.random.default_rng(0).uniform(0, 1, (2, *cfg.input_shape())).astype(np.float32)
    ref = _flax_fwd(model, v, x)
    got = build_tf_forward(v, cfg)(tf.constant(x)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_stablehlo_export_roundtrip():
    """Serialize the serving fn to StableHLO and run the deserialized module."""
    from birdnet_stm32_tpu.conversion.export_stablehlo import (
        export_serving_fn,
        load_serving_fn,
    )

    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    v = init_model(model, cfg, jax.random.key(2))
    data = export_serving_fn(model, v, cfg, batch_size=4)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 1000

    fn = load_serving_fn(bytes(data))
    wave = np.random.default_rng(0).normal(size=(4, cfg.chunk_samples)).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(wave)))

    from birdnet_stm32_tpu.ops.frontend import inputs_for_config

    ref = np.asarray(jax.jit(lambda v, w: model.apply(
        v, inputs_for_config(w, cfg), train=False))(v, jnp.asarray(wave)))
    np.testing.assert_allclose(got, ref, atol=1e-6)
