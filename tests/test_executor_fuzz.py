"""Executor fidelity fuzz: random model configs -> INT8 export -> compare
the JAX integer-graph executor against the TFLite interpreter.

Conv/FC/ADD/MEAN/LOGISTIC paths are bit-exact; DIV/SOFTMAX/REDUCE_MAX use
float-faithful kernels (<= 1 LSB), so comparisons allow one output quantum.
"""

import numpy as np
import pytest

import jax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model

tf = pytest.importorskip("tensorflow")


CONFIGS = [
    dict(audio_frontend="hybrid", mag_scale="pwl", use_inverted_residual=True,
         use_se=True, class_activation="softmax"),
    dict(audio_frontend="hybrid", mag_scale="pcen", use_inverted_residual=False,
         use_se=True, class_activation="sigmoid"),
    dict(audio_frontend="raw", mag_scale="none", use_inverted_residual=True,
         use_se=False, use_attention_pooling=True, class_activation="softmax"),
    dict(audio_frontend="librosa", mag_scale="none", use_inverted_residual=False,
         use_se=False, class_activation="sigmoid"),
    # Remaining frontend/arch axes: precomputed MFCC input geometry,
    # log_mel + depth-scaled stages + SE + attention together.
    dict(audio_frontend="mfcc", mag_scale="none", use_inverted_residual=True,
         use_se=True, class_activation="softmax"),
    dict(audio_frontend="log_mel", mag_scale="none", use_inverted_residual=True,
         use_se=True, use_attention_pooling=True, depth_multiplier=2,
         class_activation="sigmoid"),
]

# Raw frontend with a stride that does NOT divide the chunk length
# (ceil(4100/32)=129; 32*129=4128 > 4100): the explicit symmetric pad
# before the VALID filterbank conv survives as a quantized PAD op in the
# exported graph (reference frontend.py:139-171) — the geometry every
# real-rate raw model hits (e.g. 2 s @ 22.05 kHz).
CONFIGS.append(
    dict(audio_frontend="raw", mag_scale="none", use_inverted_residual=True,
         use_se=True, class_activation="sigmoid", _sample_rate=4100))

# db magnitude scaling exports LOG + MAXIMUM ops (10*log10 with an eps
# clamp, reference magnitude.py:194-200) — the only mag_scale whose
# graph leaves the conv/add/mul op family.
CONFIGS.append(
    dict(audio_frontend="hybrid", mag_scale="db", use_inverted_residual=True,
         use_se=False, class_activation="softmax"))


@pytest.mark.slow
@pytest.mark.integration
@pytest.mark.parametrize("i,spec", list(enumerate(CONFIGS)))
def test_executor_matches_interpreter(i, spec, tmp_path):
    from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
    from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor

    spec = dict(spec)
    activation = spec.pop("class_activation")
    sample_rate = spec.pop("_sample_rate", 4000)
    cfg = ModelConfig(sample_rate=sample_rate, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=4,
                      class_names=list("abcd"), alpha=0.25, **spec)
    model = build_dscnn(cfg, class_activation=activation)
    v = init_model(model, cfg, jax.random.key(100 + i))

    rng = np.random.default_rng(i)
    lo, hi = (-1, 1) if cfg.audio_frontend == "raw" else (0, 1)
    calib = rng.uniform(lo, hi, (12, *cfg.input_shape())).astype(np.float32)
    tfl = convert_to_tflite(v, cfg, calib, quantize="int8",
                            class_activation=activation)

    graph = TFLiteGraph(tfl)
    fwd = jax.jit(build_executor(graph, batch_size=6))
    x = rng.uniform(lo, hi, (6, *cfg.input_shape())).astype(np.float32)
    ours = np.asarray(fwd(x))

    tfl_path = tmp_path / "m.tflite"
    tfl_path.write_bytes(tfl)
    from birdnet_stm32_tpu.models.runners import TFLiteInterpreterRunner

    theirs = TFLiteInterpreterRunner(tfl_path).predict(x)

    # Output is float32 (dequantized int8): one quantum = output scale.
    out_scale = 1.0 / 256.0  # int8 softmax/sigmoid output scale upper bound
    diff = np.abs(ours - theirs)
    assert diff.max() <= 1.5 * out_scale, (
        f"config {i}: max diff {diff.max():.5f} exceeds 1 output quantum")
    # And the vast majority of entries agree exactly.
    assert (diff == 0).mean() > 0.95, f"config {i}: only {(diff == 0).mean():.2%} exact"


@pytest.mark.slow
@pytest.mark.integration
def test_executor_matches_interpreter_per_tensor(tmp_path):
    """Per-tensor weight quantization (the reference's --per_tensor opt-out,
    quantize.py:139-141) exercises the scalar-multiplier requant path."""
    from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
    from birdnet_stm32_tpu.models.runners import TFLiteInterpreterRunner
    from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=4,
                      class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl",
                      use_inverted_residual=True, use_se=True)
    model = build_dscnn(cfg, class_activation="softmax")
    v = init_model(model, cfg, jax.random.key(42))

    rng = np.random.default_rng(42)
    calib = rng.uniform(0, 1, (12, *cfg.input_shape())).astype(np.float32)
    tfl = convert_to_tflite(v, cfg, calib, quantize="int8",
                            class_activation="softmax", per_channel=False)

    fwd = jax.jit(build_executor(TFLiteGraph(tfl), batch_size=6))
    x = rng.uniform(0, 1, (6, *cfg.input_shape())).astype(np.float32)
    ours = np.asarray(fwd(x))

    tfl_path = tmp_path / "m.tflite"
    tfl_path.write_bytes(tfl)
    theirs = TFLiteInterpreterRunner(tfl_path).predict(x)
    diff = np.abs(ours - theirs)
    assert diff.max() <= 1.5 / 256.0
    assert (diff == 0).mean() > 0.95


@pytest.mark.slow
@pytest.mark.integration
def test_fast_requant_close_but_not_gate_grade(tmp_path):
    """requant="fast" stays near the exact executor but is NOT gate-grade.

    Measured on the flagship 100-class checkpoint, fast mode's per-op
    <=1 LSB flips cascade to cosine ~0.996 end-to-end (below the 0.999
    conversion gate) — the reason bench.py and every quality-gated path
    keep the bit-exact pipeline. On this small graph we pin the contract:
    outputs within a few output quanta of exact, mostly identical, and
    documented as opt-in only.
    """
    from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
    from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=4,
                      class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl",
                      use_inverted_residual=True, use_se=True)
    model = build_dscnn(cfg, class_activation="softmax")
    v = init_model(model, cfg, jax.random.key(7))

    rng = np.random.default_rng(7)
    calib = rng.uniform(0, 1, (12, *cfg.input_shape())).astype(np.float32)
    tfl = convert_to_tflite(v, cfg, calib, quantize="int8",
                            class_activation="softmax")
    graph = TFLiteGraph(tfl)
    exact = jax.jit(build_executor(graph, batch_size=8))
    fast = jax.jit(build_executor(graph, batch_size=8, requant="fast"))

    x = rng.uniform(0, 1, (8, *cfg.input_shape())).astype(np.float32)
    a, b = np.asarray(exact(x)), np.asarray(fast(x))
    diff = np.abs(a - b)
    # Within a few output quanta after cascade; mostly exact on a small graph.
    assert diff.max() <= 4.0 / 256.0
    assert (diff == 0).mean() > 0.80
