"""INT8 integer-graph executor parity vs the TFLite interpreter.

Integration tests: need TF + the shipped reference .tflite. The headline
gate is the BASELINE.json requirement — cosine >= 0.999 against reference
TFLite outputs on realistic (calibration-like) inputs.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.integration

TFLITE = "/root/reference/checkpoints/birdnet_stm32n6_100.tflite"


def make_realistic_batch(n=4, sr=22050, seed=7):
    """Linear spectrograms of synthetic chirps (in-distribution-ish)."""
    import jax.numpy as jnp

    from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch

    rng = np.random.default_rng(seed)
    T = sr * 3
    waves = []
    for _ in range(n):
        t = np.arange(T) / sr
        f0 = rng.uniform(1000, 6000)
        chirp = np.sin(2 * np.pi * (f0 * t + rng.uniform(200, 900) * t**2))
        am = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(2, 5) * t)
        w = 0.8 * chirp * am + 0.1 * rng.normal(size=T)
        waves.append((w / np.abs(w).max()).astype(np.float32))
    S = spectrogram_batch(jnp.asarray(np.stack(waves)), sample_rate=sr, n_fft=512,
                          mel_bins=-1, spec_width=256, mag_scale="none", mode="linear")
    return np.asarray(S)[..., None].astype(np.float32)


@pytest.fixture(scope="module")
def interpreter_outputs():
    tf = pytest.importorskip("tensorflow")
    x = make_realistic_batch(4)
    interp = tf.lite.Interpreter(
        model_path=TFLITE,
        experimental_op_resolver_type=tf.lite.experimental.OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES,
    )
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.resize_tensor_input(inp["index"], x.shape)
    interp.allocate_tensors()
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    return x, interp.get_tensor(out["index"])


def test_int8_executor_bit_exact(interpreter_outputs):
    """The integer-graph executor reproduces the interpreter BIT-EXACTLY
    (cosine = 1.0), far beyond the >=0.999 BASELINE gate."""
    from birdnet_stm32_tpu.models.runners import TFLiteSimRunner

    x, golden = interpreter_outputs
    ours = TFLiteSimRunner(TFLITE).predict(x)
    assert ours.shape == golden.shape
    np.testing.assert_array_equal(ours, golden)


def test_int8_executor_batch_one(interpreter_outputs):
    from birdnet_stm32_tpu.models.runners import TFLiteSimRunner

    x, golden = interpreter_outputs
    runner = TFLiteSimRunner(TFLITE)
    one = runner.predict(x[:1])
    np.testing.assert_array_equal(one[0], golden[0])


def test_runner_dispatch():
    from birdnet_stm32_tpu.models.runners import TFLiteSimRunner, load_model_runner

    r = load_model_runner(TFLITE)
    assert isinstance(r, TFLiteSimRunner)
    with pytest.raises(ValueError):
        load_model_runner("/tmp/nonexistent.xyz")


def test_pretransposed_input_bit_equal(tmp_path):
    """build_executor(pretransposed_input=True) folds the entry
    QUANTIZE->TRANSPOSE: feeding the transposed orientation gives bit-equal
    outputs (quantize is elementwise)."""
    import jax
    import jax.numpy as jnp

    from birdnet_stm32_tpu.quant.tflite_import import (
        TFLiteGraph,
        build_executor,
        entry_transpose_perm,
    )

    g = TFLiteGraph("/root/reference/checkpoints/birdnet_stm32n6_100.tflite")
    perm = entry_transpose_perm(g)
    assert perm == (0, 3, 2, 1)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (4, 257, 256, 1)).astype(np.float32)
    std = np.asarray(jax.jit(build_executor(g, batch_size=4))(jnp.asarray(x)))
    x_t = np.transpose(x, perm)
    pt = np.asarray(jax.jit(build_executor(g, batch_size=4, pretransposed_input=True))(
        jnp.asarray(x_t)))
    np.testing.assert_array_equal(std, pt)

    with pytest.raises(ValueError, match="QUANTIZE"):
        # A graph without the entry pattern must be rejected: build a tiny
        # graph-free check via a second call on a graph whose first op is not
        # QUANTIZE (reuse g but monkeypatch the op list).
        import copy

        g2 = copy.copy(g)
        g2.ops = g.ops[2:]
        build_executor(g2, batch_size=1, pretransposed_input=True)


def test_prequantized_input_bit_equal():
    """build_executor(prequantized_input=True) consumes the int8 entry
    tensor a producer quantized with entry_quant_params: bit-equal to the
    standard float path, and end-to-end bit-equal when that producer is
    the fused Pallas frontend's int8-quantize epilogue (interpret mode)."""
    import jax
    import jax.numpy as jnp

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import fused_spectrogram
    from birdnet_stm32_tpu.quant.tflite_import import (
        TFLiteGraph,
        build_executor,
        entry_quant_params,
        entry_transpose_perm,
    )

    g = TFLiteGraph(TFLITE)
    scale, zp = entry_quant_params(g)
    perm = entry_transpose_perm(g)
    cfg = ModelConfig.load(
        "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json")

    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.normal(size=(8, cfg.chunk_samples)).astype(np.float32))
    f32 = np.asarray(fused_spectrogram(
        wave, mode="linear", n_fft=cfg.fft_length, spec_width=cfg.spec_width,
        interpret=True))[..., None]  # [B, F, W, 1] model-input layout
    q_entry = np.asarray(fused_spectrogram(
        wave, mode="linear", n_fft=cfg.fft_length, spec_width=cfg.spec_width,
        quant=(scale, zp), interpret=True))  # [B, 1, W, F] int8

    std = np.asarray(jax.jit(build_executor(g, batch_size=8))(jnp.asarray(f32)))
    pre = np.asarray(jax.jit(build_executor(g, batch_size=8, prequantized_input=True))(
        jnp.asarray(q_entry)))
    np.testing.assert_array_equal(std, pre)

    # The producer must quantize with exactly the executor's formula: the
    # kernel epilogue == quantize(transpose(float features)).
    v = (np.transpose(f32, perm) / np.float32(scale)).astype(np.float32)
    manual = np.clip(np.sign(v) * np.floor(np.abs(v) + 0.5) + zp,
                     -128, 127).astype(np.int8)
    np.testing.assert_array_equal(q_entry, manual)
