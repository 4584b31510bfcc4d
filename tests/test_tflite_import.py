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
