"""Test configuration: force CPU with 8 virtual devices before JAX loads.

Mirrors the reference's no-hardware-needed test philosophy (SURVEY.md §4):
sharding/pjit tests run against a virtual 8-device CPU mesh via
--xla_force_host_platform_device_count, never requiring a TPU.
"""

import os

# Must happen before `import jax` anywhere in the test process. The
# environment force-exports JAX_PLATFORMS=axon (real TPU), so override
# unconditionally — tests always run on a virtual 8-device CPU mesh.
# NOTE: in this JAX version --xla_force_host_platform_device_count no longer
# creates devices; jax_num_cpu_devices is the working knob.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: CPU compiles of the full DS-CNN take ~1 min;
# cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Full f32 accumulation for parity tests (default allows bf16 on some backends).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def sine_wave():
    """3 s of 1 kHz sine at 22050 Hz, like the reference's conftest signal."""
    sr = 22050
    t = np.arange(int(sr * 3.0)) / sr
    return (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32), sr


@pytest.fixture
def noise_wave(rng):
    sr = 22050
    return rng.uniform(-0.8, 0.8, int(sr * 3.0)).astype(np.float32), sr


@pytest.fixture
def wav_dataset(tmp_path):
    """Tiny class-structured WAV dataset: sine/chirp/noise classes
    (reference tests/fixtures/generate_fixtures.py:17-72 analog)."""
    from birdnet_stm32_tpu.audio.io import save_wav

    sr = 16000
    gen = np.random.default_rng(0)
    t = np.arange(int(sr * 2.0)) / sr

    def sine(f):
        return (0.6 * np.sin(2 * np.pi * f * t)).astype(np.float32)

    def chirp(f0, f1):
        return (0.6 * np.sin(2 * np.pi * (f0 * t + (f1 - f0) / 2 * t**2 / t[-1]))).astype(np.float32)

    classes = {
        "bird_a": [sine(1200 + 50 * i) for i in range(4)],
        "bird_b": [chirp(800 + 100 * i, 3000) for i in range(3)],
        "noise": [gen.normal(0, 0.2, len(t)).astype(np.float32) for _ in range(2)],
    }
    root = tmp_path / "data"
    for cls, waves in classes.items():
        d = root / cls
        d.mkdir(parents=True)
        for i, w in enumerate(waves):
            save_wav(w, d / f"{cls}_{i}.wav", sr)
    return root, sr
