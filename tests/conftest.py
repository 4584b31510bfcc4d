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
