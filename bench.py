"""Benchmark driver: end-to-end 3-s chunk classification throughput per chip.

Measures the BASELINE.json headline metric — 3-second/22.05 kHz chunks
classified per second per chip, end-to-end (STFT frontend + DS-CNN) on the
flagship transplanted checkpoint — and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "chunks/sec/chip", "vs_baseline": N}

vs_baseline is measured against the 100k chunks/sec on v5e-8 target
=> 12,500 chunks/sec/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")

TARGET_PER_CHIP = 100_000 / 8.0  # BASELINE.json: >=100k chunks/s on v5e-8


def main() -> None:
    from birdnet_stm32_tpu.models.transplant import load_reference_model
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config

    model, variables, cfg = load_reference_model(
        "/root/reference/checkpoints/birdnet_stm32n6_100.keras",
        "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json",
    )

    @jax.jit
    def classify(wave):
        x = inputs_for_config(wave, cfg)
        return model.apply(variables, x, train=False)

    B = 1024
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))

    # Warmup / compile.
    classify(wave).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = classify(wave)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    chunks_per_sec = B * iters / dt
    print(json.dumps({
        "metric": "3s-chunks/sec/chip end-to-end (STFT frontend + DS-CNN, flagship ckpt)",
        "value": round(chunks_per_sec, 1),
        "unit": "chunks/sec/chip",
        "vs_baseline": round(chunks_per_sec / TARGET_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
