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

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")

TARGET_PER_CHIP = 100_000 / 8.0  # BASELINE.json: >=100k chunks/s on v5e-8


# Measurement protocol (enqueue N, read one trailing scalar) lives in
# utils/benchmarking.py — shared with every scripts/bench_*.py driver.


def main() -> None:
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config
    from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor

    cfg = ModelConfig.load(
        "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json"
    )
    # B swept on the real chip: 512 -> 44.1k, 1024 -> 44.7k, 2048 -> 45.8k,
    # 4096 -> 45.6k chunks/s (exact requant); 2048 is the knee.
    B = 2048
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))

    # Headline: waveform -> STFT frontend -> INT8 DS-CNN (bit-exact vs the
    # shipped reference TFLite -> cosine 1.0 by construction).
    graph = TFLiteGraph("/root/reference/checkpoints/birdnet_stm32n6_100.tflite")
    int8_forward = build_executor(graph, batch_size=B)

    @jax.jit
    def classify_int8(wave):
        x = inputs_for_config(wave, cfg)
        # Sum the float scores to a scalar: the host read stays cheap and
        # the sum depends on every output element, so nothing is
        # dead-code-eliminated.
        return int8_forward(x).sum()

    from birdnet_stm32_tpu.utils.benchmarking import sustained_chunks_per_sec

    chunks_per_sec = sustained_chunks_per_sec(classify_int8, wave)
    print(json.dumps({
        "metric": "3s-chunks/sec/chip end-to-end (STFT frontend + INT8-sim DS-CNN, bit-exact vs ref TFLite)",
        "value": round(chunks_per_sec, 1),
        "unit": "chunks/sec/chip",
        "vs_baseline": round(chunks_per_sec / TARGET_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
