"""Batch-knee sweep for the bf16 serving path (model bf16 + bf16-I/O STFT).

Round 2 re-swept the INT8 executor's knee only (B=4096); the bf16
headline (98.5k chunks/s) was measured at B=2048 and never swept. This
script measures the bf16 --bf16 serving configuration (the trace
make_fused_classifier builds for a bf16 FlaxRunner: HIGH-precision
bf16-I/O STFT feeding the bf16 model) at each batch size with the shared
enqueue-many protocol and prints one JSON line per point, plus the
cosine-vs-float32 fidelity at the best B (the serving gate is >=0.999).

Measured round 3 (flagship, one v5e chip): 1024 -> 113.5k, 2048 -> 115.0k,
4096 -> 114.3k chunks/s; the f32-intermediate path peaked at 98.6k
(B=2048) with 4096/8192 slower and 16384 OOM (8.1 GB f32 conv output).

Usage: python scripts/bench_bf16_knee.py [B ...]   (default 1024 2048 4096 8192)
"""
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.transplant import load_reference_model
from birdnet_stm32_tpu.ops.frontend import inputs_for_config
from birdnet_stm32_tpu.utils.benchmarking import sustained_chunks_per_sec

KERAS = "/root/reference/checkpoints/birdnet_stm32n6_100.keras"
CONFIG = "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json"

BATCHES = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192]

model, variables, cfg = load_reference_model(KERAS, CONFIG)
v16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16)
    if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
    variables)

rng = np.random.default_rng(0)
best_b, best_v = None, 0.0
for B in BATCHES:
    wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))

    @jax.jit
    def bf16_high(w):
        x = inputs_for_config(w, cfg, stft_precision="high",
                              feature_dtype=jnp.bfloat16)
        return model.apply(v16, x, train=False).astype(jnp.float32).sum()

    v = sustained_chunks_per_sec(bf16_high, wave)
    print(json.dumps({"path": "bf16_io_stft", "B": B,
                      "chunks_per_sec": round(v, 1),
                      "us_per_chunk": round(1e6 / v, 2)}), flush=True)
    if v > best_v:
        best_b, best_v = B, v
    del wave

# Fidelity at a fixed probe batch (cosine is batch-independent; 256 rows).
probe = jnp.asarray(rng.normal(size=(256, cfg.chunk_samples)).astype(np.float32))
s32 = np.asarray(jax.jit(lambda w: model.apply(
    variables, inputs_for_config(w, cfg), train=False))(probe))
s16 = np.asarray(jax.jit(lambda w: model.apply(
    v16, inputs_for_config(w, cfg, stft_precision="high",
                           feature_dtype=jnp.bfloat16),
    train=False).astype(jnp.float32))(probe))
cos = float(np.mean(np.sum(s32 * s16, -1) /
                    (np.linalg.norm(s32, axis=-1) * np.linalg.norm(s16, axis=-1)
                     + 1e-12)))
print(json.dumps({"best_B": best_b, "best_chunks_per_sec": round(best_v, 1),
                  "bf16_high_vs_f32_cosine": round(cos, 6)}), flush=True)
