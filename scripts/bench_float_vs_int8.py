"""Float32/bf16 Flax serving vs the bit-exact INT8 executor (same checkpoint).

On an NPU, INT8 is the only fast path; on TPU the MXU runs bf16 natively
and the INT8 simulation pays int32-accumulator HBM traffic + exact
requantization VPU work. This script quantifies the trade on the real
chip (see docs/performance.md).

Usage: python scripts/bench_float_vs_int8.py [B]
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
from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor
from birdnet_stm32_tpu.utils.benchmarking import sustained_chunks_per_sec

KERAS = "/root/reference/checkpoints/birdnet_stm32n6_100.keras"
CONFIG = "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json"
TFLITE = "/root/reference/checkpoints/birdnet_stm32n6_100.tflite"

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
# One cfg: the transplant may adjust it to match the stored graph, and the
# frontend features must use that same adjusted geometry.
model, variables, cfg = load_reference_model(KERAS, CONFIG)
rng = np.random.default_rng(0)
wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))


def tput(fn, iters=20):
    return sustained_chunks_per_sec(fn, wave, iters=iters)


def cast16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree)


@jax.jit
def f32(w):
    return model.apply(variables, inputs_for_config(w, cfg), train=False).sum()


v16 = cast16(variables)


@jax.jit
def bf16(w):
    x = inputs_for_config(w, cfg).astype(jnp.bfloat16)
    return model.apply(v16, x, train=False).astype(jnp.float32).sum()


@jax.jit
def bf16_high(w):
    # The --bf16 serving default: HIGH-precision (3-pass) STFT matmuls.
    x = inputs_for_config(w, cfg, stft_precision="high").astype(jnp.bfloat16)
    return model.apply(v16, x, train=False).astype(jnp.float32).sum()


graph = TFLiteGraph(TFLITE)
fwd = build_executor(graph, batch_size=B)


@jax.jit
def int8(w):
    return fwd(inputs_for_config(w, cfg)).sum()


for name, fn in [("int8_exact", int8), ("float32", f32), ("bf16", bf16),
                 ("bf16_high_stft", bf16_high)]:
    v = tput(fn)
    print(json.dumps({"path": name, "B": B, "chunks_per_sec": round(v, 1),
                      "us_per_chunk": round(1e6 / v, 2)}), flush=True)

# Quality: bf16 vs f32 cosine on one batch (is the fast path usable?).
s32 = np.asarray(jax.jit(lambda w: model.apply(
    variables, inputs_for_config(w, cfg), train=False))(wave[:256]))
s16 = np.asarray(jax.jit(lambda w: model.apply(
    v16, inputs_for_config(w, cfg).astype(jnp.bfloat16),
    train=False).astype(jnp.float32))(wave[:256]))
cos = float(np.mean(np.sum(s32 * s16, -1) /
                    (np.linalg.norm(s32, axis=-1) * np.linalg.norm(s16, axis=-1) + 1e-12)))
print(json.dumps({"bf16_vs_f32_cosine": round(cos, 6)}), flush=True)
