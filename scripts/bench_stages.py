"""Stage-split throughput on the current backend: frontend-only vs
INT8-executor-only vs fused (numbers quoted in docs/performance.md).

Usage: python scripts/bench_stages.py [model.tflite] [model_config.json]
"""
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.ops.frontend import inputs_for_config
from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor
from birdnet_stm32_tpu.utils.benchmarking import sustained_chunks_per_sec

TFLITE = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/checkpoints/birdnet_stm32n6_100.tflite")
CONFIG = sys.argv[2] if len(sys.argv) > 2 else (
    "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json")
cfg = ModelConfig.load(CONFIG)
graph = TFLiteGraph(TFLITE)
B = 2048
rng = np.random.default_rng(0)
wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))
fwd = build_executor(graph, batch_size=B)


@jax.jit
def fused(w):
    return fwd(inputs_for_config(w, cfg)).sum()


@jax.jit
def frontend_only(w):
    return inputs_for_config(w, cfg).sum()


x_feat = jax.jit(lambda w: inputs_for_config(w, cfg))(wave)
x_feat.block_until_ready()


@jax.jit
def model_only(x):
    return fwd(x).sum()


def tput(fn, arg, iters=20):
    return sustained_chunks_per_sec(fn, arg, iters=iters)


for name, fn, arg in [("fused", fused, wave),
                      ("frontend_only", frontend_only, wave),
                      ("model_only", model_only, x_feat)]:
    v = tput(fn, arg)
    print(json.dumps({"stage": name, "chunks_per_sec": round(v, 1),
                      "us_per_chunk": round(1e6 / v, 2)}), flush=True)
