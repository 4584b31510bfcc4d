"""Batch-size / requant-mode sweep of the headline benchmark
(informs bench.py's B choice; see docs/performance.md).

Usage: python scripts/bench_sweep.py [model.tflite] [model_config.json]
"""
import json
import sys
import time

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
rng = np.random.default_rng(0)


def measure(B, requant):
    wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))
    fwd = build_executor(graph, batch_size=B, requant=requant)

    @jax.jit
    def classify(w):
        return fwd(inputs_for_config(w, cfg)).sum()

    # First call = compile + executable LOAD through the tunnel (7-130 s
    # variance on a warm cache) + one execution — an upper bound on
    # startup cost, NOT compile time.
    t0 = time.perf_counter()
    float(classify(wave))
    first_call_s = time.perf_counter() - t0
    best = sustained_chunks_per_sec(classify, wave,
                                    iters=max(4, int(40_000 / B)))
    print(json.dumps({"B": B, "requant": requant,
                      "chunks_per_sec": round(best, 1),
                      "first_call_s": round(first_call_s, 1)}), flush=True)


for B, rq in [(1024, "exact"), (2048, "exact"), (4096, "exact"),
              (1024, "fast"), (512, "exact")]:
    try:
        measure(B, rq)
    except Exception as e:
        print(f"B={B} {rq} failed: {type(e).__name__}: {e}", flush=True)
