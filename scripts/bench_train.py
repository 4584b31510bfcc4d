"""Training-step throughput on the current backend: f32 vs bf16 mixed
precision (flagship-size DS-CNN, synthetic batches).

Usage: python scripts/bench_train.py [batch_size]
"""
import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import optax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.ops.frontend import inputs_for_config
from birdnet_stm32_tpu.parallel.steps import TrainState, make_train_step
from birdnet_stm32_tpu.training.losses import make_loss_fn
from birdnet_stm32_tpu.utils.benchmarking import sustained_carried_chunks_per_sec

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cfg = ModelConfig(sample_rate=22050, num_mels=64, spec_width=256,
                  fft_length=512, chunk_duration=3.0, embeddings_size=256,
                  num_classes=100, audio_frontend="hybrid", mag_scale="pwl",
                  alpha=1.0, frontend_trainable=True)
model = build_dscnn(cfg, class_activation="none")
variables = init_model(model, cfg, jax.random.key(0))
tx = optax.adam(1e-3)
loss_fn = make_loss_fn(multilabel=False)

from birdnet_stm32_tpu.data.pipeline import make_train_batcher

rng = np.random.default_rng(0)
wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))
y = jnp.asarray(np.eye(cfg.num_classes, dtype=np.float32)[
    rng.integers(0, cfg.num_classes, B)])
x = jax.jit(lambda w: inputs_for_config(w, cfg))(wave)
x.block_until_ready()

for name, dtype, prec in [("f32", None, "highest"),
                          ("bf16", jnp.bfloat16, "high")]:
    step = make_train_step(model, tx, loss_fn, mesh=None, donate=False,
                           compute_dtype=dtype)

    def step_only(state):
        state, m = step(state, x, y, jax.random.key(1))
        return state, m["loss"]

    best, state = sustained_carried_chunks_per_sec(
        step_only, TrainState.create(variables, tx), B)
    print(json.dumps({"mode": f"{name}_step_only", "B": B,
                      "train_chunks_per_sec": round(best, 1),
                      "steps_per_sec": round(best / B, 2),
                      "loss": round(float(step_only(state)[1]), 4)}), flush=True)

    # Full device pipeline: batcher (frontend + SpecAugment + mixup) + step
    # — what the training loop actually runs per batch.
    batcher = make_train_batcher(cfg, stft_precision=prec)

    def full(state):
        key = jax.random.key(1)
        xb, yb = batcher(key, wave, y)
        state, m = step(state, xb, yb, key)
        return state, m["loss"]

    best, _ = sustained_carried_chunks_per_sec(
        full, TrainState.create(variables, tx), B)
    print(json.dumps({"mode": f"{name}_with_batcher", "B": B,
                      "train_chunks_per_sec": round(best, 1),
                      "steps_per_sec": round(best / B, 2)}), flush=True)
