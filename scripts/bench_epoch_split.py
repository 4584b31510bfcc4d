"""Flagship-epoch stage split: decode / host->device / device step.

Round-3 VERDICT weakness #4: the flagship run trained ~150x below the
measured step capability with no published breakdown. This script measures
each stage separately at the flagship training geometry (B=128,
3 s / 22.05 kHz chunks) so the epoch time decomposes into explained parts:

  1. loader  — AudioLoader decode+select chunks/s, float32 vs int16 rows
  2. H2D     — wall time to place one batch on the device, float32
               [B, 66150] (34 MB) vs int16 [B, 66151] (17 MB)
  3. step    — bf16 train step incl. the dequantizing batcher, chunks/s
               (data already on device; the tunnel-independent ceiling)

Prints one JSON line per measurement plus a derived s/epoch model
(80 steps x B=128, serial H2D + step — the trainer overlaps decode with
device work, so decode only binds when slower than H2D+step).

Usage: python scripts/bench_epoch_split.py AUDIO_DIR [--batch 128] [--steps 80]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import optax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.data.dataset import load_file_paths_from_directory, one_hot_labels
from birdnet_stm32_tpu.data.pipeline import AudioLoader, make_train_batcher
from birdnet_stm32_tpu.data.worker import LoaderConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.parallel.steps import TrainState, make_train_step
from birdnet_stm32_tpu.training.losses import make_loss_fn


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("audio_dir")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--loader_batches", type=int, default=12)
    args = ap.parse_args()

    B = args.batch
    cfg = ModelConfig(sample_rate=22050, num_mels=64, spec_width=256,
                      fft_length=512, chunk_duration=3.0, embeddings_size=256,
                      num_classes=100, audio_frontend="hybrid", mag_scale="pwl",
                      alpha=1.0, frontend_trainable=True, use_se=False,
                      use_inverted_residual=False)
    T = cfg.chunk_samples
    results = {}

    # --- 1. loader rate, float32 vs int16 rows ------------------------------
    paths, labels, class_names = load_file_paths_from_directory(args.audio_dir)
    labels_oh = one_hot_labels(labels, class_names)
    for tag, ship in (("float32", None), ("int16", "int16"), ("ulaw", "ulaw")):
        lcfg = LoaderConfig(sample_rate=cfg.sample_rate,
                            chunk_duration=cfg.chunk_duration,
                            num_classes=len(class_names),
                            max_chunks_per_file=2, snr_threshold=0.1,
                            seed=0, load_duration=30.0,
                            ship_int16=ship == "int16",
                            ship_ulaw=ship == "ulaw")
        loader = AudioLoader(paths, labels_oh, lcfg, batch_size=B,
                             num_workers=4, infinite=True)
        it = iter(loader)
        next(it)  # warm the pool
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.loader_batches):
            w, _ = next(it)
            n += w.shape[0]
        dt = time.perf_counter() - t0
        row = {"stage": f"loader_{tag}", "chunks_per_sec": round(n / dt, 1),
               "batch_bytes": int(w.nbytes)}
        results[f"loader_{tag}"] = row["chunks_per_sec"]
        print(json.dumps(row), flush=True)

    # --- 2. H2D per batch, float32 vs int16 ---------------------------------
    rng = np.random.default_rng(0)
    wf = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    wi = np.concatenate([
        np.clip(np.round(wf * 32767), -32768, 32767).astype(np.int16),
        np.full((B, 1), 32767, np.int16)], axis=1)
    from birdnet_stm32_tpu.data.worker import ulaw_encode

    wu = ulaw_encode(wf)  # [B, T] int8 mu-law rows (quarter of float32)
    # block_until_ready() is unreliable through the tunnel (CLAUDE.md): a
    # transfer can report ready before the bytes land. Force completion
    # with a device-dependent scalar read (the whole array must arrive to
    # be summed), then subtract the measured blocking-read floor.
    ssum = jax.jit(lambda a: a.astype(jnp.float32).sum())
    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.zeros((), jnp.float32)))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.zeros((), jnp.float32)))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(json.dumps({"stage": "blocking_read_floor",
                      "seconds": round(floor, 4)}), flush=True)
    for tag, arr in (("float32", wf), ("int16", wi), ("ulaw", wu)):
        for _ in range(2):  # warm/compile
            float(ssum(jnp.asarray(arr)))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(ssum(jnp.asarray(arr)))
            ts.append(time.perf_counter() - t0)
        med = max(1e-9, float(np.median(ts)) - floor)
        row = {"stage": f"h2d_{tag}", "seconds_per_batch": round(med, 3),
               "mb_per_batch": round(arr.nbytes / 1e6, 1),
               "mb_per_sec": round(arr.nbytes / 1e6 / med, 1)}
        results[f"h2d_{tag}"] = med
        print(json.dumps(row), flush=True)

    # --- 3. device step rate (batcher + bf16 train step, data resident) -----
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg, jax.random.key(0))
    tx = optax.adam(1e-3)
    step = make_train_step(model, tx, make_loss_fn(multilabel=True),
                           mesh=None, donate=False,
                           compute_dtype=jnp.bfloat16)
    batcher = make_train_batcher(cfg, stft_precision="high",
                                 feature_dtype=jnp.bfloat16,
                                 input_dtype="int16")
    state = TrainState.create(variables, tx)
    w_dev = jnp.asarray(wi)
    y_dev = jnp.asarray(np.eye(cfg.num_classes, dtype=np.float32)[
        rng.integers(0, cfg.num_classes, B)])
    key = jax.random.key(0)

    def one(state, i):
        x, y2 = batcher(jax.random.fold_in(key, i), w_dev, y_dev)
        state, m = step(state, x, y2, key)
        return state, m

    state, m = one(state, 0)  # compile
    float(m["loss"])  # real host read — block_until_ready is unreliable here
    t0 = time.perf_counter()
    iters = 30
    for i in range(1, iters + 1):
        state, m = one(state, i)
    float(m["loss"])  # the final loss depends on every enqueued step
    dt = time.perf_counter() - t0
    step_cps = iters * B / dt
    row = {"stage": "device_step_bf16_int16batcher",
           "chunks_per_sec": round(step_cps, 1),
           "seconds_per_step": round(dt / iters, 4)}
    results["step_cps"] = step_cps
    print(json.dumps(row), flush=True)

    # Same step with the ulaw-dequantizing batcher (the dequant is a few
    # elementwise ops fused into the frontend — expect ~= the int16 rate).
    batcher_u = make_train_batcher(cfg, stft_precision="high",
                                   feature_dtype=jnp.bfloat16,
                                   input_dtype="ulaw")
    wu_dev = jnp.asarray(wu)
    state_u = TrainState.create(variables, tx)

    def one_u(state, i):
        x, y2 = batcher_u(jax.random.fold_in(key, i), wu_dev, y_dev)
        state, m = step(state, x, y2, key)
        return state, m

    state_u, m = one_u(state_u, 0)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        state_u, m = one_u(state_u, i)
    float(m["loss"])
    dt = time.perf_counter() - t0
    step_cps_u = iters * B / dt
    print(json.dumps({"stage": "device_step_bf16_ulawbatcher",
                      "chunks_per_sec": round(step_cps_u, 1),
                      "seconds_per_step": round(dt / iters, 4)}), flush=True)
    results["step_cps_ulaw"] = step_cps_u

    # --- derived epoch model ------------------------------------------------
    for tag in ("float32", "int16", "ulaw"):
        cps = results["step_cps_ulaw"] if tag == "ulaw" else results["step_cps"]
        per_step = results[f"h2d_{tag}"] + B / cps
        decode_bound = args.steps * B / results[f"loader_{tag}"]
        serial = args.steps * per_step
        print(json.dumps({
            "stage": f"epoch_model_{tag}",
            "h2d_plus_step_s": round(serial, 1),
            "decode_s": round(decode_bound, 1),
            "expected_epoch_s": round(max(serial, decode_bound), 1),
            "note": "trainer overlaps decode with device work; epoch ~ "
                    "max(decode, h2d+step) + validation pass",
        }), flush=True)


if __name__ == "__main__":
    main()
