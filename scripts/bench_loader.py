"""Input-pipeline saturation: host loader chunks/s vs device step chunks/s.

The training loop is host-bound when the loader cannot feed the device's
measured step rate (scripts/bench_train.py: ~19k bf16 chunks/s/chip at
B=256 — i.e. the host must decode ~57k seconds of audio per second of
wall time). This script measures what the AudioLoader actually sustains
on a bulk corpus, sweeping worker counts, with and without the decoded-
waveform cache, and prints one JSON line per configuration.

Usage: python scripts/bench_loader.py AUDIO_DIR [--workers 4,8,16]
       [--executors thread,process] [--cache_dir DIR] [--batches N]
       [--batch_size B]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from birdnet_stm32_tpu.data.pipeline import AudioLoader
from birdnet_stm32_tpu.data.worker import LoaderConfig


def measure(paths, workers, batch_size, n_batches, cache_dir,
            executor="thread"):
    cfg = LoaderConfig(
        sample_rate=22050, chunk_duration=3.0, num_classes=2,
        max_chunks_per_file=20, snr_threshold=0.0, seed=0,
        cache_dir=cache_dir,
    )
    labels = np.tile(np.eye(2, dtype=np.float32)[0], (len(paths), 1))
    loader = AudioLoader(paths=paths, labels=labels, cfg=cfg,
                         batch_size=batch_size, num_workers=workers,
                         shuffle=True, infinite=True, executor=executor)
    it = iter(loader)
    next(it)  # warm the pool (thread spin-up, first decodes)
    t0 = time.perf_counter()
    chunks = 0
    for _ in range(n_batches):
        wave, y = next(it)
        chunks += wave.shape[0]
    dt = time.perf_counter() - t0
    return chunks / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("audio_dir")
    p.add_argument("--workers", default="4,8,16")
    p.add_argument("--executors", default="thread",
                   help="comma list of AudioLoader executors to sweep "
                        "(thread = production default, process = spawn pool)")
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=256)
    args = p.parse_args()

    paths = sorted(str(q) for q in Path(args.audio_dir).rglob("*.wav"))
    if not paths:
        raise SystemExit(f"no WAVs under {args.audio_dir}")

    import os

    nproc = os.cpu_count() or 1
    # The honest unit on a shared/small machine is chunks/s PER CORE: the
    # worker count only controls oversubscription; total throughput is
    # bounded by cores. Host capability = per-core rate x host cores.
    for ex in args.executors.split(","):
        for w in (int(x) for x in args.workers.split(",")):
            rate = measure(paths, w, args.batch_size, args.batches, None,
                           executor=ex)
            print(json.dumps({"mode": "decode", "executor": ex, "workers": w,
                              "nproc": nproc,
                              "loader_chunks_per_sec": round(rate, 1),
                              "chunks_per_sec_per_core": round(rate / nproc, 1)}),
                  flush=True)
            if args.cache_dir:
                # First pass populates the cache (unmeasured), second
                # serves memmap slices — the pre-staged configuration.
                measure(paths, w, args.batch_size, args.batches,
                        args.cache_dir, executor=ex)
                rate = measure(paths, w, args.batch_size, args.batches,
                               args.cache_dir, executor=ex)
                print(json.dumps({"mode": "cached", "executor": ex,
                                  "workers": w, "nproc": nproc,
                                  "loader_chunks_per_sec": round(rate, 1),
                                  "chunks_per_sec_per_core": round(rate / nproc, 1)}),
                      flush=True)


if __name__ == "__main__":
    main()
