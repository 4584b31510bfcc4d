"""Serve CLI: continuous directory-watching classification service.

The TPU analog of the firmware's steady-state loop (firmware/Src/main.c +
sd_handler.c): the board mounts the SD card, scans `audio/`, classifies
each WAV, prints top-K over UART, and appends a TSV line per file to
`results.txt` (sd_handler.c:90-108 — filename then every class score at 4
decimals). Here the "SD card" is a watched directory: new WAVs are picked
up every poll interval, classified through the fused device dispatch, and
appended to the results file with the same TSV schema. Already-recorded
files (first column of the results file) are skipped on restart, so the
service is resumable — like re-inserting the SD card.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser(
        "birdnet_stm32_tpu serve",
        description="Watch a directory and classify new WAVs continuously.")
    p.add_argument("--model_path", required=True,
                   help="checkpoint dir, .tflite, or reference .keras")
    p.add_argument("--audio_dir", required=True, help="directory to watch")
    p.add_argument("--config_path", default=None)
    p.add_argument("--labels_path", default=None)
    p.add_argument("--results_file", default=None,
                   help="TSV results path (default: <audio_dir>/results.txt, "
                        "the firmware APP_RESULTS_FILE analog)")
    p.add_argument("--poll_interval", type=float, default=2.0,
                   help="seconds between directory scans")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--top_k", type=int, default=3)
    p.add_argument("--score_threshold", type=float, default=0.01)
    p.add_argument("--thresholds", default=None, metavar="JSON",
                   help="per-class thresholds file ({class: threshold}, as "
                        "written by `evaluate --optimize_thresholds`); "
                        "classes absent from the file use "
                        "--score_threshold. Overrides the flat rule")
    p.add_argument("--chunk_overlap", type=float, default=0.0)
    p.add_argument("--bf16", action="store_true",
                   help="serve float checkpoints in bfloat16")
    p.add_argument("--device_resample", action="store_true",
                   help="decode at native rate, resample on device")
    p.add_argument("--int16_io", action="store_true",
                   help="ship waveforms to the device as int16 PCM codes "
                        "(half the host->device bandwidth; dequantized "
                        "inside the fused dispatch). BIT-EXACT vs the "
                        "float path for mono PCM16 WAVs at the model "
                        "rate (raw codes); ~1 LSB error otherwise")
    p.add_argument("--ulaw_io", action="store_true",
                   help="ship waveforms as int8 mu-law codes (quarter of "
                        "the float32 host->device stream; NOT bit-exact — "
                        "~2.2%% relative companding error, measured score "
                        "cosine in docs/performance.md)")
    p.add_argument("--decode_threads", type=int, default=0,
                   help="decode N files ahead on threads, overlapping host "
                        "decode with device compute (0 = serial)")
    p.add_argument("--once", action="store_true",
                   help="process the current directory contents and exit")
    return p.parse_args(argv)


def _recorded_files(results_file: Path) -> set[str]:
    """First column of an existing results TSV (resume support)."""
    if not results_file.exists():
        return set()
    return {line.split("\t", 1)[0]
            for line in results_file.read_text().splitlines() if line}


def _append_result(results_file: Path, name: str, scores: np.ndarray) -> None:
    """One TSV line: filename then every class score at 4 decimals
    (sd_handler.c:90-108 format)."""
    with open(results_file, "a") as f:
        f.write(name + "".join(f"\t{s:.4f}" for s in scores) + "\n")


def serve_loop(runner, cfg, classes, audio_dir: Path, results_file: Path,
               poll_interval: float = 2.0, batch_size: int = 64, top_k: int = 3,
               score_threshold: float = 0.01, overlap: float = 0.0,
               device_resample: bool = False, once: bool = False,
               max_polls: int | None = None, decode_threads: int = 0,
               int16_io: bool = False, ulaw_io: bool = False) -> int:
    """Watch `audio_dir`; classify + record new files. Returns files served.

    With decode_threads > 0 the next files decode on host threads while
    the device classifies the current one (the serve-side analog of
    `benchmark --pipeline`; decode releases the GIL in the native paths).
    Results stay in deterministic directory order either way.
    """
    from birdnet_stm32_tpu.models.serving import (
        classify_in_batches,
        decode_for_classify,
        make_classifier_cache,
        top_predictions,
    )

    from birdnet_stm32_tpu.data.dataset import supported_audio_extensions

    classifier_for = make_classifier_cache(
        runner, cfg,
        input_dtype="int16" if int16_io else ("ulaw" if ulaw_io else None))
    exts = supported_audio_extensions()

    done = _recorded_files(results_file)
    if done:
        print(f"[serve] resuming: {len(done)} files already in {results_file.name}")
    print(f"[serve] watching {audio_dir} (poll {poll_interval:.1f}s); "
          f"results -> {results_file}")

    def decode(path: Path):
        """(rel, chunks, src_rate, error) — runs on a worker thread when
        decode_threads > 0, so it must not touch shared state. Decode
        policy is shared with the benchmark driver (decode_for_classify)."""
        rel = str(path.relative_to(audio_dir))
        try:
            # int16 conversion happens inside decode_for_classify, on this
            # thread (raw PCM16 codes when eligible, requantize fallback).
            chunks, src_rate, _dur, _ms = decode_for_classify(
                path, cfg, overlap, max_duration=None,
                device_resample=device_resample, int16_io=int16_io,
                ulaw_io=ulaw_io)
        except Exception as e:
            return rel, None, cfg.sample_rate, e
        return rel, chunks, src_rate, None

    served = 0
    polls = 0
    pending: dict[str, int] = {}  # rel -> size at last poll (copy-in-progress guard)
    pool = None
    if decode_threads > 0:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=decode_threads,
                                  thread_name_prefix="serve-decode")
    try:
        while True:
            new = sorted(
                p for p in audio_dir.rglob("*")
                if p.suffix.lower() in exts
                and str(p.relative_to(audio_dir)) not in done)
            # Prune copy-in-progress entries for files that vanished, so a
            # long-running service doesn't accumulate state for transients.
            live = {str(p.relative_to(audio_dir)) for p in new}
            for gone in [r for r in pending if r not in live]:
                del pending[gone]
            ready = []
            for path in new:
                # Key by path relative to the watched dir: bare filenames
                # collide across class subfolders.
                rel = str(path.relative_to(audio_dir))
                # Don't classify a file still being copied in: wait until
                # its size is stable across two polls (skipped in --once
                # mode, where the caller asserts the dir is complete).
                if not once:
                    try:
                        size = path.stat().st_size
                    except OSError:
                        continue
                    if pending.get(rel) != size:
                        pending[rel] = size
                        continue
                    pending.pop(rel, None)
                ready.append(path)
            if pool is not None:
                # Decode ahead through a BOUNDED sliding window (same bound
                # as benchmark --pipeline): submitting a whole backlog at
                # once would buffer every decoded waveform in RAM when the
                # device is the slower stage. Consumption stays in
                # directory order for deterministic results.
                def bounded_decode(paths, window=max(2 * decode_threads, 4)):
                    from collections import deque

                    it = iter(paths)
                    # range first: zip pulls left-to-right, so `it` must be
                    # second or the (window+1)th path gets consumed and lost.
                    q = deque(pool.submit(decode, p)
                              for _, p in zip(range(window), it))
                    while q:
                        yield q.popleft().result()
                        for p in it:
                            q.append(pool.submit(decode, p))
                            break

                decoded = bounded_decode(ready)
            else:
                decoded = (decode(p) for p in ready)
            for rel, chunks, src_rate, err in decoded:
                t0 = time.perf_counter()
                if err is not None:
                    print(f"[serve] {rel}: decode failed ({err}); skipped")
                    done.add(rel)
                    continue
                if chunks.shape[0] == 0:
                    print(f"[serve] {rel}: no audio; skipped")
                    done.add(rel)
                    continue
                classify = classifier_for(src_rate)
                scores, _ = classify_in_batches(classify, chunks, batch_size)
                pooled = scores.mean(axis=0)
                _append_result(results_file, rel, pooled)
                done.add(rel)
                served += 1
                top = top_predictions(pooled, top_k, score_threshold)
                preds = ", ".join(f"{classes[i]} ({pooled[i]:.3f})" for i in top)
                dt = (time.perf_counter() - t0) * 1000.0
                print(f"file: {rel}  chunks: {len(chunks)}  top: {preds}  "
                      f"[{dt:.0f} ms]")
            polls += 1
            if once or (max_polls is not None and polls >= max_polls):
                break
            time.sleep(poll_interval)
    except KeyboardInterrupt:
        print("\n[serve] interrupted")
    finally:
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)
    print(f"=== DONE ===\nfiles served: {served}  results: {results_file}")
    return served


def main(argv=None) -> int:
    args = get_args(argv)

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.data.species import open_species_list
    from birdnet_stm32_tpu.models.runners import load_model_runner

    dtype = None
    if args.bf16:
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    from birdnet_stm32_tpu.cli.deploy import resolve_config_path

    args.config_path = resolve_config_path(args.model_path, args.config_path)
    runner = load_model_runner(Path(args.model_path), args.config_path,
                               dtype=dtype)
    cfg = getattr(runner, "cfg", None)
    if cfg is None:
        if args.config_path is None:
            raise SystemExit("--config_path required for .tflite models "
                             "(no model_config.json sidecar found next to "
                             f"{args.model_path})")
        cfg = ModelConfig.load(args.config_path)
    from birdnet_stm32_tpu.cli.benchmark import _resolve_classes

    classes = (open_species_list(args.labels_path) if args.labels_path
               else cfg.class_names)
    classes = _resolve_classes(classes, cfg)

    audio_dir = Path(args.audio_dir)
    if not audio_dir.is_dir():
        raise SystemExit(f"audio_dir not found: {audio_dir}")
    results_file = Path(args.results_file) if args.results_file else (
        audio_dir / "results.txt")

    score_threshold = args.score_threshold
    if args.thresholds:
        # Per-class operating point (evaluate --optimize_thresholds):
        # vectorize over the serving class order; absent classes keep the
        # flat --score_threshold.
        import json as _json

        th = _json.loads(Path(args.thresholds).read_text())
        unknown = sorted(set(th) - set(classes))
        if unknown:
            raise SystemExit(
                f"--thresholds names classes the model doesn't serve: "
                f"{unknown[:5]}{'...' if len(unknown) > 5 else ''}")
        # _resolve_classes permits a labels file LONGER than the model's
        # output; the threshold vector must match the SCORE width, so
        # truncate to the classes the model actually emits.
        served = classes[: cfg.num_classes] if cfg.num_classes else classes
        score_threshold = np.array(
            [float(th.get(c, args.score_threshold)) for c in served],
            np.float32)

    if args.int16_io and args.ulaw_io:
        raise SystemExit("--int16_io and --ulaw_io are mutually exclusive")
    serve_loop(runner, cfg, classes, audio_dir, results_file,
               poll_interval=args.poll_interval, batch_size=args.batch_size,
               top_k=args.top_k, score_threshold=score_threshold,
               overlap=args.chunk_overlap,
               device_resample=args.device_resample, once=args.once,
               decode_threads=args.decode_threads, int16_io=args.int16_io,
               ulaw_io=args.ulaw_io)
    return 0


if __name__ == "__main__":
    from birdnet_stm32_tpu.__main__ import _enable_compilation_cache

    _enable_compilation_cache()
    raise SystemExit(main())
