"""Evaluation: batched chunk inference, pooling, classification metrics.

Metric definitions match reference evaluation/metrics.py:155-375 — micro
ROC-AUC, precision/recall/F1 at 0.5 (micro counts), per-class AP, cmAP
(macro mean of valid APs), micro mAP, per-class F1-optimal thresholds from
the PR curve, bootstrap AP confidence intervals, and the DET curve.

The inference loop is TPU-first: every file's chunks join one flat batch
stream (uniform padded batches, one fused device dispatch per batch —
models/serving.py) instead of the reference's file-at-a-time loop;
chunk->file pooling runs on host over the small per-file score arrays
(pooling.segment_pool offers the device-side variant).
"""

from __future__ import annotations

import math
import resource
import time
from pathlib import Path

import numpy as np

from birdnet_stm32_tpu.audio.io import load_audio_file
from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.evaluation.pooling import pool_scores


def chunks_for_file(path: str, cfg: ModelConfig, overlap: float = 0.0,
                    max_duration: float = 60.0,
                    sample_rate: int | None = None,
                    cache_dir: str | None = None) -> np.ndarray:
    """[n_chunks, T] waveform chunks for one file (metrics.py:18-72 analog;
    feature extraction happens later, batched on device).

    `sample_rate` overrides cfg.sample_rate for device-resample serving:
    chunks come back at the file's native rate (T = chunk_duration * rate)
    and the classifier resamples on device (ops/resample.py).
    """
    return load_audio_file(
        path, sample_rate=sample_rate or cfg.sample_rate,
        max_duration=max_duration,
        chunk_duration=cfg.chunk_duration, chunk_overlap=overlap,
        random_offset=False, cache_dir=cache_dir,
    )


def evaluate(
    runner,
    files: list[str],
    classes: list[str],
    cfg: ModelConfig,
    pooling: str = "average",
    batch_size: int = 64,
    overlap: float = 0.0,
    mep_beta: float = 10.0,
    measure_latency: bool = False,
    profile_memory: bool = False,
    label_fn=None,
    decode_workers: int = 0,
    max_duration: float = 60.0,
    cache_dir: str | None = None,
    int16_io: bool = False,
    ulaw_io: bool = False,
) -> tuple[dict, list[dict], np.ndarray, np.ndarray]:
    """Per-chunk inference -> pooled file scores -> metrics.

    Args:
        runner: predict(model_inputs) -> scores.
        files: Audio file paths (class = parent folder name by default).
        classes: Ordered class names.
        cfg: Model config (drives chunking + frontend).
        pooling: 'avg' | 'max' | 'lme'.
        batch_size: Chunk batch size for inference.
        overlap: Chunk overlap seconds.
        mep_beta: LME temperature.
        measure_latency: Record per-chunk latency stats.
        profile_memory: Record peak-RSS stats.
        label_fn: Optional path -> class-name override.
        decode_workers: >0 prefetches file decode on that many threads,
            overlapping host decode with device inference (chunk batching
            and results are unchanged).
        max_duration: Per-file decode cap in seconds (reference
            metrics.py:45 hardcodes 60).
        int16_io: Ship waveforms to the device as int16 codes + scale
            column (models/serving.py): raw PCM codes (bit-exact) for
            mono PCM16 WAVs at the model rate, requantized (one LSB)
            otherwise — the production bulk-serving transfer mode.
        ulaw_io: Ship waveforms as int8 mu-law codes (quarter-bandwidth,
            companded — NOT bit-exact; this flag exists so the fidelity
            cost is measurable with the full metrics stack).

    Returns:
        (metrics dict, per_file list, y_true [N,C], y_scores [N,C]).
    """
    from sklearn.metrics import average_precision_score, roc_auc_score

    label_fn = label_fn or (lambda p: Path(p).parent.name)
    num_classes = len(classes)
    class_idx = {c: i for i, c in enumerate(classes)}

    rss_before_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss if profile_memory else 0
    latencies: list[float] = []
    total_chunks = 0

    y_true, y_scores, per_file = [], [], []
    pending_chunks: list[np.ndarray] = []
    pending_meta: list[int] = []  # file index per chunk
    file_records: list[tuple[str, str, np.ndarray]] = []  # (path, label, target)
    chunk_scores_per_file: dict[int, list[np.ndarray]] = {}

    from birdnet_stm32_tpu.models.serving import (
        chunks_for_classify_int16,
        make_fused_classifier,
    )

    if int16_io and ulaw_io:
        raise ValueError("int16_io and ulaw_io are mutually exclusive")
    classify = make_fused_classifier(
        runner, cfg,
        input_dtype="int16" if int16_io else ("ulaw" if ulaw_io else None))
    if int16_io:
        def _chunks(path, cfg, overlap, max_duration, _rate, cache_dir):
            return chunks_for_classify_int16(
                path, cfg, overlap, max_duration=max_duration,
                cache_dir=cache_dir)
    elif ulaw_io:
        from birdnet_stm32_tpu.models.serving import quantize_waveform_ulaw

        def _chunks(path, cfg, overlap, max_duration, _rate, cache_dir):
            return quantize_waveform_ulaw(chunks_for_file(
                path, cfg, overlap, max_duration=max_duration,
                cache_dir=cache_dir))
    else:
        _chunks = chunks_for_file
    warmed = False

    def flush(force=False):
        nonlocal warmed
        nonlocal total_chunks
        while pending_chunks and (force or len(pending_chunks) >= batch_size):
            take = pending_chunks[:batch_size]
            meta = pending_meta[:batch_size]
            del pending_chunks[:batch_size], pending_meta[:batch_size]
            wave = np.stack(take)
            # Pad to the fixed batch size: one compiled shape for all files.
            if wave.shape[0] < batch_size:
                wave = np.pad(wave, ((0, batch_size - wave.shape[0]), (0, 0)))
            if measure_latency and not warmed:
                classify(wave)  # exclude XLA compile time from latency stats
            warmed = True
            t0 = time.perf_counter()
            scores = classify(wave)[: len(take)]
            if measure_latency:
                # Divide by the rows the device actually computed (the
                # padded batch), not len(take): a 1-chunk tail padded to
                # batch_size would otherwise report batch_size times the
                # true per-chunk latency and corrupt the percentiles.
                per_chunk_ms = (time.perf_counter() - t0) * 1000.0 / wave.shape[0]
                latencies.extend([per_chunk_ms] * len(take))
            total_chunks += len(take)
            for fi, s in zip(meta, scores):
                chunk_scores_per_file.setdefault(fi, []).append(s)

    labeled = [(p, label_fn(p)) for p in files]
    labeled = [(p, lb) for p, lb in labeled if lb in class_idx]

    def consume(path, label, chunks):
        if chunks.shape[0] == 0:
            return
        target = np.zeros(num_classes, np.float32)
        target[class_idx[label]] = 1.0
        fi = len(file_records)
        file_records.append((path, label, target))
        for c in chunks:
            pending_chunks.append(c)
            pending_meta.append(fi)
        flush()

    if decode_workers > 0:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=decode_workers) as ex:
            # Bounded decode-ahead window (RAM-safe on large test sets).
            window = max(2 * decode_workers, 4)
            futs = deque(
                (p, lb, ex.submit(_chunks, p, cfg, overlap, max_duration, None, cache_dir))
                for p, lb in labeled[:window])
            nxt = window
            while futs:
                path, label, fut = futs.popleft()
                if nxt < len(labeled):
                    p, lb = labeled[nxt]
                    futs.append((p, lb, ex.submit(
                        _chunks, p, cfg, overlap, max_duration, None, cache_dir)))
                    nxt += 1
                consume(path, label, fut.result())
    else:
        for path, label in labeled:
            consume(path, label,
                    _chunks(path, cfg, overlap, max_duration, None, cache_dir))
    flush(force=True)

    for fi, (path, label, target) in enumerate(file_records):
        scores = np.stack(chunk_scores_per_file.get(fi, [np.zeros(num_classes, np.float32)]))
        pooled = pool_scores(scores, method=pooling, beta=mep_beta)
        y_true.append(target)
        y_scores.append(pooled)
        per_file.append({"file": path, "label": label, "scores": pooled.tolist()})

    if not y_true:
        raise RuntimeError("No valid test samples found for the provided class set.")
    y_true_arr = np.asarray(y_true, np.float32)
    y_scores_arr = np.asarray(y_scores, np.float32)

    metrics: dict = {}
    try:
        metrics["roc-auc"] = float(roc_auc_score(y_true_arr, y_scores_arr, average="micro"))
    except Exception:
        metrics["roc-auc"] = float("nan")

    y_pred = (y_scores_arr >= 0.5).astype(np.float32)
    tp = float(np.sum(y_true_arr * y_pred))
    fp = float(np.sum((1 - y_true_arr) * y_pred))
    fn = float(np.sum(y_true_arr * (1 - y_pred)))
    precision = tp / (tp + fp + 1e-12)
    recall = tp / (tp + fn + 1e-12)
    metrics["precision"] = precision
    metrics["recall"] = recall
    metrics["f1"] = float(2 * precision * recall / (precision + recall)) if precision + recall > 0 else 0.0

    ap_per_class = []
    for ci in range(num_classes):
        try:
            ap = average_precision_score(y_true_arr[:, ci], y_scores_arr[:, ci])
        except Exception:
            ap = float("nan")
        ap_per_class.append(ap)
    valid = [a for a in ap_per_class if not (isinstance(a, float) and math.isnan(a))]
    metrics["ap_per_class"] = ap_per_class
    metrics["cmAP"] = float(np.mean(valid)) if valid else float("nan")
    try:
        metrics["mAP"] = float(average_precision_score(y_true_arr, y_scores_arr, average="micro"))
    except Exception:
        metrics["mAP"] = float("nan")

    metrics["total_chunks"] = total_chunks
    if measure_latency and latencies:
        lat = np.asarray(latencies)
        metrics["latency_mean_ms"] = float(lat.mean())
        metrics["latency_median_ms"] = float(np.median(lat))
        metrics["latency_p95_ms"] = float(np.percentile(lat, 95))
        metrics["latency_p99_ms"] = float(np.percentile(lat, 99))
        # Every timed batch blocks on ONE host read, so the stats above
        # include a per-batch transport constant (~28 ms on tunneled
        # backends, ~0 on-host). Measure it directly with tiny round
        # trips and report a device-time estimate; without this the
        # percentiles read as device latency when they are mostly
        # transport on a tunnel (docs/troubleshooting.md).
        try:
            import jax
            import jax.numpy as jnp

            tiny = jax.jit(lambda x: x + 1.0)
            np.asarray(tiny(jnp.zeros((), jnp.float32)))  # compile
            reads = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(tiny(jnp.zeros((), jnp.float32)))
                reads.append((time.perf_counter() - t0) * 1000.0)
            floor_ms = float(np.median(reads))
            metrics["blocking_read_floor_ms"] = floor_ms
            metrics["latency_mean_device_est_ms"] = max(
                0.0, metrics["latency_mean_ms"] - floor_ms / batch_size)
            metrics["latency_note"] = (
                f"per-chunk stats include a {floor_ms:.1f} ms blocking "
                f"host-read floor per {batch_size}-chunk batch; "
                "latency_mean_device_est_ms subtracts it. For transport-"
                "free throughput use the enqueue-many protocol "
                "(bench.py / benchmark --pipeline).")
        except Exception:  # noqa: BLE001 — the caveat is best-effort
            pass
    if profile_memory:
        rss_after_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        metrics["peak_rss_mb"] = round(rss_after_kb / 1024, 1)
        metrics["rss_delta_mb"] = round((rss_after_kb - rss_before_kb) / 1024, 1)

    return metrics, per_file, y_true_arr, y_scores_arr


def optimize_thresholds(y_true: np.ndarray, y_scores: np.ndarray, classes: list[str]) -> dict[str, float]:
    """Per-class F1-optimal thresholds from the PR curve (metrics.py:210-237)."""
    from sklearn.metrics import precision_recall_curve

    optimal: dict[str, float] = {}
    for ci, name in enumerate(classes):
        col_true, col_scores = y_true[:, ci], y_scores[:, ci]
        if col_true.sum() == 0:
            optimal[name] = 0.5
            continue
        prec, rec, thresholds = precision_recall_curve(col_true, col_scores)
        f1 = 2 * prec[:-1] * rec[:-1] / (prec[:-1] + rec[:-1] + 1e-12)
        optimal[name] = float(thresholds[int(np.argmax(f1))])
    return optimal


def metrics_at_thresholds(
    y_true: np.ndarray,
    y_scores: np.ndarray,
    thresholds: dict[str, float],
    classes: list[str],
) -> dict[str, float]:
    """Micro precision/recall/F1 at per-class thresholds — the operating
    point AFTER optimize_thresholds, computed exactly like evaluate()'s
    default-0.5 row so the two are comparable (the reference applies its
    optimized thresholds the same way, cli/evaluate.py there)."""
    thr = np.asarray([thresholds.get(c, 0.5) for c in classes], np.float32)[None, :]
    y_pred = (y_scores >= thr).astype(np.float32)
    tp = float(np.sum(y_true * y_pred))
    fp = float(np.sum((1 - y_true) * y_pred))
    fn = float(np.sum(y_true * (1 - y_pred)))
    precision = tp / (tp + fp + 1e-12)
    recall = tp / (tp + fn + 1e-12)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return {"precision": precision, "recall": recall, "f1": float(f1)}


def bootstrap_ap_ci(
    y_true: np.ndarray,
    y_scores: np.ndarray,
    classes: list[str],
    n_bootstrap: int = 1000,
    confidence: float = 0.95,
    seed: int = 42,
) -> list[dict]:
    """Per-class AP with bootstrap CIs, degenerate-class handling
    (metrics.py:240-322). The bootstrap is vectorized: all resample indices
    are drawn at once and AP evaluated per resample."""
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(seed)
    n = y_true.shape[0]
    alpha = (1 - confidence) / 2
    results = []
    for ci, name in enumerate(classes):
        col_true, col_scores = y_true[:, ci], y_scores[:, ci]
        n_pos = int(col_true.sum())
        try:
            ap = float(average_precision_score(col_true, col_scores))
        except Exception:
            ap = float("nan")
        if n_pos == 0 or n_pos == n:
            results.append({"class": name, "ap": ap, "ci_lower": ap, "ci_upper": ap,
                            "n_positive": n_pos, "n_total": n})
            continue
        idx = rng.integers(0, n, size=(n_bootstrap, n))
        boot = []
        for row in idx:
            bt = col_true[row]
            s = bt.sum()
            if s == 0 or s == len(bt):
                continue
            boot.append(float(average_precision_score(bt, col_scores[row])))
        lo = float(np.percentile(boot, 100 * alpha)) if boot else ap
        hi = float(np.percentile(boot, 100 * (1 - alpha))) if boot else ap
        results.append({"class": name, "ap": ap, "ci_lower": lo, "ci_upper": hi,
                        "n_positive": n_pos, "n_total": n})
    return results


def compute_det_curve(y_true: np.ndarray, y_scores: np.ndarray):
    """DET curve: FAR vs FRR over unique thresholds (metrics.py:325-375),
    computed with cumulative sums instead of a per-threshold pass."""
    y_t = y_true.ravel().astype(np.float64)
    y_s = y_scores.ravel().astype(np.float64)
    total_pos = y_t.sum()
    total_neg = len(y_t) - total_pos
    if total_pos == 0 or total_neg == 0:
        return np.array([0.0]), np.array([0.0]), np.array([0.5])

    order = np.argsort(-y_s)
    sorted_scores = y_s[order]
    sorted_true = y_t[order]
    cum_tp = np.cumsum(sorted_true)
    cum_fp = np.cumsum(1 - sorted_true)
    # last index of each unique threshold in descending order
    uniq_mask = np.append(sorted_scores[1:] != sorted_scores[:-1], True)
    thr = sorted_scores[uniq_mask]
    tp = cum_tp[uniq_mask]
    fp = cum_fp[uniq_mask]
    far = fp / total_neg
    frr = (total_pos - tp) / total_pos
    return far, frr, thr
