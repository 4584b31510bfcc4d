"""JAX-free worker half of the input pipeline.

Lives in its own module so pool workers can be started with the `spawn`
context (safe with a multithreaded JAX parent — fork after JAX init risks
deadlock) without re-importing JAX: this module's import graph is
numpy/scipy/audio only.
"""

from __future__ import annotations

import signal
from dataclasses import dataclass

import numpy as np

from birdnet_stm32_tpu.audio.activity import smart_crop, sort_by_activity
from birdnet_stm32_tpu.audio.io import (
    chunk_starts,
    estimate_num_chunks,
    load_audio_window,
    load_window_int16,
    split_audio_into_chunks,
)


@dataclass
class LoaderConfig:
    """Picklable worker configuration (generator.py:302-324 analog)."""

    sample_rate: int = 24000
    chunk_duration: float = 3.0
    num_classes: int = 0
    max_chunks_per_file: int = 2
    candidate_chunks_per_file: int | None = None
    # Activity-ratio threshold applied to WAVEFORM chunks. The reference's
    # 0.25 (generator.py) is measured on spectrogram features, where ratios
    # run systematically higher; 0.1 keeps comparable selectivity here.
    snr_threshold: float = 0.1
    random_offset: bool = True
    load_duration: float | None = 30.0
    seed: int = 0
    # Decoded-waveform cache directory (audio/io.cached_waveform): epoch 1
    # decodes + resamples each file once into an .npy; later epochs serve
    # their random-offset windows as memmap slices. None = decode per epoch
    # (reference behavior).
    cache_dir: str | None = None
    # Ship chunks as int16 rows [T+1] (codes + scale column) instead of
    # float32 [T] — HALF the host->device bytes per train step, dequantized
    # on device by the batcher (make_train_batcher(input_dtype='int16')).
    # Mono PCM16 WAVs at the model rate ship their RAW codes (device
    # reconstruction is BIT-EXACT vs the float path, models/serving.py);
    # everything else decodes to float and requantizes (~1 PCM16 LSB).
    ship_int16: bool = False
    # Ship chunks as 8-bit mu-law rows [T] int8 — QUARTER of the float32
    # bytes (half of int16), dequantized on device by the batcher
    # (make_train_batcher(input_dtype='ulaw')). Log companding keeps
    # ~2.2% RELATIVE waveform error at every amplitude (the right shape
    # for spectrogram features, which compress magnitudes anyway); the
    # accuracy ladder measures the training-quality cost (ACCURACY.json
    # float32_ulaw_feed row). Mutually exclusive with ship_int16.
    ship_ulaw: bool = False

    def resolved_candidates(self) -> int:
        if self.candidate_chunks_per_file is not None:
            return self.candidate_chunks_per_file
        return min(8, max(4, self.max_chunks_per_file * 2))


_ULAW_MU = 255.0
_ULAW_LOG1P_MU = float(np.log1p(_ULAW_MU))
_ULAW_SCALE = np.float32(127.0 / _ULAW_LOG1P_MU)


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float waveform -> int8 mu-law codes in [-127, 127]
    (mu = 255, the G.711 companding curve on a symmetric 8-bit grid).
    Inverse: models/serving._dequantize_ulaw (device) — round-trip error
    is <= half a companded step, ~2.2% relative at every amplitude.

    In-place magnitude pipeline (one allocation, rint + copysign instead
    of round + sign + two muls): bit-identical to the textbook
    sign*log1p(mu|x|)/log1p(mu) form, ~1.4x faster — the encode is the
    hot extra pass of the decode-bound ulaw loader. searchsorted against
    companding boundaries and a 32k magnitude LUT were both measured
    SLOWER than vectorized log1p on this host (9x and 2x)."""
    m = np.abs(x)
    np.minimum(m, np.float32(1.0), out=m)
    m *= np.float32(_ULAW_MU)
    np.log1p(m, out=m)
    m *= _ULAW_SCALE
    np.rint(m, out=m)
    return np.copysign(m, x).astype(np.int8)


def _ulaw_rows(rows):
    """[(chunk f32 [T], label)] -> [([T] int8 mu-law codes, label)]."""
    return [(ulaw_encode(x), lab) for x, lab in rows]


def _int16_row(codes: np.ndarray, T: int, scale: int) -> np.ndarray:
    """[<=T] int16 codes -> [T+1] row: zero-padded codes + scale column."""
    row = np.zeros(T + 1, np.int16)
    row[: codes.shape[0]] = codes
    row[T] = scale
    return row


def _select_from_raw_codes(path, cfg, rng, T):
    """Shared raw-PCM16 read + chunk selection for the compressed feeds:
    reads the window's RAW codes, reconstructs the float signal the float
    path would produce (c/32768, then peak-normalized — both steps
    reproduce numpy f32 semantics exactly) so chunk SELECTION matches the
    float feed, and returns (codes, y, starts, keep, peak) — or None when
    the file is ineligible (non-WAV/mono-PCM16-at-rate) and the caller
    must fall back to the float decode."""
    codes = load_window_int16(
        path, cfg.sample_rate, max_duration=cfg.load_duration,
        chunk_duration=cfg.chunk_duration, random_offset=cfg.random_offset,
        rng=rng)
    if codes is None or codes.size == 0:
        return None
    # int32 before abs: |int16 -32768| overflows back to -32768.
    peak = int(np.max(np.abs(codes.astype(np.int32))))
    y = codes.astype(np.float32) / 32768.0
    if peak > 0:
        y = y / (peak / 32768.0)
    n_candidates = cfg.resolved_candidates()
    if estimate_num_chunks(y.shape[0], cfg.sample_rate, cfg.chunk_duration) > n_candidates:
        fchunks, starts = smart_crop(y, cfg.sample_rate, cfg.chunk_duration,
                                     max_chunks=n_candidates, return_starts=True)
    else:
        fchunks = list(split_audio_into_chunks(y, cfg.sample_rate, cfg.chunk_duration))
        starts = ([-1] if y.shape[0] <= T
                  else chunk_starts(y.shape[0], cfg.sample_rate,
                                    cfg.chunk_duration).tolist())
    if not fchunks:
        return None
    keep = sort_by_activity(fchunks, threshold=cfg.snr_threshold,
                            return_indices=True)[: cfg.max_chunks_per_file]
    return codes, y, starts, keep, peak


def _process_file_int16_exact(path, label, cfg, rng, T):
    """Exact int16 shipping: select chunks on the float signal the float
    path would produce, then slice the RAW PCM codes at the same offsets.
    Returns None when the file is ineligible (caller falls back to the
    float decode + requantization)."""
    sel = _select_from_raw_codes(path, cfg, rng, T)
    if sel is None:
        return None
    codes, _, starts, keep, peak = sel
    scale = peak if peak < 32768 else -32768
    lab = label.astype(np.float32)
    out = []
    for i in keep:
        s = starts[i]
        c = codes[:T] if s < 0 else codes[s : s + T]
        out.append((_int16_row(c, T, scale), lab))
    return out


def _process_file_ulaw_fast(path, label, cfg, rng, T):
    """Fast mu-law shipping for PCM16-at-rate WAVs: the same raw-code read
    and chunk selection as the int16 exact path (identical chunks to the
    float feed), with each selected float chunk companded to int8. Skips
    the generic float decode pipeline: measured 464 vs the int16 path's
    523 chunks/s on the flagship corpus (the residual is the companding
    log1p itself) — the mu-law epoch is decode-bound on 1-core hosts, so
    loader rate IS epoch time there."""
    sel = _select_from_raw_codes(path, cfg, rng, T)
    if sel is None:
        return None
    _, y, starts, keep, _ = sel
    lab = label.astype(np.float32)
    out = []
    for i in keep:
        s = starts[i]
        c = y[:T] if s < 0 else y[s : s + T]
        if c.shape[0] < T:
            c = np.pad(c, (0, T - c.shape[0]))
        out.append((ulaw_encode(c), lab))
    return out


def _requantize_rows(rows, T):
    """Float fallback for int16 shipping: [(chunk f32 [T], label)] ->
    [([T+1] int16, label)], one PCM16 LSB of waveform error (the scale
    column carries 32767, models/serving.quantize_waveform_int16 semantics)."""
    out = []
    for x, lab in rows:
        codes = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        out.append((_int16_row(codes, T, 32767), lab))
    return out


def process_file(task: tuple[str, np.ndarray, LoaderConfig, int]):
    """Worker: one file -> list of (waveform chunk [T], label [C]);
    with cfg.ship_int16, chunks are [T+1] int16 rows, with cfg.ship_ulaw
    [T] int8 mu-law rows, instead.

    Failed loads return one random-noise chunk with an all-zero label.
    """
    path, label, cfg, salt = task
    if cfg.ship_int16 and cfg.ship_ulaw:
        raise ValueError("ship_int16 and ship_ulaw are mutually exclusive")
    rng = np.random.default_rng((cfg.seed + salt) & 0xFFFFFFFF)
    T = int(cfg.sample_rate * cfg.chunk_duration)
    if cfg.ship_int16:
        exact = _process_file_int16_exact(path, label, cfg, rng, T)
        if exact is not None:
            return exact
    if cfg.ship_ulaw:
        fast = _process_file_ulaw_fast(path, label, cfg, rng, T)
        if fast is not None:
            return fast
    try:
        audio = load_audio_window(
            path, sample_rate=cfg.sample_rate, max_duration=cfg.load_duration,
            chunk_duration=cfg.chunk_duration, random_offset=cfg.random_offset, rng=rng,
            cache_dir=cfg.cache_dir,
        )
    except Exception:
        # Effective reference parity: its load_audio_window also swallows
        # every exception to an empty array (io.py:129-130), so a corrupt
        # file becomes the empty->noise-chunk case there too (its
        # return-None except branch is unreachable in practice).
        audio = np.empty((0,), np.float32)

    if audio.size == 0:
        chunk = rng.uniform(-1.0, 1.0, T).astype(np.float32)
        # Zero label in the caller's actual width (cfg.num_classes may be
        # unset when the loader was built straight from a label matrix).
        width = np.asarray(label).shape[-1] if label is not None else cfg.num_classes
        noise = [(chunk, np.zeros(width, np.float32))]
        if cfg.ship_int16:
            return _requantize_rows(noise, T)
        return _ulaw_rows(noise) if cfg.ship_ulaw else noise

    n_candidates = cfg.resolved_candidates()
    if estimate_num_chunks(audio.shape[0], cfg.sample_rate, cfg.chunk_duration) > n_candidates:
        chunks = smart_crop(audio, cfg.sample_rate, cfg.chunk_duration, max_chunks=n_candidates)
    else:
        chunks = list(split_audio_into_chunks(audio, cfg.sample_rate, cfg.chunk_duration))
    if not chunks:
        return None

    # Activity-rank (keep at least one), take the top max_chunks
    # (audio/activity.py sort_by_activity, reference activity.py:217-233).
    selected = sort_by_activity(chunks, threshold=cfg.snr_threshold)[: cfg.max_chunks_per_file]

    out = []
    for c in selected:
        x = c[:T]
        if x.shape[0] < T:
            x = np.pad(x, (0, T - x.shape[0]))
        out.append((x.astype(np.float32), label.astype(np.float32)))
    if cfg.ship_int16:
        return _requantize_rows(out, T)
    return _ulaw_rows(out) if cfg.ship_ulaw else out


def process_files(tasks: list) -> list:
    """Batch worker entry: amortizes IPC/dispatch over several files."""
    out = []
    for task in tasks:
        result = process_file(task)
        if result:
            out.extend(result)
    return out


def worker_init():
    signal.signal(signal.SIGINT, signal.SIG_IGN)
