"""Host-parallel input pipeline feeding device-side feature computation.

Re-design of reference data/generator.py:29-421. The reference's workers do
decode -> resample -> smart-crop -> **librosa spectrogram -> SpecAugment**
and ship pickled features; mixup then runs per-batch in numpy behind a
tf.py_function. On TPU the feature computation belongs on the device (one
fused jitted STFT->mel->scale over the whole batch, see ops/), so workers
here stop at **waveform chunks**:

    worker:  decode WAV -> resample -> peak-norm -> smart-crop/split ->
             activity-rank -> top-K waveform chunks
    host:    shuffled reservoir with bounded in-flight dispatch
    device:  waveform batch -> frontend features -> SpecAugment -> mixup
             (make_train_batcher, all inside one jit)

Kept reference behaviors: crash-tolerant loads (failed decode = random-noise
chunk with all-zero label, generator.py:101-103), candidate smart-crop
policy (generator.py:106-110), activity sort with keep-at-least-one, bounded
in-flight windows with a live `loader_control` dict (generator.py:359-372),
SIGINT-ignoring workers with periodic recycling (maxtasksperchild=10_000
here — spawn re-import costs seconds, see the pool setup), reservoir
shuffling, and
infinite epochs.
"""

from __future__ import annotations

import multiprocessing as mp
import time
from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.data.augment import apply_mixup, apply_spec_augment
from birdnet_stm32_tpu.data.worker import LoaderConfig, process_file, process_files, worker_init
from birdnet_stm32_tpu.ops.frontend import waveform_to_input

__all__ = ["AudioLoader", "LoaderConfig", "process_file", "make_train_batcher"]


@dataclass(eq=False)  # ndarray field: synthesized __eq__ would raise
class AudioLoader:
    """Shuffled-reservoir batch iterator over a thread/process worker pool.

    Yields (waveform [B, T] float32, labels [B, C] float32) numpy batches.
    """

    paths: list[str]
    labels: np.ndarray  # [N, C]
    cfg: LoaderConfig
    batch_size: int = 32
    num_workers: int = 4
    shuffle: bool = True
    infinite: bool = True
    reservoir_size: int = 1024
    loader_control: dict = field(default_factory=lambda: {"max_inflight_files": 64})
    # Multi-host sharding: each host iterates a disjoint slice of the file
    # list (SURVEY.md section 5.8 -- input pipeline sharded per host, DCN-free).
    shard_index: int = 0
    num_shards: int = 1
    worker_timeout: float = 120.0  # seconds without any result -> RuntimeError
    files_per_task: int = 8        # files per pool task (amortizes dispatch)
    # 'thread' (default): in-process ThreadPoolExecutor — the decode hot loop
    # is native C (GIL released), and skipping result pickling is ~3x faster
    # than the process pool (1250 vs 420 chunks/s on 3-s/22kHz files).
    # 'process': spawn pool, for pure-python decode paths that hold the GIL.
    executor: str = "thread"

    def __post_init__(self):
        assert len(self.paths) == len(self.labels)
        if self.labels.ndim != 2:
            raise ValueError(f"labels must be [N, C], got {self.labels.shape}")
        if self.cfg.num_classes == 0:
            self.cfg.num_classes = int(self.labels.shape[1])
        elif self.labels.shape[1] != self.cfg.num_classes:
            raise ValueError(
                f"labels shape {self.labels.shape} does not match "
                f"LoaderConfig.num_classes={self.cfg.num_classes} — the noise "
                "fallback would emit mismatched label widths")
        self._rng = np.random.default_rng(self.cfg.seed)

    def estimate_samples_per_epoch(self) -> int:
        """Files x avg chunks estimate (reference generator.py:178-186:
        short files yield 1 chunk, long ones up to max_chunks_per_file, so
        avg (1 + max)/2), per shard in multi-host runs."""
        n = -(-len(self.paths) // self.num_shards)  # ceil per-shard files
        return max(1, int(n * (1 + self.cfg.max_chunks_per_file) / 2.0))

    def _iter_threads(self, tasks, reservoir, low_mark, drain_ready, drain_tail):
        from collections import deque
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

        ex = ThreadPoolExecutor(self.num_workers)
        try:
            pending: deque = deque()
            exhausted = False
            while True:
                max_inflight = int(self.loader_control.get("max_inflight_files", 64))
                while not exhausted and len(pending) < max_inflight:
                    try:
                        pending.append(ex.submit(process_file, next(tasks)))
                    except StopIteration:
                        exhausted = True
                if not pending:
                    if exhausted:
                        break
                    time.sleep(0.05)  # paused via loader_control inflight=0
                    continue
                if self.shuffle:
                    done, _ = wait(set(pending), timeout=self.worker_timeout,
                                   return_when=FIRST_COMPLETED)
                    if not done:
                        raise RuntimeError(
                            f"no loader progress for {self.worker_timeout:.0f}s")
                    pending = deque(f for f in pending if f not in done)
                    for f in done:
                        result = f.result()
                        if result:
                            reservoir.extend(result)
                else:
                    # Deterministic FIFO (validation loaders): consume in
                    # SUBMISSION order, not completion order, so batch
                    # composition doesn't depend on thread timing.
                    done, _ = wait({pending[0]}, timeout=self.worker_timeout)
                    if not done:
                        raise RuntimeError(
                            f"no loader progress for {self.worker_timeout:.0f}s")
                    while pending and pending[0].done():
                        result = pending.popleft().result()
                        if result:
                            reservoir.extend(result)
                yield from drain_ready(low_mark)
            yield from drain_tail()
        finally:
            # Abandoned mid-iteration (GeneratorExit): drop queued decodes
            # instead of running them all to completion.
            ex.shutdown(wait=False, cancel_futures=True)

    def __iter__(self):
        reservoir: list[tuple[np.ndarray, np.ndarray]] = []
        # Drain down to half the reservoir: the shuffle window really is
        # ~reservoir_size/2 items (the previous 4*batch cap made the knob a
        # no-op beyond 8 batches).
        low_mark = max(self.batch_size * 2, self.reservoir_size // 2)

        def task_stream():
            epoch = 0
            while True:
                order = np.arange(len(self.paths))
                if self.shuffle:
                    # Epoch-keyed RNG, independent of the reservoir RNG: all
                    # hosts derive the SAME permutation each epoch (the
                    # reservoir rng advances a data-dependent number of times
                    # per host, so sharing it would de-synchronize shards).
                    np.random.default_rng((self.cfg.seed, epoch)).shuffle(order)
                if self.num_shards > 1:
                    order = order[self.shard_index :: self.num_shards]
                for i in order:
                    yield (self.paths[i], self.labels[i], self.cfg, epoch * len(self.paths) + int(i))
                epoch += 1
                if not self.infinite:
                    return

        def drain_batch():
            if self.shuffle:
                idx = self._rng.permutation(len(reservoir))[: self.batch_size]
                idx_set = set(idx.tolist())
                batch = [reservoir[i] for i in idx]
                remaining = [s for i, s in enumerate(reservoir) if i not in idx_set]
                reservoir.clear()
                reservoir.extend(remaining)
            else:
                # Deterministic FIFO for validation loaders: batch
                # composition must not depend on RNG state or worker
                # completion order.
                batch = reservoir[: self.batch_size]
                del reservoir[: self.batch_size]
            x = np.stack([b[0] for b in batch])
            y = np.stack([b[1] for b in batch])
            return x, y

        def drain_ready(min_size):
            while len(reservoir) >= max(min_size, self.batch_size):
                yield drain_batch()

        def drain_tail():
            yield from drain_ready(self.batch_size)
            if reservoir and not self.infinite:
                yield drain_batch()  # final partial batch

        tasks = task_stream()
        if self.executor == "thread" and self.num_workers > 0:
            yield from self._iter_threads(tasks, reservoir, low_mark,
                                          drain_ready, drain_tail)
            return
        if self.num_workers <= 0:
            # Single-process fallback (generator.py single-process path).
            for task in tasks:
                result = process_file(task)
                if result:
                    reservoir.extend(result)
                yield from drain_ready(low_mark)
            yield from drain_tail()
            return

        # Spawn, not fork: the parent runs a multithreaded JAX runtime and
        # forking it risks deadlock. Workers import only the JAX-free
        # data.worker module graph (numpy/scipy), so spawn startup is cheap.
        # Spawn, and recycle workers rarely: each respawn re-imports
        # numpy/scipy (~seconds). The reference's maxtasksperchild=100 was
        # tuned for cheap fork respawns.
        ctx = mp.get_context("spawn")
        group: list = []

        def grouped_tasks():
            nonlocal group
            for task in tasks:
                group.append(task)
                if len(group) >= self.files_per_task:
                    yield group
                    group = []
            if group:
                yield group

        gtasks = grouped_tasks()
        with ctx.Pool(self.num_workers, initializer=worker_init,
                      maxtasksperchild=10_000) as pool:
            try:
                pending = []
                exhausted = False
                last_progress = time.monotonic()
                while True:
                    max_inflight = int(self.loader_control.get("max_inflight_files", 64))
                    while (not exhausted
                           and len(pending) * self.files_per_task < max_inflight):
                        try:
                            pending.append(pool.apply_async(process_files, (next(gtasks),)))
                        except StopIteration:
                            exhausted = True
                    if not pending:
                        if exhausted:
                            break
                        time.sleep(0.05)  # paused via loader_control inflight=0
                        # A deliberate pause is not worker death: keep the
                        # watchdog clock fresh so resuming after a long pause
                        # doesn't trip the timeout below.
                        last_progress = time.monotonic()
                        continue
                    done, still = [], []
                    if self.shuffle:
                        for p in pending:
                            (done if p.ready() else still).append(p)
                    else:
                        # Deterministic loaders (validation) consume in
                        # SUBMISSION order, not completion order — same
                        # invariant as the thread executor path — so batch
                        # composition doesn't vary with worker timing.
                        while pending and pending[0].ready():
                            done.append(pending.pop(0))
                        still = pending
                    if not done:
                        pending[0].wait(0.05)
                        # Liveness watchdog: if workers die during bootstrap
                        # (e.g. spawn cannot re-import __main__), apply_async
                        # results never become ready — fail loudly instead of
                        # spinning forever.
                        if time.monotonic() - last_progress > self.worker_timeout:
                            raise RuntimeError(
                                f"no loader progress for {self.worker_timeout:.0f}s — "
                                "worker processes appear dead (spawn requires an "
                                "importable __main__; run from a file/module, not stdin)")
                        continue
                    pending = still
                    for p in done:
                        result = p.get()
                        if result:
                            reservoir.extend(result)
                    yield from drain_ready(low_mark)
                    # Reset AFTER yielding: time parked at a yield (e.g. the
                    # epoch-end validation sweep) must not count toward the
                    # worker-dead watchdog.
                    last_progress = time.monotonic()
                yield from drain_tail()
            finally:
                pool.terminate()


def make_train_batcher(
    cfg: ModelConfig,
    spec_augment: bool = True,
    mixup_alpha: float = 0.2,
    mixup_probability: float = 0.25,
    label_smoothing: float = 0.0,
    freq_mask_max: int = 8,
    time_mask_max: int = 25,
    stft_precision: str = "highest",
    feature_dtype=None,
    input_dtype: str | None = None,
):
    """Jitted device transform: waveform batch -> (model inputs, labels).

    Fuses frontend feature extraction, SpecAugment, and Dirichlet mixup into
    one XLA computation (replaces the reference's worker-side librosa +
    tf.py_function mixup, generator.py:115-175 + 397-421).

    stft_precision: 'high' halves the frontend DFT matmul cost (~1e-6
    relative error — irrelevant for training); mixed-precision training
    uses it by default via the CLI.
    feature_dtype: jnp.bfloat16 runs the frontend through the bf16-I/O
    STFT (ops/stft.py — half the intermediate HBM traffic) and hands the
    train step bf16 features directly, skipping its input cast;
    mixed-precision training uses it by default via the CLI. Augmentation
    mask/mix math stays f32 and rounds once at the output.
    input_dtype: 'int16' accepts [B, T+1] code+scale rows from a
    ship_int16 loader (half the host->device bytes) and dequantizes on
    device with the correctly-rounded division of models/serving before
    the frontend — bit-exact vs the float32 feed for PCM16 sources.
    'ulaw' accepts [B, T] int8 mu-law rows from a ship_ulaw loader
    (QUARTER of the float32 bytes, ~2.2% relative waveform error —
    fidelity measured by the accuracy ladder's float32_ulaw_feed row).
    """
    if input_dtype not in (None, "float32", "int16", "ulaw"):
        raise ValueError(
            f"input_dtype must be None|'float32'|'int16'|'ulaw', got {input_dtype!r}")
    dequantize = None
    if input_dtype == "int16":
        from birdnet_stm32_tpu.models.serving import _dequantize_int16

        dequantize = _dequantize_int16
    elif input_dtype == "ulaw":
        from birdnet_stm32_tpu.models.serving import _dequantize_ulaw

        dequantize = _dequantize_ulaw

    @partial(jax.jit)
    def batcher(key, wave, labels):
        if dequantize is not None:
            wave = dequantize(wave)
        x = waveform_to_input(
            wave,
            audio_frontend=cfg.audio_frontend,
            sample_rate=cfg.sample_rate,
            n_fft=cfg.fft_length,
            mel_bins=cfg.num_mels,
            spec_width=cfg.spec_width,
            mag_scale=cfg.mag_scale,
            n_mfcc=cfg.n_mfcc,
            chunk_samples=cfg.chunk_samples,
            stft_precision=stft_precision,
            feature_dtype=feature_dtype,
        )
        k1, k2 = jax.random.split(key)
        if spec_augment and cfg.audio_frontend != "raw":
            x = apply_spec_augment(k1, x, freq_mask_max=freq_mask_max, time_mask_max=time_mask_max)
        x, labels = apply_mixup(
            k2, x, labels, alpha=mixup_alpha, probability=mixup_probability,
            label_smoothing=label_smoothing,
        )
        if feature_dtype is not None:
            # Mixup's f32 mixing weights promote x; round back once (XLA
            # fuses the whole augment+cast chain into the single output
            # materialization).
            x = x.astype(feature_dtype)
        return x, labels

    return batcher
