"""Sustained-throughput measurement protocol for tunneled TPU backends.

The single source of truth for how every benchmark in this repo times the
device (bench.py and scripts/bench_*.py all call this — training loops use
the carried-state variant below): the tunnel to the
TPU costs ~28 ms per blocking host read, and on this backend
``block_until_ready()`` can return before execution completes — the only
reliable sync is a device->host transfer. So we enqueue ``iters``
executions back-to-back (the device runs them in order) and read ONE
trailing scalar, which amortizes the fixed read latency and mirrors how a
real serving pipeline behaves (batches stream, the host rarely blocks).
"""

from __future__ import annotations

import time


def sustained_chunks_per_sec(fn, wave, iters: int = 20, reps: int = 3) -> float:
    """Best-of-``reps`` sustained chunks/sec for ``fn(wave) -> scalar``.

    ``fn`` must return a (device) scalar whose value depends on every
    output element, so nothing is dead-code-eliminated; ``wave`` is a
    [B, ...] batch. The first call warms up (compile + drain) outside the
    clock.
    """
    float(fn(wave))  # warmup/compile + drain
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(wave)
        float(out)  # sync: device executed all queued iterations in order
        best = max(best, iters * wave.shape[0] / (time.perf_counter() - t0))
    return best


def sustained_carried_chunks_per_sec(step, init_state, batch_size: int,
                                     iters: int = 20, reps: int = 3):
    """Best-of-``reps`` chunks/sec for STATE-CARRYING loops (training):
    ``step(state) -> (state, scalar)``. Same enqueue-many/read-one protocol
    as sustained_chunks_per_sec; the scalar read syncs the whole queue.

    Returns (chunks_per_sec, final_state).
    """
    state, s = step(init_state)  # warmup/compile + drain
    float(s)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, s = step(state)
        float(s)  # sync
        best = max(best, iters * batch_size / (time.perf_counter() - t0))
    return best, state
