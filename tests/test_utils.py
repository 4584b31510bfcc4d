"""Tests for utils/: the measurement protocol, PRNG threading, logging.

utils/benchmarking.py is the single source of truth for every throughput
number this repo reports (bench.py and all scripts/bench_*.py route
through it), so its enqueue-many/read-one contract is pinned here.
"""

import numpy as np

from birdnet_stm32_tpu.utils import benchmarking, logging as tlog, prng


class _CountingFn:
    """fn(wave) -> scalar; counts invocations like a jitted dispatch."""

    def __init__(self):
        self.calls = 0

    def __call__(self, wave):
        self.calls += 1
        return np.float32(wave.sum())


def test_sustained_chunks_per_sec_counts_and_scales():
    fn = _CountingFn()
    wave = np.ones((16, 8), np.float32)
    rate = benchmarking.sustained_chunks_per_sec(fn, wave, iters=5, reps=2)
    # 1 warmup + iters*reps measured dispatches, all enqueued.
    assert fn.calls == 1 + 5 * 2
    assert rate > 0
    # Rate is per CHUNK (batch rows), not per dispatch: a 2x larger batch
    # of the same per-call cost must report ~2x the rate.
    fn2 = _CountingFn()
    rate2 = benchmarking.sustained_chunks_per_sec(
        fn2, np.ones((32, 8), np.float32), iters=5, reps=2)
    assert rate2 > rate  # same (trivial) work, twice the chunks


def test_sustained_carried_threads_state():
    seen = []

    def step(state):
        seen.append(state)
        return state + 1, np.float32(state)

    rate, final = benchmarking.sustained_carried_chunks_per_sec(
        step, 0, batch_size=4, iters=3, reps=2)
    assert rate > 0
    # Warmup consumes state 0; each rep's 3 iterations carry it forward.
    assert final == 1 + 3 * 2
    assert seen == list(range(7))


def test_set_global_seed_reproducible():
    k1 = prng.set_global_seed(123)
    a1 = np.random.rand(4)
    k2 = prng.set_global_seed(123)
    a2 = np.random.rand(4)
    np.testing.assert_array_equal(a1, a2)
    import jax

    np.testing.assert_array_equal(jax.random.key_data(k1),
                                  jax.random.key_data(k2))


def test_key_stream_unique_and_deterministic():
    import jax

    s1, s2 = prng.KeyStream(7), prng.KeyStream(7)
    keys1 = [s1.next() for _ in range(4)]
    keys2 = [s2.next() for _ in range(4)]
    datas = [tuple(np.asarray(jax.random.key_data(k)).ravel()) for k in keys1]
    assert len(set(datas)) == 4  # collision-free
    for a, b in zip(keys1, keys2):  # same seed -> same stream
        np.testing.assert_array_equal(jax.random.key_data(a),
                                      jax.random.key_data(b))
    assert s1.next_n(3).shape[0] == 3
    # numpy integer seeds are accepted (worker configs pass np.int64).
    prng.KeyStream(np.int64(5)).next()


def test_log_tag_prefix_and_quiet(capsys, monkeypatch):
    monkeypatch.delenv("BIRDNET_TPU_QUIET", raising=False)
    tlog.log("bench", "hello")
    assert capsys.readouterr().out == "[bench] hello\n"
    tlog.warn("x", "careful")  # not a tty under capsys -> no ANSI codes
    assert capsys.readouterr().out == "[x] careful\n"
    monkeypatch.setenv("BIRDNET_TPU_QUIET", "1")
    tlog.error("x", "suppressed")
    assert capsys.readouterr().out == ""


def test_timer_measures_something():
    with tlog.Timer() as t:
        sum(range(1000))
    assert t.ms >= 0
