"""Property-based tests (hypothesis) over the numerical core.

The reference's suite is example-based (SURVEY.md §4); these tests state the
*invariants* those examples sample — chunking coverage, pooling bounds,
similarity-metric axioms, quantization error bounds — and let hypothesis
search the input space for violations. Each property cites the reference
behavior it pins (file:line of /root/reference).
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from birdnet_stm32_tpu.audio.io import (
    estimate_num_chunks,
    fast_resample,
    load_audio_window,
    save_wav,
    split_audio_into_chunks,
)
from birdnet_stm32_tpu.evaluation.pooling import lme_pooling, pool_scores
from birdnet_stm32_tpu.models.blocks import make_divisible
from birdnet_stm32_tpu.quant.validate import cosine_similarity, pearson_correlation

# A single profile for every test in this module: numerical properties are
# cheap, so a wider search than the default is affordable.
common = settings(max_examples=200, deadline=None)


# ---------------------------------------------------------------------------
# Chunking (reference audio/io.py:133-174 semantics)
# ---------------------------------------------------------------------------

chunk_params = st.tuples(
    st.integers(min_value=0, max_value=40_000),          # num samples
    st.sampled_from([8000, 16000, 22050, 24000, 48000]),  # sample rate
    st.floats(min_value=0.2, max_value=4.0),              # chunk duration (s)
    st.floats(min_value=0.0, max_value=5.0),              # overlap (s)
)


@common
@given(chunk_params)
def test_chunking_covers_every_sample(params):
    """Every input sample appears in some chunk; chunks are exact slices
    (reference io.py:133-174: contiguous steps + shifted tail chunk)."""
    n, sr, dur, overlap = params
    y = np.arange(1, n + 1, dtype=np.float32)  # 1-based so 0 == padding
    chunks = split_audio_into_chunks(y, sr, dur, overlap)
    chunk_size = int(sr * dur)
    if n == 0:
        assert chunks.shape[0] == 0
        return
    assert chunks.shape[1] == chunk_size
    covered = set()
    for c in chunks:
        vals = c[c > 0].astype(np.int64)
        if vals.size:
            # each chunk is one contiguous slice of the input
            assert np.array_equal(vals, np.arange(vals[0], vals[0] + vals.size))
        covered.update(vals.tolist())
    assert covered == set(range(1, n + 1))


@common
@given(chunk_params)
def test_chunk_count_estimator_matches_chunker(params):
    """estimate_num_chunks agrees with what split_audio_into_chunks emits
    for ALL inputs (reference io.py:33-60 vs io.py:133-174)."""
    n, sr, dur, overlap = params
    y = np.zeros(n, np.float32)
    got = split_audio_into_chunks(y, sr, dur, overlap).shape[0]
    assert estimate_num_chunks(n, sr, dur, overlap) == got


@common
@given(chunk_params)
def test_tail_chunk_reaches_end(params):
    """The last chunk always ends exactly at the last input sample when the
    input is longer than one chunk (the shifted-tail rule, io.py:160-166)."""
    n, sr, dur, overlap = params
    chunk_size = int(sr * dur)
    if n <= chunk_size:
        return
    y = np.arange(1, n + 1, dtype=np.float32)
    chunks = split_audio_into_chunks(y, sr, dur, overlap)
    assert chunks[-1][-1] == n


# ---------------------------------------------------------------------------
# Pooling (reference evaluation/pooling.py:6-47)
# ---------------------------------------------------------------------------

score_matrices = st.integers(min_value=1, max_value=12).flatmap(
    lambda rows: st.integers(min_value=1, max_value=8).flatmap(
        lambda cols: st.lists(
            st.lists(
                st.floats(min_value=-50.0, max_value=50.0, allow_nan=False),
                min_size=cols, max_size=cols,
            ),
            min_size=rows, max_size=rows,
        )
    )
)


@common
@given(score_matrices, st.floats(min_value=0.05, max_value=100.0))
def test_lme_between_mean_and_max(scores, beta):
    """LME interpolates mean and max: mean <= lme <= max (+eps slack from
    the reference's epsilon inside the log, pooling.py:6-23)."""
    s = np.asarray(scores, np.float64)
    out = lme_pooling(s, beta=beta)
    eps_slack = np.log(1e-12 + 1.0) / beta + 1e-6  # reference +1e-12 bias
    assert np.all(out >= s.mean(axis=0) - np.abs(s.mean(axis=0)) * 1e-9 - 0.15 / beta - 1e-6)
    assert np.all(out <= s.max(axis=0) + eps_slack)


@common
@given(score_matrices)
def test_lme_large_beta_is_max(scores):
    """beta -> inf recovers max pooling (reference test_pooling.py:51)."""
    s = np.asarray(scores, np.float64)
    out = lme_pooling(s, beta=1e4)
    assert np.allclose(out, s.max(axis=0), atol=1e-2)


@common
@given(score_matrices, st.sampled_from(["average", "max", "lme"]), st.randoms())
def test_pooling_is_permutation_invariant(scores, method, rnd):
    """Chunk order never changes the pooled file score."""
    s = np.asarray(scores, np.float64)
    perm = list(range(s.shape[0]))
    rnd.shuffle(perm)
    a = pool_scores(s, method)
    b = pool_scores(s[perm], method)
    assert np.allclose(a, b, rtol=1e-9, atol=1e-9)


@common
@given(
    st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
             min_size=1, max_size=8),
    st.sampled_from(["average", "max", "lme"]),
)
def test_pooling_single_chunk_is_identity(row, method):
    s = np.asarray([row], np.float64)
    out = pool_scores(s, method)
    atol = 1e-9 if method != "lme" else 1e-6  # reference's +1e-12 log bias
    assert np.allclose(out, s[0], atol=atol)


@common
@given(
    st.integers(min_value=1, max_value=5),             # num files
    st.integers(min_value=1, max_value=20),            # num chunks
    st.integers(min_value=1, max_value=6),             # classes
    st.sampled_from(["average", "max", "lme"]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_segment_pool_matches_host_pooling(F, N, C, method, seed):
    """Device segment_pool (one reduction over all files) == per-file host
    pool_scores, including files that received zero chunks."""
    import jax.numpy as jnp

    from birdnet_stm32_tpu.evaluation.pooling import segment_pool

    rng = np.random.default_rng(seed)
    scores = rng.normal(size=(N, C)).astype(np.float32)
    ids = rng.integers(0, F, N)
    dev = np.asarray(segment_pool(jnp.asarray(scores), jnp.asarray(ids),
                                  F, method=method))
    for f in range(F):
        rows = scores[ids == f]
        expect = (pool_scores(rows, method) if len(rows)
                  else np.zeros(C, np.float32))
        np.testing.assert_allclose(dev[f], expect, atol=3e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Similarity metrics (reference conversion/validate.py:7-48)
# ---------------------------------------------------------------------------

vectors = st.lists(
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False),
    min_size=2, max_size=64,
)


@common
@given(vectors, vectors)
def test_cosine_bounds_and_symmetry(a, b):
    n = min(len(a), len(b))
    a, b = np.asarray(a[:n]), np.asarray(b[:n])
    c = cosine_similarity(a, b)
    assert -1.0 - 1e-12 <= c <= 1.0 + 1e-12
    assert c == pytest.approx(cosine_similarity(b, a), abs=1e-12)


@common
@given(vectors, st.floats(min_value=0.01, max_value=100.0))
def test_cosine_positive_scale_invariance(a, lam):
    a = np.asarray(a)
    if np.linalg.norm(a) < 1e-6 or np.linalg.norm(a * lam) < 1e-6:
        return  # zero-vector convention territory, covered below
    assert cosine_similarity(a, lam * a) == pytest.approx(1.0, abs=1e-9)


def test_cosine_zero_vector_conventions():
    """Both near-zero -> 1.0; exactly one -> 0.0 (validate.py:7-29)."""
    z = np.zeros(4)
    v = np.ones(4)
    assert cosine_similarity(z, z) == 1.0
    assert cosine_similarity(z, v) == 0.0
    assert cosine_similarity(v, z) == 0.0


@common
@given(vectors, st.floats(min_value=-100, max_value=100),
       st.floats(min_value=0.01, max_value=100))
def test_pearson_shift_scale_invariance(a, shift, scale):
    a = np.asarray(a)
    if np.linalg.norm(a - a.mean()) < 1e-6:
        return  # constant vector -> degenerate 1.0 convention
    r = pearson_correlation(a, scale * a + shift)
    assert r == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Channel rounding (reference models/blocks.py:13-24)
# ---------------------------------------------------------------------------

@common
@given(st.floats(min_value=0.0, max_value=4096.0),
       st.sampled_from([4, 8, 16]))
def test_make_divisible_properties(v, divisor):
    out = make_divisible(v, divisor)
    assert out % divisor == 0
    assert out >= divisor
    # never rounds DOWN past the nearest multiple below v - divisor/2
    assert out >= (int(v + divisor / 2) // divisor) * divisor


# ---------------------------------------------------------------------------
# Fake quantization (quant/fake_quant.py; reference training/qat.py:30-68)
# ---------------------------------------------------------------------------

weight_tensors = st.tuples(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
).flatmap(
    lambda shape: st.lists(
        st.floats(min_value=-10.0, max_value=10.0, allow_nan=False,
                  allow_infinity=False),
        min_size=shape[0] * shape[1], max_size=shape[0] * shape[1],
    ).map(lambda flat: np.asarray(flat, np.float32).reshape(shape))
)


@common
@given(weight_tensors, st.booleans())
def test_fake_quantize_error_bound(w, per_channel):
    """Quant-dequant error <= scale/2 per element, scale = range/255
    (asymmetric min/max affine, reference qat.py:30-68)."""
    from birdnet_stm32_tpu.quant.fake_quant import fake_quantize

    wq = np.asarray(fake_quantize(w, per_channel=per_channel))
    if per_channel and w.ndim > 1:
        lo = w.min(axis=0, keepdims=True)
        hi = w.max(axis=0, keepdims=True)
    else:
        lo, hi = w.min(), w.max()
    scale = np.maximum((hi - lo) / 255.0, 1e-10)
    assert np.all(np.abs(wq - w) <= scale / 2 + 1e-6)


@common
@given(weight_tensors)
def test_fake_quantize_idempotent(w):
    """Quantizing an already-quantized tensor is (near-)identity: the grid
    is defined by the tensor's own min/max, which quant-dequant preserves."""
    from birdnet_stm32_tpu.quant.fake_quant import fake_quantize

    wq = np.asarray(fake_quantize(w, per_channel=False))
    wqq = np.asarray(fake_quantize(wq, per_channel=False))
    # one extra grid-snap of slack: f32 round-off can move a point half a bin
    scale = max((w.max() - w.min()) / 255.0, 1e-10)
    assert np.all(np.abs(wqq - wq) <= scale / 2 + 1e-6)


waveforms_1d = (
    st.integers(min_value=4, max_value=256).flatmap(
        lambda n: st.lists(
            st.floats(min_value=-1.5, max_value=1.5, width=32,
                      allow_nan=False, allow_infinity=False),
            min_size=n, max_size=n))
    .map(lambda xs: np.asarray(xs, np.float32))
)


@common
@given(waveforms_1d)
def test_ulaw_round_trip_relative_bound(x):
    """decode(encode(x)) stays within half a companded step of clip(x):
    relative ~2.2% plus the bottom-step absolute floor (mu=255 log grid,
    data/worker.ulaw_encode <-> the serving/batcher decoder)."""
    from birdnet_stm32_tpu.data.worker import ulaw_encode

    LN = np.float32(np.log1p(255.0))
    q = ulaw_encode(x)
    y = np.sign(q.astype(np.float32)) * np.expm1(
        np.abs(q.astype(np.float32)) / 127.0 * LN) / 255.0
    xc = np.clip(x, -1.0, 1.0)
    rel_step = np.expm1(LN / 254.0)
    tol = np.abs(xc) * rel_step + 1.1 * np.expm1(LN / 254.0) / 255.0
    assert np.all(np.abs(y - xc) <= tol + 1e-7)
    assert q.dtype == np.int8 and np.all(np.abs(q.astype(np.int32)) <= 127)


@common
@given(waveforms_1d)
def test_ulaw_encode_monotone_and_odd(x):
    """The companding code is a monotone odd function of the sample value:
    sorting samples sorts codes, and encode(-x) == -encode(x)."""
    from birdnet_stm32_tpu.data.worker import ulaw_encode

    order = np.argsort(x, kind="stable")
    codes = ulaw_encode(x).astype(np.int32)
    sorted_codes = codes[order]
    assert np.all(np.diff(sorted_codes) >= 0)
    np.testing.assert_array_equal(ulaw_encode(-x).astype(np.int32), -codes)


@common
@given(waveforms_1d)
def test_ulaw_encode_idempotent_through_decode(x):
    """encode(decode(encode(x))) == encode(x): decoded values sit at grid
    centers, so a second pass reproduces the same codes."""
    from birdnet_stm32_tpu.data.worker import ulaw_encode

    LN = np.float32(np.log1p(255.0))
    q = ulaw_encode(x)
    y = np.sign(q.astype(np.float32)) * np.expm1(
        np.abs(q.astype(np.float32)) / 127.0 * LN) / 255.0
    np.testing.assert_array_equal(ulaw_encode(y), q)


# ---------------------------------------------------------------------------
# Audio round-trips (reference audio/io.py)
# ---------------------------------------------------------------------------

@common
@given(
    st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
             min_size=16, max_size=4096),
    st.sampled_from([8000, 22050, 24000]),
)
def test_wav_roundtrip_int16_bound(tmp_path_factory, samples, sr):
    """save_wav -> load_audio_window reproduces samples within int16
    quantization (1/32767) *up to the loader's peak normalization*
    (reference io.py:120-127 normalizes the window to max |1.0|)."""
    path = tmp_path_factory.mktemp("wav") / "t.wav"
    y = np.asarray(samples, np.float32)
    save_wav(y, path, sample_rate=sr)
    back = load_audio_window(path, sample_rate=sr, max_duration=None,
                             chunk_duration=0.001)
    # The window policy computes n = int(total_frames/sr * sr), which f32
    # round-off can truncate by one frame (reference io.py:63-130 does the
    # same seconds->frames round trip) — tolerate exactly that.
    assert y.shape[0] - 1 <= back.shape[0] <= y.shape[0]
    n = back.shape[0]
    stored = np.round(np.clip(y, -1, 1) * 32767).astype(np.int16) / 32768.0
    peak = np.abs(stored[:n]).max()
    expect = stored[:n] / peak if peak > 1e-6 else stored[:n]
    assert np.allclose(back, expect, atol=2e-4)


# ---------------------------------------------------------------------------
# Device DSP (ops/stft.py, ops/spectrogram.py) — geometry drawn from small
# discrete sets so XLA compiles a bounded number of shapes.
# ---------------------------------------------------------------------------

dsp = settings(max_examples=25, deadline=None)

_GEOMS = [  # (n_fft, hop) covering the conv path (2*hop >= n_fft) and the
    (32, 16), (32, 20), (64, 32), (64, 48),      # conv formulation
    (64, 8), (32, 4),                            # r > 4 gather/reshape path
]
_LENGTHS = [257, 512, 800, 1024]


@dsp
@given(st.sampled_from(_GEOMS), st.sampled_from(_LENGTHS),
       st.booleans(), st.integers(min_value=0, max_value=2**31 - 1))
def test_stft_matches_host_twin(geom, T, center, seed):
    """Device STFT (matmul/conv formulation) == numpy rFFT twin for every
    framing geometry, both librosa-centered and firmware left-aligned."""
    from birdnet_stm32_tpu.ops.stft import stft_magnitude, stft_magnitude_host

    n_fft, hop = geom
    y = np.random.default_rng(seed).normal(size=(2, T)).astype(np.float32)
    n_frames = 1 + T // hop if center else -(-T // hop)
    dev = np.asarray(stft_magnitude(y, n_fft=n_fft, hop=hop,
                                    n_frames=n_frames, center=center))
    for b in range(2):
        ref = stft_magnitude_host(y[b], n_fft=n_fft, hop=hop, center=center,
                                  n_frames=n_frames).T  # [W, F]
        np.testing.assert_allclose(dev[b], ref, atol=2e-4, rtol=2e-4)


@dsp
@given(st.sampled_from(_GEOMS), st.integers(min_value=0, max_value=2**31 - 1))
def test_stft_sign_invariance(geom, seed):
    """|STFT(-x)| == |STFT(x)| exactly (magnitude kills the global sign)."""
    from birdnet_stm32_tpu.ops.stft import stft_magnitude

    n_fft, hop = geom
    y = np.random.default_rng(seed).normal(size=(1, 512)).astype(np.float32)
    a = np.asarray(stft_magnitude(y, n_fft=n_fft, hop=hop, n_frames=8))
    b = np.asarray(stft_magnitude(-y, n_fft=n_fft, hop=hop, n_frames=8))
    np.testing.assert_array_equal(a, b)


@dsp
@given(st.sampled_from(["mel", "mfcc", "log_mel", "linear"]),
       st.sampled_from(["none", "pwl", "db"]),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_spectrogram_normalized_range_and_shape(mode, mag_scale, seed):
    """Features land in [0, 1] with the documented [B, bins, W] shape for
    every mode x mag_scale (reference normalize, spectrogram.py:12-21)."""
    from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch

    if mode in ("mfcc", "log_mel") and mag_scale != "none":
        return  # reference behavior matrix: scaling applies to mel/linear
    y = np.random.default_rng(seed).normal(size=(2, 800)).astype(np.float32)
    S = np.asarray(spectrogram_batch(
        y, sample_rate=4000, n_fft=64, mel_bins=16, spec_width=25,
        mode=mode, mag_scale=mag_scale))
    bins = {"mel": 16, "log_mel": 16, "mfcc": 20, "linear": 33}[mode]
    assert S.shape == (2, bins, 25)
    assert np.all(S >= -1e-6) and np.all(S <= 1 + 1e-6)
    assert np.all(np.isfinite(S))


@dsp
@given(st.sampled_from(["mel", "linear"]), st.sampled_from(["none", "db"]),
       st.floats(min_value=0.1, max_value=8.0),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_spectrogram_input_scale_invariance(mode, mag_scale, gain, seed):
    """Min-max normalization makes the features invariant to input gain
    for linear (S -> gS) and db (S -> S + const) scalings — the property
    that makes peak-normalized and raw recordings comparable."""
    from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch

    y = np.random.default_rng(seed).normal(size=(1, 800)).astype(np.float32)
    kw = dict(sample_rate=4000, n_fft=64, mel_bins=16, spec_width=25,
              mode=mode, mag_scale=mag_scale)
    a = np.asarray(spectrogram_batch(y, **kw))
    b = np.asarray(spectrogram_batch(gain * y, **kw))
    np.testing.assert_allclose(a, b, atol=5e-3)


@common
@given(
    st.integers(min_value=64, max_value=8192),
    st.sampled_from([(48000, 24000), (44100, 22050), (22050, 24000),
                     (16000, 22050), (24000, 24000)]),
)
def test_resample_length_formula(n, rates):
    """Output length matches scipy.signal.resample_poly's ceil(n*up/down)
    on both the native C++ and scipy paths (reference io.py:14-30)."""
    sr_in, sr_out = rates
    y = np.random.default_rng(0).normal(size=n).astype(np.float32)
    out = fast_resample(y, sr_in, sr_out)
    from math import gcd

    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    assert out.shape[0] == -(-n * up // down)  # ceil division
