"""Activity detection / smart-crop tests (reference invariants)."""

import numpy as np

from birdnet_stm32_tpu.audio.activity import (
    get_activity_ratio,
    pick_random_samples,
    short_time_energy,
    smart_crop,
    sort_by_activity,
    sort_by_s2n,
)


def test_short_time_energy_shape_and_loudness():
    sr = 16000
    y = np.zeros(sr, np.float32)
    y[4000:6000] = 0.8
    ste = short_time_energy(y, 1024, 512)
    assert ste.ndim == 1 and len(ste) == 1 + (sr - 1024) // 512
    assert ste.argmax() * 512 >= 3000 and ste.argmax() * 512 <= 6000


def test_smart_crop_finds_event():
    sr = 16000
    y = np.random.default_rng(0).normal(0, 0.005, sr * 10).astype(np.float32)
    t = np.arange(sr) / sr
    event = (0.8 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
    y[6 * sr : 7 * sr] += event
    chunks = smart_crop(y, sr, 1.0, max_chunks=2)
    assert all(c.shape == (sr,) for c in chunks)
    # top-ranked chunk overlaps the event
    assert np.abs(chunks[0]).max() > 0.5


def test_smart_crop_short_input_pads():
    sr = 8000
    y = np.ones(sr // 2, np.float32)
    chunks = smart_crop(y, sr, 1.0)
    assert len(chunks) == 1 and chunks[0].shape == (sr,)
    assert np.all(chunks[0][sr // 2 :] == 0)


def test_smart_crop_silent_center_crop():
    sr = 8000
    y = np.zeros(sr * 5, np.float32)
    chunks = smart_crop(y, sr, 1.0)
    assert len(chunks) == 1 and chunks[0].shape == (sr,)


def test_smart_crop_dedups_nearby_peaks():
    sr = 8000
    y = np.zeros(sr * 4, np.float32)
    y[sr : sr + 100] = 1.0
    y[sr + 200 : sr + 300] = 0.9  # within half a chunk of the first peak
    chunks = smart_crop(y, sr, 1.0, max_chunks=5)
    assert len(chunks) == 1


def test_activity_ratio_range_and_broadband_cap(rng):
    sparse = np.zeros(4096, np.float32)
    sparse[100:140] = 5.0
    assert 0 < get_activity_ratio(sparse) < 0.5
    broadband = rng.uniform(0.9, 1.1, 4096).astype(np.float32)
    # nearly everything above median + 2*MAD is impossible; but uniform-high
    # signals that exceed max_active are zeroed
    assert get_activity_ratio(broadband, k=0.0, max_active=0.3) == 0.0


def test_sorting_keeps_at_least_one(rng):
    quiet = [np.zeros(1024, np.float32) for _ in range(3)]
    assert len(sort_by_activity(quiet, threshold=0.9)) == 1
    assert len(sort_by_s2n([rng.normal(size=128) for _ in range(3)], threshold=2.0)) >= 1


def test_pick_random_samples(rng):
    samples = [np.full(4, i, np.float32) for i in range(6)]
    g = np.random.default_rng(0)
    one = pick_random_samples(samples, 1, rng=g)
    assert isinstance(one, np.ndarray)
    first_plus = pick_random_samples(samples, 3, pick_first=True, rng=g)
    assert first_plus[0][0] == 0.0 and len(first_plus) == 3
    assert pick_random_samples([], 2) == []
    capped = pick_random_samples(samples, 99, rng=g)
    assert len(capped) == 6


def test_short_time_energy_matches_reference_loop():
    """The O(n) prefix-sum STE equals the reference's per-frame loop
    (activity.py:12-30 there), including the short tail frame."""
    rng = np.random.default_rng(3)
    for n in (100, 1024, 5000, 4096 + 17):
        y = rng.normal(0, 0.5, n).astype(np.float32)
        fl, hop = 1024, 512
        ours = short_time_energy(y, fl, hop)
        n_frames = max(1, 1 + max(0, n - fl) // hop)
        ref = []
        for i in range(n_frames):
            fr = y[i * hop : i * hop + fl]
            ref.append(np.mean(fr.astype(np.float64) ** 2))
        np.testing.assert_allclose(ours, np.asarray(ref, np.float32), rtol=1e-5)
