"""Evaluation tests: pooling laws, metric math with a FakeRunner, reports."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.evaluation.metrics import (
    bootstrap_ap_ci,
    compute_det_curve,
    evaluate,
    optimize_thresholds,
)
from birdnet_stm32_tpu.evaluation.pooling import lme_pooling, pool_scores, segment_pool
from birdnet_stm32_tpu.evaluation.reporting import (
    save_benchmark_json,
    save_html_report,
    save_predictions_csv,
    save_species_report_csv,
)


class FakeRunner:
    """Label-derived scores so metric math is testable without a model
    (reference tests/test_metrics.py:11-22 analog). The input's frequency
    content determines the 'class': bird_a is a pure high tone, bird_b a
    chirp; we cheat by hashing input energy distribution deterministically."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def predict(self, x):
        x = np.asarray(x)
        flat = x.reshape(x.shape[0], -1)
        # deterministic pseudo-scores in [0,1] keyed on input statistics
        e = flat.var(axis=1)
        scores = np.zeros((x.shape[0], self.num_classes), np.float32)
        for i, v in enumerate(e):
            scores[i, int(v * 1e6) % self.num_classes] = 0.9
        return scores


def test_pool_scores_methods():
    s = np.array([[0.1, 0.9], [0.5, 0.1], [0.3, 0.2]], np.float32)
    np.testing.assert_allclose(pool_scores(s, "avg"), s.mean(axis=0))
    np.testing.assert_allclose(pool_scores(s, "max"), s.max(axis=0))
    lme = pool_scores(s, "lme", beta=10.0)
    assert np.all(lme <= s.max(axis=0) + 1e-6) and np.all(lme >= s.mean(axis=0) - 1e-6)
    with pytest.raises(ValueError):
        pool_scores(s, "median")
    assert pool_scores(np.zeros((0, 2), np.float32), "avg").shape == (2,)


def test_lme_limits():
    s = np.random.default_rng(0).uniform(0, 1, (20, 3)).astype(np.float32)
    np.testing.assert_allclose(lme_pooling(s, beta=1e4), s.max(axis=0), atol=1e-3)
    np.testing.assert_allclose(lme_pooling(s, beta=1e-4), s.mean(axis=0), atol=1e-3)


def test_segment_pool_matches_host():
    rng = np.random.default_rng(1)
    scores = rng.uniform(0, 1, (10, 4)).astype(np.float32)
    ids = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3])
    for method in ("avg", "max", "lme"):
        dev = np.asarray(segment_pool(jnp.asarray(scores), jnp.asarray(ids), 4, method))
        for f in range(4):
            host = pool_scores(scores[ids == f], method)
            np.testing.assert_allclose(dev[f], host, rtol=1e-5, atol=1e-6)


def test_evaluate_end_to_end(wav_dataset):
    root, sr = wav_dataset
    from birdnet_stm32_tpu.data.dataset import load_file_paths_from_directory

    paths, labels, class_names = load_file_paths_from_directory(root)
    real = [p for p, l in zip(paths, labels) if l in class_names]
    cfg = ModelConfig(sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=class_names, audio_frontend="librosa", mag_scale="none")
    metrics, per_file, y_true, y_scores = evaluate(
        FakeRunner(2), real, class_names, cfg, pooling="avg",
        batch_size=4, measure_latency=True, profile_memory=True,
    )
    assert len(per_file) == len(real)
    assert y_true.shape == y_scores.shape == (len(real), 2)
    for key in ("roc-auc", "f1", "precision", "recall", "cmAP", "mAP",
                "latency_mean_ms", "peak_rss_mb"):
        assert key in metrics


def test_evaluate_max_duration_caps_chunks(wav_dataset):
    """max_duration bounds per-file decode: 1 s cap on 3 s files yields one
    1-s chunk per file (reference metrics.py:45 semantics, CLI-tunable)."""
    root, sr = wav_dataset
    from birdnet_stm32_tpu.data.dataset import load_file_paths_from_directory

    paths, labels, class_names = load_file_paths_from_directory(root)
    real = [p for p, l in zip(paths, labels) if l in class_names]
    cfg = ModelConfig(sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=class_names, audio_frontend="librosa", mag_scale="none")
    capped, _, _, _ = evaluate(FakeRunner(2), real, class_names, cfg,
                               batch_size=4, max_duration=1.0)
    full, _, _, _ = evaluate(FakeRunner(2), real, class_names, cfg,
                             batch_size=4, max_duration=60.0)
    assert capped["total_chunks"] == len(real)  # one chunk per file
    assert full["total_chunks"] > capped["total_chunks"]


def test_evaluate_threaded_decode_matches_serial(wav_dataset):
    """decode_workers>0 (prefetch threads) must not change any result."""
    from birdnet_stm32_tpu.data.dataset import load_file_paths_from_directory

    root, sr = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    real = [p for p, l in zip(paths, labels) if l in class_names]
    cfg = ModelConfig(sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=class_names, audio_frontend="librosa", mag_scale="none")
    m0, pf0, yt0, ys0 = evaluate(FakeRunner(2), real, class_names, cfg,
                                 batch_size=4)
    m3, pf3, yt3, ys3 = evaluate(FakeRunner(2), real, class_names, cfg,
                                 batch_size=4, decode_workers=3)
    np.testing.assert_array_equal(yt0, yt3)
    np.testing.assert_allclose(ys0, ys3)
    assert [r["file"] for r in pf0] == [r["file"] for r in pf3]
    assert m0["roc-auc"] == m3["roc-auc"]


def test_perfect_scores_metrics(wav_dataset):
    root, sr = wav_dataset

    class Oracle:
        """Looks up the true label via closure — produces perfect scores."""

        def __init__(self, answers):
            self.answers = answers
            self.i = 0

        def predict(self, x):
            out = self.answers[self.i : self.i + x.shape[0]]
            self.i += x.shape[0]
            return np.asarray(out, np.float32)

    from birdnet_stm32_tpu.data.dataset import load_file_paths_from_directory, one_hot_labels

    paths, labels, class_names = load_file_paths_from_directory(root)
    real = [(p, l) for p, l in zip(paths, labels) if l in class_names]
    cfg = ModelConfig(sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=2.0, embeddings_size=32, num_classes=2,
                      class_names=class_names, audio_frontend="librosa", mag_scale="none")
    # each 2s file yields exactly 1 chunk -> answers follow file order
    answers = one_hot_labels([l for _, l in real], class_names) * 0.98 + 0.01
    metrics, _, _, _ = evaluate(Oracle(answers), [p for p, _ in real], class_names, cfg)
    assert metrics["roc-auc"] == pytest.approx(1.0)
    assert metrics["f1"] == pytest.approx(1.0)
    assert metrics["cmAP"] == pytest.approx(1.0)


def test_optimize_thresholds():
    y_true = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], np.float32)
    y_scores = np.array([[0.9, 0.1], [0.8, 0.3], [0.2, 0.7], [0.1, 0.6]], np.float32)
    th = optimize_thresholds(y_true, y_scores, ["a", "b"])
    assert 0.2 < th["a"] <= 0.81 and 0.3 < th["b"] <= 0.61
    # degenerate class -> default 0.5
    th2 = optimize_thresholds(np.zeros((4, 1), np.float32), y_scores[:, :1], ["z"])
    assert th2["z"] == 0.5


def test_bootstrap_ap_ci():
    rng = np.random.default_rng(0)
    y_true = (rng.uniform(size=(50, 2)) < 0.3).astype(np.float32)
    y_scores = np.clip(y_true * 0.7 + rng.uniform(0, 0.5, (50, 2)), 0, 1)
    res = bootstrap_ap_ci(y_true, y_scores, ["a", "b"], n_bootstrap=50)
    for r in res:
        assert r["ci_lower"] <= r["ap"] + 1e-9
        assert r["ap"] <= r["ci_upper"] + 1e-9
    degenerate = bootstrap_ap_ci(np.zeros((10, 1), np.float32),
                                 rng.uniform(size=(10, 1)), ["z"], n_bootstrap=10)
    assert degenerate[0]["ci_lower"] == degenerate[0]["ap"]


def test_det_curve():
    rng = np.random.default_rng(0)
    y_true = (rng.uniform(size=200) < 0.4).astype(np.float32)
    y_scores = np.clip(y_true * 0.5 + rng.uniform(0, 0.5, 200), 0, 1)
    far, frr, thr = compute_det_curve(y_true, y_scores)
    assert len(far) == len(frr) == len(thr)
    assert (np.diff(far) >= -1e-12).all()   # FAR monotone non-decreasing
    assert (np.diff(frr) <= 1e-12).all()    # FRR monotone non-increasing
    # degenerate: single class
    f, r, t = compute_det_curve(np.ones(5), np.ones(5) * 0.5)
    assert len(f) == 1


def test_reports_written(tmp_path):
    classes = ["a", "b"]
    per_file = [{"file": "x.wav", "label": "a", "scores": [0.8, 0.1]}]
    metrics = {"roc-auc": 0.9, "f1": 0.8, "ap_per_class": [0.9, 0.7]}
    y_true = np.array([[1, 0], [0, 1]], np.float32)
    y_scores = np.array([[0.8, 0.1], [0.3, 0.9]], np.float32)
    species = bootstrap_ap_ci(y_true, y_scores, classes, n_bootstrap=5)

    save_predictions_csv(per_file, classes, tmp_path / "pred.csv")
    lines = (tmp_path / "pred.csv").read_text().splitlines()
    assert lines[0] == "file,label,top1_label,top1_score,a,b"
    assert lines[1].startswith("x.wav,a,a,0.800")

    save_species_report_csv(species, tmp_path / "species.csv")
    assert (tmp_path / "species.csv").read_text().startswith("class,ap,ci_lower")

    save_benchmark_json(metrics, classes, "model.x", tmp_path / "bench.json",
                        species_data=species, config={"sample_rate": 22050})
    report = json.loads((tmp_path / "bench.json").read_text())
    assert report["metrics"]["roc-auc"] == 0.9
    assert "ap_per_class" not in report["metrics"]
    assert report["config"]["sample_rate"] == 22050

    save_html_report(metrics, classes, y_true, y_scores, "model.x", tmp_path / "r.html",
                     species_data=species, config={"k": 1})
    html = (tmp_path / "r.html").read_text()
    assert "Evaluation report" in html and "data:image/png;base64" in html


def test_evaluate_with_cache_dir(tmp_path, wav_dataset):
    """evaluate(cache_dir=...) builds one entry per file and returns the
    same metrics as the direct path (same bytes at the same rate)."""
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.evaluation.metrics import evaluate

    root, _sr = wav_dataset
    classes = ["bird_a", "bird_b", "noise"]
    files = sorted(str(p) for c in classes for p in (root / c).glob("*.wav"))
    cfg = ModelConfig(sample_rate=8000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, num_classes=len(classes),
                      class_names=classes)

    class FakeRunner:
        def predict(self, x):
            return np.tile(np.eye(len(classes), dtype=np.float32)[0], (x.shape[0], 1))

    cache = tmp_path / "cache"
    m1, _, y1, s1 = evaluate(FakeRunner(), files, list(classes), cfg)
    m2, _, y2, s2 = evaluate(FakeRunner(), files, list(classes), cfg,
                             cache_dir=str(cache))
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_allclose(s1, s2)
    assert len(list(cache.glob("*.npy"))) == len(files)


def test_benchmark_json_nan_is_null(tmp_path):
    """NaN metrics must serialize as null, not a bare NaN token."""
    import json

    from birdnet_stm32_tpu.evaluation.reporting import save_benchmark_json

    out = tmp_path / "bench.json"
    save_benchmark_json({"roc-auc": float("nan"), "cmAP": 0.5},
                        ["a", "b"], "m.tflite", out)
    parsed = json.loads(out.read_text())  # strict parse must succeed
    assert parsed["metrics"]["roc-auc"] is None
    assert parsed["metrics"]["cmAP"] == 0.5


def test_metrics_at_thresholds():
    """The optimized operating point mirrors evaluate()'s micro P/R/F1
    math, applied at per-class thresholds instead of a flat 0.5."""
    from birdnet_stm32_tpu.evaluation.metrics import (
        metrics_at_thresholds,
        optimize_thresholds,
    )

    y_true = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], np.float32)
    # Class 'a' scores are well-separated but BELOW 0.5 (the classic
    # under-confident head); class 'b' is separated around 0.5.
    y_scores = np.array([[0.30, 0.10], [0.25, 0.20],
                         [0.05, 0.70], [0.02, 0.60]], np.float32)
    at_half = metrics_at_thresholds(y_true, y_scores,
                                    {"a": 0.5, "b": 0.5}, ["a", "b"])
    assert at_half["recall"] == pytest.approx(0.5)  # class 'a' missed
    th = optimize_thresholds(y_true, y_scores, ["a", "b"])
    assert th["a"] <= 0.25  # found the under-confident operating point
    opt = metrics_at_thresholds(y_true, y_scores, th, ["a", "b"])
    assert opt["recall"] == pytest.approx(1.0)
    assert opt["precision"] == pytest.approx(1.0)
    assert opt["f1"] == pytest.approx(1.0)
    # Missing classes fall back to 0.5, not a KeyError.
    part = metrics_at_thresholds(y_true, y_scores, {"a": 0.2}, ["a", "b"])
    assert 0.0 <= part["f1"] <= 1.0
