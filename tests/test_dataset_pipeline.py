"""Dataset discovery, species lists, and the multiprocessing input pipeline."""

import numpy as np
import pytest

import jax

from birdnet_stm32_tpu.data.dataset import (
    get_classes_with_most_samples,
    load_file_paths_from_directory,
    one_hot_labels,
    upsample_minority_classes,
)
from birdnet_stm32_tpu.data.pipeline import AudioLoader, LoaderConfig, make_train_batcher, process_file
from birdnet_stm32_tpu.data.species import combine_species_lists, open_species_list, save_species_list


def test_discovery_excludes_noise_from_classes(wav_dataset):
    root, sr = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    assert class_names == ["bird_a", "bird_b"]
    assert len(paths) == 9  # noise files kept
    assert labels.count("noise") == 2


def test_top_n_classes(wav_dataset):
    root, _ = wav_dataset
    assert get_classes_with_most_samples(root, 1) == ["bird_a"]
    assert get_classes_with_most_samples(root, 5) == ["bird_a", "bird_b"]


def test_one_hot_noise_all_zero(wav_dataset):
    root, _ = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    y = one_hot_labels(labels, class_names)
    noise_rows = [i for i, l in enumerate(labels) if l == "noise"]
    assert (y[noise_rows] == 0).all()
    real_rows = [i for i, l in enumerate(labels) if l != "noise"]
    assert (y[real_rows].sum(axis=1) == 1).all()


def test_upsample_minority(wav_dataset):
    root, _ = wav_dataset
    paths, labels, _ = load_file_paths_from_directory(root)
    up_p, up_l = upsample_minority_classes(paths, labels, ratio=1.0)
    assert up_l.count("bird_b") == up_l.count("bird_a") == 4
    assert up_l.count("noise") == 2  # noise never upsampled


def test_species_lists(tmp_path):
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    save_species_list(["wren", "crow", "wren"], a)
    save_species_list(["owl", "crow"], b)
    assert open_species_list(a) == ["crow", "wren"]
    combined = combine_species_lists([a, b], tmp_path / "out.txt", max_species=3)
    assert combined == sorted(combined) and len(combined) == 3
    assert open_species_list(tmp_path / "out.txt") == combined
    with pytest.raises(FileNotFoundError):
        open_species_list(tmp_path / "missing.txt")


def test_process_file_produces_chunks(wav_dataset):
    root, sr = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    y = one_hot_labels(labels, class_names)
    cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=2,
                       max_chunks_per_file=2, random_offset=False)
    out = process_file((paths[0], y[0], cfg, 0))
    assert out and all(c.shape == (sr,) for c, _ in out)
    assert all(l.shape == (2,) for _, l in out)


def test_process_file_bad_path_noise_fallback():
    cfg = LoaderConfig(sample_rate=8000, chunk_duration=1.0, num_classes=3)
    out = process_file(("/nonexistent.wav", np.zeros(3, np.float32), cfg, 1))
    assert len(out) == 1
    chunk, label = out[0]
    assert chunk.shape == (8000,) and (label == 0).all()
    assert np.abs(chunk).max() > 0  # random noise, not silence


@pytest.mark.parametrize("num_workers", [0, 2])
def test_loader_yields_batches(wav_dataset, num_workers):
    root, sr = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    y = one_hot_labels(labels, class_names)
    cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=2,
                       max_chunks_per_file=2, random_offset=False, seed=1)
    loader = AudioLoader(paths, y, cfg, batch_size=4, num_workers=num_workers,
                         infinite=True, reservoir_size=32)
    it = iter(loader)
    for _ in range(3):
        xb, yb = next(it)
        assert xb.shape == (4, sr) and yb.shape == (4, 2)
        assert xb.dtype == np.float32


def test_loader_finite_mode(wav_dataset):
    root, sr = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    y = one_hot_labels(labels, class_names)
    cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=2,
                       max_chunks_per_file=1, random_offset=False)
    loader = AudioLoader(paths, y, cfg, batch_size=4, num_workers=0, infinite=False)
    batches = list(loader)
    assert 1 <= len(batches) <= 3  # 9 files -> <= 9 chunks -> <= 2 full batches


def test_train_batcher_shapes(wav_dataset):
    from birdnet_stm32_tpu.config import ModelConfig

    root, sr = wav_dataset
    mcfg = ModelConfig(sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                       chunk_duration=1.0, embeddings_size=32, num_classes=2,
                       audio_frontend="hybrid", mag_scale="pwl")
    batcher = make_train_batcher(mcfg, spec_augment=True, mixup_probability=0.5)
    wave = np.random.default_rng(0).normal(0, 0.3, (8, sr)).astype(np.float32)
    lab = np.eye(2, dtype=np.float32)[np.arange(8) % 2]
    x, y2 = batcher(jax.random.key(0), wave, lab)
    assert x.shape == (8, 65, 32, 1)
    assert y2.shape == (8, 2)


def test_train_batcher_feature_dtype_bf16(wav_dataset):
    """Mixed-precision training's bf16 batcher (feature_dtype=bfloat16,
    bf16-I/O STFT) emits bf16 features that track the f32 batcher within
    bf16 resolution when augmentation is deterministic-off."""
    import jax.numpy as jnp

    from birdnet_stm32_tpu.config import ModelConfig

    root, sr = wav_dataset
    mcfg = ModelConfig(sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                       chunk_duration=1.0, embeddings_size=32, num_classes=2,
                       audio_frontend="hybrid", mag_scale="pwl")
    wave = np.random.default_rng(0).normal(0, 0.3, (8, sr)).astype(np.float32)
    lab = np.eye(2, dtype=np.float32)[np.arange(8) % 2]
    kw = dict(spec_augment=False, mixup_probability=0.0)
    x32, _ = make_train_batcher(mcfg, **kw)(jax.random.key(0), wave, lab)
    x16, y16 = make_train_batcher(mcfg, stft_precision="high",
                                  feature_dtype=jnp.bfloat16, **kw)(
        jax.random.key(0), wave, lab)
    assert x16.dtype == jnp.bfloat16
    assert y16.dtype == jnp.float32  # labels stay f32
    np.testing.assert_allclose(np.asarray(x16, np.float32), np.asarray(x32),
                               atol=0.02)


def test_train_batcher_raw_frontend(wav_dataset):
    from birdnet_stm32_tpu.config import ModelConfig

    root, sr = wav_dataset
    mcfg = ModelConfig(sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                       chunk_duration=1.0, embeddings_size=32, num_classes=2,
                       audio_frontend="raw", mag_scale="none")
    batcher = make_train_batcher(mcfg, mixup_probability=0.25)
    wave = np.random.default_rng(0).normal(0, 0.3, (8, sr)).astype(np.float32)
    lab = np.eye(2, dtype=np.float32)[np.arange(8) % 2]
    x, _ = batcher(jax.random.key(0), wave, lab)
    assert x.shape == (8, sr, 1)


def test_loader_host_sharding(wav_dataset):
    """Shards iterate disjoint file subsets covering the whole list
    (multi-host input pipeline, SURVEY.md section 5.8)."""
    from birdnet_stm32_tpu.data.dataset import load_file_paths_from_directory, one_hot_labels
    from birdnet_stm32_tpu.data.pipeline import AudioLoader, LoaderConfig

    root, sr = wav_dataset
    paths, labels, classes = load_file_paths_from_directory(root)
    lcfg = LoaderConfig(sample_rate=4000, chunk_duration=1.0, num_classes=len(classes),
                        max_chunks_per_file=1, snr_threshold=0.0, seed=7)
    seen = []
    for shard in range(2):
        loader = AudioLoader(paths, one_hot_labels(labels, classes), lcfg,
                             batch_size=1, num_workers=0, shuffle=True,
                             infinite=False, shard_index=shard, num_shards=2)
        # Count samples drawn per shard (one chunk per file).
        n = sum(x.shape[0] for x, _ in loader)
        seen.append(n)
    assert sum(seen) == len(paths)
    assert all(n > 0 for n in seen)


@pytest.mark.integration
def test_process_pool_fifo_when_not_shuffled(wav_dataset):
    """shuffle=False + executor='process' must yield in SUBMISSION order
    regardless of worker completion order (deterministic validation
    loaders) — byte-identical to the thread executor's output."""
    root, sr = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    y = one_hot_labels(labels, class_names)
    cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=2,
                       max_chunks_per_file=2, random_offset=False, seed=1)

    def run(executor):
        loader = AudioLoader(paths, y, cfg, batch_size=2, num_workers=4,
                             shuffle=False, infinite=False, executor=executor,
                             files_per_task=1)
        xs = [xb for xb, _ in loader]
        return np.concatenate(xs)

    np.testing.assert_array_equal(run("process"), run("thread"))


@pytest.mark.slow
@pytest.mark.integration
def test_process_pool_pause_does_not_trip_watchdog(wav_dataset):
    """Pausing via loader_control max_inflight_files=0 for longer than
    worker_timeout, then resuming, must not raise the workers-dead
    RuntimeError (the pause is deliberate, not a hang)."""
    import threading
    import time as _time

    root, sr = wav_dataset
    paths, labels, class_names = load_file_paths_from_directory(root)
    y = one_hot_labels(labels, class_names)
    cfg = LoaderConfig(sample_rate=sr, chunk_duration=1.0, num_classes=2,
                       max_chunks_per_file=2, random_offset=False, seed=1)
    control = {"max_inflight_files": 0}  # start paused
    # worker_timeout must exceed the spawn-bootstrap time (workers re-import
    # numpy/jax — production default is 120 s); 6 s flaked on a fully loaded
    # single-core machine, so keep a 20 s budget and pause strictly longer.
    loader = AudioLoader(paths, y, cfg, batch_size=4, num_workers=2,
                         shuffle=False, infinite=False, executor="process",
                         worker_timeout=20.0, loader_control=control)

    def unpause():
        _time.sleep(24.0)  # pause strictly longer than worker_timeout
        control["max_inflight_files"] = 64

    threading.Thread(target=unpause, daemon=True).start()
    xb, yb = next(iter(loader))  # must not raise
    assert xb.shape == (4, sr)
