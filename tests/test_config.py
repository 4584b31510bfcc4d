"""ModelConfig contract tests: validation, JSON round-trip, legacy tolerance."""

import json

import pytest

from birdnet_stm32_tpu.config import ModelConfig, normalize_frontend_name


def test_defaults_valid():
    cfg = ModelConfig()
    assert cfg.audio_frontend == "hybrid"
    assert cfg.chunk_samples == 72000
    assert cfg.fft_bins == 257


def test_roundtrip(tmp_path):
    cfg = ModelConfig(num_classes=3, class_names=["a", "b", "c"], sample_rate=22050)
    p = tmp_path / "cfg.json"
    cfg.save(p)
    loaded = ModelConfig.load(p)
    assert loaded == cfg


def test_legacy_unknown_keys_dropped(tmp_path):
    data = ModelConfig().to_dict()
    data["some_future_field"] = 42
    p = tmp_path / "legacy.json"
    p.write_text(json.dumps(data))
    cfg = ModelConfig.load(p)
    assert not hasattr(cfg, "some_future_field")


def test_loads_reference_shipped_config():
    """The shipped reference sidecar JSON must load unchanged."""
    path = "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json"
    cfg = ModelConfig.load(path)
    assert cfg.sample_rate == 22050
    assert cfg.audio_frontend == "hybrid"
    assert cfg.mag_scale == "pwl"
    assert cfg.num_classes == 100
    assert len(cfg.class_names) == 100
    assert cfg.compute_hop_length() == 258
    assert cfg.hop_length == 258  # shipped value preserved, no healing
    assert cfg.input_shape() == (257, 256, 1)


def test_hop_length_computed_from_geometry():
    """hop_length follows chunk_samples // spec_width at any rate (the
    reference computes + persists it at train time, cli/train.py:324,449
    there); the static-281 default only ever matched 24 kHz/3 s/256."""
    assert ModelConfig().hop_length == 281
    assert ModelConfig(sample_rate=22050).hop_length == 258
    assert ModelConfig(sample_rate=48000, chunk_duration=2.0).hop_length == 375


def test_hop_length_stale_sidecar_healed(tmp_path):
    """A sidecar carrying the 24 kHz default hop at a different rate (what
    this repo wrote before round 4) loads with a warning and a corrected
    value, so downstream consumers (headers, conversion) stay consistent."""
    data = ModelConfig(sample_rate=22050).to_dict()
    data["hop_length"] = 281  # stale
    p = tmp_path / "stale.json"
    p.write_text(json.dumps(data))
    with pytest.warns(UserWarning, match="hop_length=281"):
        cfg = ModelConfig.load(p)
    assert cfg.hop_length == 258
    # Re-saving repairs the file permanently.
    cfg.save(p)
    assert json.loads(p.read_text())["hop_length"] == 258


@pytest.mark.parametrize("field,value", [
    ("sample_rate", 0), ("num_mels", -1), ("audio_frontend", "bogus"),
    ("mag_scale", "loud"), ("dropout_rate", 1.0), ("depth_multiplier", 0),
])
def test_validation_rejects(field, value):
    with pytest.raises(ValueError):
        ModelConfig(**{field: value})


def test_class_names_length_mismatch():
    with pytest.raises(ValueError):
        ModelConfig(num_classes=2, class_names=["only_one"])


def test_frontend_aliases():
    with pytest.warns(DeprecationWarning):
        assert normalize_frontend_name("precomputed") == "librosa"
    with pytest.warns(DeprecationWarning):
        assert normalize_frontend_name("tf") == "raw"
    with pytest.warns(DeprecationWarning):
        assert ModelConfig(audio_frontend="precomputed").audio_frontend == "librosa"
    with pytest.raises(ValueError):
        normalize_frontend_name("nope")
