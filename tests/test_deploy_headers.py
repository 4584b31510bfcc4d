"""Firmware header generation tests (reference gen_app_config.py contract)."""

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.deploy.headers import (
    generate_app_config_h,
    generate_app_labels_h,
    write_headers,
)


def cfg(**kw):
    base = dict(sample_rate=22050, num_mels=64, spec_width=256, fft_length=512,
                chunk_duration=3.0, embeddings_size=256,
                num_classes=3, class_names=["a", "b", "c"],
                audio_frontend="hybrid", mag_scale="pwl")
    base.update(kw)
    return ModelConfig(**base)


def test_app_config_defines():
    h = generate_app_config_h(cfg())
    for needle in (
        "#define APP_SAMPLE_RATE       22050",
        "#define APP_CHUNK_DURATION    3",          # integer literal for whole seconds
        "#define APP_CHUNK_SAMPLES     66150",
        "#define APP_FFT_LENGTH        512",
        "#define APP_HOP_LENGTH        258",
        "#define APP_SPEC_WIDTH        256",
        "#define APP_NUM_MELS          64",
        "#define APP_NUM_CLASSES       3",
        "#define APP_AUDIO_FRONTEND        APP_FRONTEND_HYBRID",
        "#ifndef APP_CONFIG_H",
    ):
        assert needle in h, needle


def test_frontend_mapping_and_float_duration():
    h = generate_app_config_h(cfg(audio_frontend="librosa", chunk_duration=2.5,
                                  sample_rate=24000))
    assert "APP_FRONTEND_PRECOMPUTED" in h
    assert "#define APP_CHUNK_DURATION    2.5" in h
    h = generate_app_config_h(cfg(audio_frontend="raw", sample_rate=24000,
                                  chunk_duration=2.0))
    assert "APP_AUDIO_FRONTEND        APP_FRONTEND_RAW" in h


def test_labels_header_escaping():
    h = generate_app_labels_h(['Corvus "crow"', "back\\slash", "plain"])
    assert '"Corvus \\"crow\\""' in h
    assert '"back\\\\slash"' in h
    assert "#define APP_NUM_CLASSES_ACTUAL 3" in h


def test_write_headers(tmp_path):
    p1, p2 = write_headers(cfg(), ["a", "b", "c"], tmp_path)
    assert p1.read_text().startswith("/* Auto-generated")
    assert "APP_LABELS[]" in p2.read_text()


def test_header_hop_agrees_with_reference_firmware_read(tmp_path):
    """The generated APP_HOP_LENGTH and a simulated reference
    gen_app_config.py:36 read of the SAME sidecar must agree — this is the
    ModelConfig-interchangeability contract the stale-281 bug broke."""
    import json
    import re

    c = cfg()  # 22.05 kHz / 3 s / 256 frames
    sidecar = tmp_path / "model_config.json"
    c.save(sidecar)
    # What the reference's firmware header generator would read:
    model_cfg = json.loads(sidecar.read_text())
    ref_hop = int(model_cfg.get("hop_length", c.fft_length // 2 + 2))
    assert ref_hop == 66150 // 256 == 258
    h = generate_app_config_h(c)
    ours = int(re.search(r"#define APP_HOP_LENGTH\s+(\d+)", h).group(1))
    assert ours == ref_hop


def test_reference_generator_on_our_sidecar(tmp_path):
    """Run the REFERENCE's own firmware header generator on a sidecar this
    framework writes and diff the audio #defines against ours — the
    end-to-end form of the interchangeability contract (no reference code
    is vendored; the installed reference tree is executed directly)."""
    import importlib.util
    import json
    import re
    from pathlib import Path

    import pytest

    ref = Path("/root/reference/firmware/gen_app_config.py")
    if not ref.exists():
        pytest.skip("reference tree not present")
    spec = importlib.util.spec_from_file_location("ref_gen_app_config", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    c = cfg()  # 22.05 kHz / 3 s / 256 frames -> hop 258
    sidecar = tmp_path / "model_config.json"
    c.save(sidecar)
    theirs = mod.generate_app_config_h(json.loads(sidecar.read_text()),
                                       num_classes=c.num_classes)
    ours = generate_app_config_h(c)

    def defines(text):
        return dict(re.findall(r"#define (APP_\w+)\s+(\S+)", text))

    d_ref, d_ours = defines(theirs), defines(ours)
    for key in ("APP_SAMPLE_RATE", "APP_CHUNK_DURATION", "APP_CHUNK_SAMPLES",
                "APP_FFT_LENGTH", "APP_HOP_LENGTH", "APP_SPEC_WIDTH",
                "APP_NUM_MELS", "APP_NUM_CLASSES", "APP_AUDIO_FRONTEND"):
        assert key in d_ref and key in d_ours, key
        assert d_ref[key] == d_ours[key], (
            f"{key}: reference generator read {d_ref[key]!r} from our "
            f"sidecar, our generator emitted {d_ours[key]!r}")


def test_undeployable_frontend_rejected():
    """mfcc/log_mel have no firmware mode (the device would feed plain mel
    to a DCT/log1p-trained model) — header generation must fail loudly."""
    import pytest

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.deploy.headers import generate_app_config_h

    for fe in ("mfcc", "log_mel"):
        cfg = ModelConfig(num_classes=3, class_names=list("abc"),
                          audio_frontend=fe)
        with pytest.raises(ValueError, match="no firmware mode"):
            generate_app_config_h(cfg)
