"""Deploy/serving config resolution tests (reference tests/test_deploy_config.py
semantics: precedence CLI > env > file, JSON/TOML dual format, validation).
"""

import json

import pytest

from birdnet_stm32_tpu.deploy.config import DeployConfig, resolve_deploy_config


def test_defaults():
    cfg = resolve_deploy_config(search_dir="/nonexistent_dir_xyz")
    assert cfg.batch_size == 64
    assert cfg.top_k == 3
    assert cfg.use_int8 is True


def test_json_file(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"batch_size": 128, "top_k": 5, "custom_key": "x"}))
    cfg = resolve_deploy_config(config_file=p)
    assert cfg.batch_size == 128
    assert cfg.top_k == 5
    assert cfg.extra == {"custom_key": "x"}


def test_toml_file_with_serving_table(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text('top_k = 4\n[serving]\nbatch_size = 256\nuse_int8 = false\n')
    cfg = resolve_deploy_config(config_file=p)
    assert cfg.batch_size == 256
    assert cfg.top_k == 4
    assert cfg.use_int8 is False


def test_cross_format_fallback(tmp_path):
    """A JSON payload in a .toml file still parses (reference config.py:109-135)."""
    p = tmp_path / "c.toml"
    p.write_text(json.dumps({"batch_size": 32}))
    assert resolve_deploy_config(config_file=p).batch_size == 32


def test_env_overrides_file(tmp_path, monkeypatch):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"batch_size": 128}))
    monkeypatch.setenv("BIRDNET_TPU_BATCH_SIZE", "16")
    monkeypatch.setenv("BIRDNET_TPU_USE_INT8", "false")
    cfg = resolve_deploy_config(config_file=p)
    assert cfg.batch_size == 16
    assert cfg.use_int8 is False


def test_cli_overrides_env(tmp_path, monkeypatch):
    monkeypatch.setenv("BIRDNET_TPU_TOP_K", "9")
    cfg = resolve_deploy_config(cli_values={"top_k": 2, "batch_size": None},
                                search_dir=str(tmp_path))
    assert cfg.top_k == 2
    assert cfg.batch_size == 64  # None CLI values are ignored


def test_default_file_search(tmp_path):
    (tmp_path / "birdnet_tpu.json").write_text(json.dumps({"top_k": 7}))
    assert resolve_deploy_config(search_dir=tmp_path).top_k == 7


def test_validation():
    with pytest.raises(ValueError):
        resolve_deploy_config(cli_values={"batch_size": 0}, search_dir="/none")
    with pytest.raises(FileNotFoundError):
        resolve_deploy_config(cli_values={"model_path": "/no/such/model"},
                              search_dir="/none")
    with pytest.raises(FileNotFoundError):
        resolve_deploy_config(config_file="/no/such/config.json")


def test_dataclass_direct():
    cfg = DeployConfig(batch_size=8)
    cfg.validate()
    with pytest.raises(ValueError):
        DeployConfig(top_k=0).validate()
