"""Layered Config: CLI > env > user config file > defaults (ADR-0011)."""

import json

import pytest

from floodsr_tpu.config import Config, default_config_path, load_config

pytestmark = pytest.mark.unit


class TestLoadConfig:
    def test_package_defaults(self, tmp_path):
        cfg = load_config(config_fp=tmp_path / "missing.json", environ={})
        assert cfg == Config()
        assert cfg.compute_dtype == "float32"
        assert cfg.output_transfer == "uint16"
        assert cfg.max_batch == 8

    def test_user_config_file(self, tmp_path):
        fp = tmp_path / "config.json"
        fp.write_text(json.dumps({"max_batch": 16, "window_method": "hard"}))
        cfg = load_config(config_fp=fp, environ={})
        assert cfg.max_batch == 16
        assert cfg.window_method == "hard"

    def test_env_overrides_file(self, tmp_path):
        fp = tmp_path / "config.json"
        fp.write_text(json.dumps({"max_batch": 16}))
        cfg = load_config(
            config_fp=fp, environ={"FLOODSR_MAX_BATCH": "4", "FLOODSR_COMPUTE_DTYPE": "bfloat16"}
        )
        assert cfg.max_batch == 4
        assert cfg.compute_dtype == "bfloat16"

    def test_cli_overrides_env(self, tmp_path):
        cfg = load_config(
            {"max_batch": 2},
            config_fp=tmp_path / "missing.json",
            environ={"FLOODSR_MAX_BATCH": "4"},
        )
        assert cfg.max_batch == 2

    def test_none_cli_values_dont_override(self, tmp_path):
        cfg = load_config(
            {"cache_dir": None},
            config_fp=tmp_path / "missing.json",
            environ={"FLOODSR_CACHE_DIR": "/data/cache"},
        )
        assert cfg.cache_dir == "/data/cache"

    def test_unknown_file_key_rejected(self, tmp_path):
        fp = tmp_path / "config.json"
        fp.write_text(json.dumps({"bogus": 1}))
        with pytest.raises(ValueError, match="unknown config keys"):
            load_config(config_fp=fp, environ={})

    def test_unknown_override_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="unknown config override"):
            load_config({"bogus": 1}, config_fp=tmp_path / "m.json", environ={})

    @pytest.mark.parametrize(
        "field,value",
        [
            ("compute_dtype", "fp8"),
            ("output_transfer", "int4"),
            ("window_method", "blend"),
            ("output_compress", "jpeg"),
            ("max_batch", 0),
        ],
    )
    def test_invalid_values_rejected(self, tmp_path, field, value):
        with pytest.raises(ValueError):
            load_config({field: value}, config_fp=tmp_path / "m.json", environ={})

    def test_config_file_env_override_path(self, tmp_path, monkeypatch):
        fp = tmp_path / "alt.json"
        monkeypatch.setenv("FLOODSR_CONFIG_FILE", str(fp))
        assert default_config_path() == fp
