"""Settings layering: defaults, TOML flattening, env overrides."""

import os

from semcode_tpu.settings import AppSettings, load_settings


def test_defaults():
    s = AppSettings()
    assert s.index_nlist == 128 and s.index_nprobe == 16  # Milvus parity defaults
    assert s.embedding_provider == "tpu-hash"
    assert s.chunk_max_lines == 200 and s.chunk_max_chars == 6000
    assert s.rag_max_context_sources == 5


def test_toml_flattening(tmp_path, monkeypatch):
    cfg = tmp_path / "settings.toml"
    cfg.write_text(
        """
[workspace]
root = "/tmp/myws"

[general]
api_key = "sekrit"
telemetry_enabled = false

[embedding]
provider = "tpu-encoder"
dimension = 768

[index]
kind = "ivf"
nlist = 256
nprobe = 32

[rag]
provider = "openai"
model = "gpt-4o-mini"
max_context_sources = 9

[providers]
openai_api_key = "sk-test-123"
"""
    )
    monkeypatch.setenv("SEMCODE_CONFIG_PATH", str(cfg))
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    s = load_settings()
    assert str(s.workspace_root) == "/tmp/myws"
    assert s.api_key == "sekrit" and s.telemetry_enabled is False
    assert s.embedding_provider == "tpu-encoder" and s.embedding_dimension == 768
    assert s.index_kind == "ivf" and s.index_nlist == 256 and s.index_nprobe == 32
    assert s.rag_model == "gpt-4o-mini" and s.rag_max_context_sources == 9
    assert os.environ["OPENAI_API_KEY"] == "sk-test-123"


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("SEMCODE_API_PORT", "9999")
    monkeypatch.setenv("SEMCODE_TELEMETRY_ENABLED", "false")
    monkeypatch.setenv("SEMCODE_EMBEDDING_PROVIDER", "tpu-hash")
    monkeypatch.setenv("SEMCODE_RAG_TEMPERATURE", "0.5")
    s = load_settings()
    assert s.api_port == 9999
    assert s.telemetry_enabled is False
    assert s.rag_temperature == 0.5


def test_blank_toml_values_become_none(tmp_path, monkeypatch):
    cfg = tmp_path / "s.toml"
    cfg.write_text('[general]\napi_key = ""\n')
    monkeypatch.setenv("SEMCODE_CONFIG_PATH", str(cfg))
    assert load_settings().api_key is None
