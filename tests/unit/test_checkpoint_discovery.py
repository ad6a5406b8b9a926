"""Offline checkpoint/tokenizer discovery (reference model_manager.py:254-337
downloads from the Hub at runtime; this engine reads only local disk)."""

import numpy as np
import pytest

from tensortruth_tpu.models.manager import (
    ModelManager,
    ModelSpec,
    discover_checkpoint,
)


@pytest.fixture
def fake_hub(tmp_path, monkeypatch):
    """A hub-cache layout + a plain models dir with a convertible tiny model."""
    monkeypatch.delenv("HF_HUB_CACHE", raising=False)
    monkeypatch.delenv("HF_HOME", raising=False)
    monkeypatch.setenv("TENSOR_TRUTH_TPU_MODELS_DIR", str(tmp_path / "models"))
    return tmp_path


def test_discovery_misses_cleanly(fake_hub, monkeypatch):
    monkeypatch.setenv("HF_HUB_CACHE", str(fake_hub / "nonexistent-hub"))
    assert discover_checkpoint("BAAI/bge-m3") == (None, None)


def test_plain_dir_discovery(fake_hub):
    d = fake_hub / "models" / "bge-m3"
    d.mkdir(parents=True)
    (d / "model.safetensors").write_bytes(b"x")
    (d / "tokenizer.json").write_text("{}")
    mdir, tok = discover_checkpoint("BAAI/bge-m3")
    assert mdir == str(d) and tok == str(d / "tokenizer.json")


def test_hub_cache_snapshot_discovery(fake_hub, monkeypatch):
    hub = fake_hub / "hub"
    snap = hub / "models--BAAI--bge-m3" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    (snap / "model.safetensors").write_bytes(b"x")
    monkeypatch.setenv("HF_HUB_CACHE", str(hub))
    monkeypatch.delenv("TENSOR_TRUTH_TPU_MODELS_DIR", raising=False)
    mdir, tok = discover_checkpoint("BAAI/bge-m3")
    assert mdir == str(snap) and tok is None


def test_tokenizer_only_discovery(fake_hub, monkeypatch):
    monkeypatch.setenv("HF_HUB_CACHE", str(fake_hub / "nonexistent-hub"))
    d = fake_hub / "models" / "bge-m3"
    d.mkdir(parents=True)
    (d / "tokenizer.json").write_text("{}")
    mdir, tok = discover_checkpoint("BAAI/bge-m3")
    assert mdir is None and tok == str(d / "tokenizer.json")


def test_manager_warns_on_fallback_tokenizer(fake_hub, monkeypatch, caplog):
    monkeypatch.setenv("HF_HUB_CACHE", str(fake_hub / "nonexistent-hub"))
    import logging

    ModelManager.reset_instance()
    mgr = ModelManager.get_instance()
    spec = ModelManager._resolve_spec(ModelSpec("BAAI/bge-m3"))
    assert spec.tokenizer_path is None
    with caplog.at_level(logging.WARNING):
        ModelManager._warn_if_degraded(spec, "embedder")
    assert any("SimpleTokenizer" in r.message for r in caplog.records)


def test_tiny_models_skip_discovery_and_warning(caplog):
    import logging

    spec = ModelManager._resolve_spec(ModelSpec("tiny-embedder"))
    assert spec.local_dir is None
    with caplog.at_level(logging.WARNING):
        ModelManager._warn_if_degraded(spec, "embedder")
    assert not caplog.records
