"""Depth tests for startup checks and response-image localization —
the two service paths previously exercised only through broad
integration flows (reference services/startup_service.py:21-130,
routes/chat.py:51-92)."""

import json

import numpy as np
import pytest

from tensortruth_tpu.services.image_service import ImageService
from tensortruth_tpu.services.startup_service import StartupService


def _built_index(base, model_id, module):
    d = base / model_id / module
    d.mkdir(parents=True)
    np.save(d / "embeddings.npy", np.zeros((2, 4), np.float16))
    (d / "index_metadata.json").write_text(
        json.dumps({"embedding_model": model_id, "index_version": "1.0"})
    )
    return d


# -- startup service -----------------------------------------------------------


def test_startup_first_run_creates_config(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    status = StartupService().check_startup_status()
    assert status.first_run is True  # no config existed when checked
    assert status.config_ok is True
    assert (tmp_path / "config.yaml").exists()  # created on first run
    assert status.indexes_present is False and status.index_count == 0
    # second run: config now present
    assert StartupService().check_startup_status().first_run is False


def test_startup_counts_indexes_and_detects_model_mismatch(tmp_path, monkeypatch):
    """Indexes exist but none for the configured model → mismatch flag
    (reference startup_service embedding-model mismatch detection)."""
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.app.config import TensorTruthTPUConfig

    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"

    base = tmp_path / "indexes"
    _built_index(base, "other-model", "papers_x")
    status = StartupService(config=cfg).check_startup_status()
    assert status.embedding_model_mismatch is True
    assert status.indexes_present is False
    assert status.available_models == ["other-model"]

    _built_index(base, "tiny-embedder", "papers_y")
    status = StartupService(config=cfg).check_startup_status()
    assert status.embedding_model_mismatch is False
    assert status.indexes_present is True and status.index_count == 1


def test_startup_migrates_legacy_flat_layout(tmp_path, monkeypatch):
    """A flat indexes/{module} dir (pre-model-scoping) moves under the
    default model and is reported in ``migrated`` (reference
    indexing/migration.py + startup hook)."""
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.app.config import TensorTruthTPUConfig

    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"

    base = tmp_path / "indexes"
    legacy = base / "papers_old"
    legacy.mkdir(parents=True)
    np.save(legacy / "embeddings.npy", np.zeros((2, 4), np.float16))
    (legacy / "index_metadata.json").write_text(json.dumps({"index_version": "1.0"}))

    status = StartupService(config=cfg).check_startup_status()
    assert status.migrated == ["papers_old"]
    assert (base / "tiny-embedder" / "papers_old" / "embeddings.npy").exists()
    assert not legacy.exists()
    assert status.index_count == 1


def test_startup_migration_failure_never_blocks(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    import tensortruth_tpu.indexing.migration as migration

    def boom(base, model):
        raise RuntimeError("disk on fire")

    monkeypatch.setattr(migration, "migrate_legacy_indexes", boom)
    status = StartupService().check_startup_status()
    assert status.config_ok is True and status.migrated == []


# -- response image localization ------------------------------------------------


def test_localize_response_images_rewrites_and_keeps_failures(tmp_path, monkeypatch):
    """External image URLs in a response download to session storage and
    rewrite to local /api URLs; a failing URL stays untouched
    (reference routes/chat.py:51-92)."""
    svc = ImageService(images_dir_fn=lambda sid: tmp_path)
    png = b"\x89PNG\r\n\x1a\n" + b"localize-me"

    class FakeResponse:
        def __init__(self, ok):
            self.content = png
            self._ok = ok

        def raise_for_status(self):
            if not self._ok:
                raise RuntimeError("404")

    def fake_get(url, timeout=15):
        return FakeResponse(ok="good" in url)

    monkeypatch.setattr("requests.get", fake_get)
    md = (
        "Intro ![diagram](https://x.test/good.png) and "
        "![broken](https://x.test/bad.png) end."
    )
    out = svc.localize_response_images("sess1", md)
    assert "/api/sessions/sess1/images/" in out
    assert "https://x.test/bad.png" in out  # failure left as-is
    assert "https://x.test/good.png" not in out
    # the rewritten id actually serves
    image_id = out.split("/images/")[1].split(")")[0]
    assert svc.get_path("sess1", image_id).read_bytes() == png


def test_localize_ignores_non_image_and_relative_links(tmp_path, monkeypatch):
    svc = ImageService(images_dir_fn=lambda sid: tmp_path)
    calls = []
    monkeypatch.setattr(
        "requests.get", lambda url, timeout=15: calls.append(url) or 1 / 0
    )
    md = "A [link](https://x.test/page) and ![local](/assets/a.png)."
    assert svc.localize_response_images("s", md) == md
    assert calls == []  # plain links and relative images never fetched
