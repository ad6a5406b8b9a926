"""Path resolution + env overrides (reference app_utils/paths.py:150-256)."""

import os

import pytest

from tensortruth_tpu.app import paths


def test_env_data_dir_override(monkeypatch, tmp_path):
    monkeypatch.setenv(paths.ENV_DATA_DIR, str(tmp_path / "override"))
    assert str(paths.get_user_data_dir()) == str(tmp_path / "override")
    assert str(paths.get_base_indexes_dir()).startswith(str(tmp_path / "override"))
    assert str(paths.get_library_docs_dir()).startswith(str(tmp_path / "override"))


def test_session_and_project_layout(monkeypatch, tmp_path):
    monkeypatch.setenv(paths.ENV_DATA_DIR, str(tmp_path))
    s = paths.get_session_dir("abc123")
    p = paths.get_project_dir("p1")
    assert s == tmp_path / "sessions" / "abc123"
    assert p == tmp_path / "projects" / "p1"
    img = paths.get_session_images_dir("abc123")
    assert img == s / "images"
    assert img.is_dir()  # created on access


def test_specific_env_overrides_beat_data_dir(monkeypatch, tmp_path):
    monkeypatch.setenv(paths.ENV_DATA_DIR, str(tmp_path / "base"))
    for env, fn in [
        ("TENSOR_TRUTH_TPU_DOCS_DIR", paths.get_library_docs_dir),
        ("TENSOR_TRUTH_TPU_INDEXES_DIR", paths.get_base_indexes_dir),
    ]:
        monkeypatch.setenv(env, str(tmp_path / "specific"))
        assert str(fn()) == str(tmp_path / "specific")
        monkeypatch.delenv(env)
