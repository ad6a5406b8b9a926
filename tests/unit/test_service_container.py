"""ServiceContainer DI wiring (reference api/deps.py:36-196 analog)."""

import pytest

from tensortruth_tpu.server.deps import ServiceContainer


@pytest.fixture
def container(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    return ServiceContainer(data_dir=tmp_path)


def test_lazy_singletons_are_cached(container):
    assert container.rag_service is container.rag_service
    assert container.session_service is container.session_service
    assert container.project_service is container.project_service
    assert container.task_runner is container.task_runner
    assert container.command_registry is container.command_registry
    assert container.tool_service is container.tool_service


def test_data_dir_env_applied(tmp_path, monkeypatch):
    monkeypatch.delenv("TENSOR_TRUTH_TPU_DATA_DIR", raising=False)
    c = ServiceContainer(data_dir=tmp_path / "custom")
    assert str(c.data_dir).startswith(str(tmp_path / "custom"))


def test_reload_config_reflects_disk_changes(container, tmp_path):
    from tensortruth_tpu.app.config import save_config

    cfg = container.config
    cfg.llm.default_temperature = 0.123
    save_config(cfg)
    container.config.llm.default_temperature = 0.9  # in-memory divergence
    reloaded = container.reload_config()
    assert reloaded.llm.default_temperature == 0.123
    assert container.config is reloaded


def test_document_service_shares_session_service(container):
    ds = container.document_service
    assert ds is container.document_service
