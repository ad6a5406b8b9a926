"""Typed request-schema contract: 422 with FastAPI-shaped detail on bad
payloads, 400 on malformed JSON (reference api/schemas/* behavior)."""

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.models.manager import ModelManager

pytestmark = pytest.mark.integration


@pytest.fixture
def client(tmp_path, monkeypatch, event_loop):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    ModelManager.reset_instance()
    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.default_reranker = "tiny-reranker"
    cfg.rag.use_fused_topk = False

    from tensortruth_tpu.server.app import create_app

    app = create_app(data_dir=tmp_path, config=cfg)
    client = TestClient(TestServer(app, loop=event_loop), loop=event_loop)
    event_loop.run_until_complete(client.start_server())
    yield client
    event_loop.run_until_complete(client.close())


async def test_malformed_json_is_400_not_500(client):
    r = await client.post(
        "/api/sessions", data=b"{not json", headers={"Content-Type": "application/json"}
    )
    assert r.status == 400
    assert "malformed JSON" in (await r.json())["detail"]


async def test_project_requires_name_with_structured_detail(client):
    r = await client.post("/api/projects", json={"description": "no name"})
    assert r.status == 422
    detail = (await r.json())["detail"]
    assert any("name" in err["loc"] for err in detail)
    assert all({"loc", "msg", "type"} <= set(err) for err in detail)


async def test_wrong_types_rejected(client):
    r = await client.post("/api/sessions", json={"modules": "not-a-list"})
    assert r.status == 422
    r = await client.post("/api/sessions", json={"title": 42})
    assert r.status == 422


async def test_unknown_fields_ignored_like_reference(client):
    r = await client.post("/api/sessions", json={"title": "ok", "bogus_field": 1})
    assert r.status == 200
    assert (await r.json())["title"] == "ok"


async def test_message_role_enum_enforced(client):
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    r = await client.post(
        f"/api/sessions/{sid}/messages", json={"role": "wizard", "content": "x"}
    )
    assert r.status == 422


async def test_provider_type_enum_enforced(client):
    r = await client.post(
        "/api/providers", json={"id": "p1", "type": "carrier-pigeon"}
    )
    assert r.status == 422
    r = await client.post(
        "/api/providers", json={"id": "p1", "type": "ollama", "base_url": "http://x"}
    )
    assert r.status == 200


async def test_config_patch_rejects_unknown_section(client):
    r = await client.patch("/api/config", json={"not_a_section": {}})
    assert r.status == 422
    r = await client.patch("/api/config", json={"rag": {"default_top_n": 7}})
    assert r.status == 200
    assert (await r.json())["rag"]["default_top_n"] == 7


async def test_config_patch_rejects_non_object(client):
    r = await client.patch("/api/config", json=["not", "an", "object"])
    assert r.status == 422


async def test_document_ingest_requires_source(client):
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    r = await client.post(f"/api/sessions/{sid}/documents", json={})
    assert r.status == 422


async def test_non_object_body_is_422(client):
    """Regression: a JSON array/string body must 422, not silently validate
    as an empty object with all defaults."""
    r = await client.post("/api/sessions", json=[1, 2, 3])
    assert r.status == 422
    detail = (await r.json())["detail"]
    assert detail[0]["msg"] == "body must be a JSON object"
    r = await client.post("/api/sessions", json="just a string")
    assert r.status == 422


async def test_config_save_roundtrip_includes_catalog_url(client):
    """Regression: the console PATCHes the full GET /api/config object back,
    which includes the top-level extension_catalog_url key — must not 422."""
    r = await client.get("/api/config")
    cfg = await r.json()
    assert "extension_catalog_url" in cfg
    r = await client.patch("/api/config", json=cfg)
    assert r.status == 200


async def test_patch_with_explicit_null_clears_field(client):
    """Regression: exclude_none dropped explicit nulls, so un-assigning a
    session from a project was silently impossible (exclude_unset now)."""
    r = await client.post("/api/projects", json={"name": "P"})
    pid = (await r.json())["id"]
    r = await client.post(f"/api/projects/{pid}/sessions", json={})
    sid = (await r.json())["id"]
    assert (await r.json())["project_id"] == pid

    r = await client.patch(f"/api/sessions/{sid}", json={"project_id": None})
    assert r.status == 200
    assert (await r.json())["project_id"] is None


async def test_provider_timeout_and_capabilities_roundtrip(client):
    """Regression: ProviderCreate dropped timeout/default_capabilities."""
    r = await client.post(
        "/api/providers",
        json={"id": "slowbox", "type": "openai_compatible",
              "base_url": "http://localhost:9", "timeout": 600,
              "default_capabilities": ["tools"]},
    )
    assert r.status == 200, await r.text()
    r = await client.get("/api/providers")
    p = next(p for p in (await r.json())["providers"] if p["id"] == "slowbox")
    assert p["timeout"] == 600
    assert p["default_capabilities"] == ["tools"]
