"""Path-traversal and injection hardening for the aiohttp surface.

aiohttp decodes %2F inside match_info values (unlike Starlette), so every
path parameter must be validated before any filesystem join. These tests
drive the real app with hostile encoded ids.
"""

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


TRAVERSALS = [
    "..%2F..%2F..%2Fetc%2Fpasswd",
    "%2e%2e%2f%2e%2e%2fetc%2fpasswd",
    "..",
    ".%2e",
    "..%5c..%5cwindows",
]


async def test_image_route_rejects_traversal(client, tmp_path):
    secret = tmp_path / "secret.txt"
    secret.write_text("sensitive")
    r = await client.post("/api/sessions", json={"title": "s"})
    sid = (await r.json())["id"]
    for evil in TRAVERSALS:
        r = await client.get(
            f"/api/sessions/{sid}/images/{evil}", allow_redirects=False
        )
        assert r.status in (400, 404), (evil, r.status)
        if r.status == 200:  # pragma: no cover - belt and braces
            assert "sensitive" not in await r.text()


async def test_session_delete_rejects_traversal(client, tmp_path):
    victim = tmp_path / "projects"
    victim.mkdir(exist_ok=True)
    (victim / "keep.txt").write_text("keep")
    r = await client.delete("/api/sessions/..%2Fprojects", allow_redirects=False)
    assert r.status in (400, 404)
    assert (victim / "keep.txt").exists()


async def test_document_routes_reject_traversal(client):
    r = await client.get("/api/sessions/..%2F..%2Fetc/documents")
    assert r.status in (400, 404)
    r = await client.delete("/api/sessions/sid/documents/..%2F..%2Fconfig.yaml")
    assert r.status in (400, 404)


async def test_model_id_with_org_slash_is_allowed(client):
    # model_id legitimately contains one '/': deleting an unknown model must
    # 404 (validated, looked up), never 400 (rejected) or traversal.
    r = await client.delete("/api/rerankers/BAAI/bge-reranker-v2-m3")
    assert r.status in (200, 404)
    r = await client.delete("/api/rerankers/..%2F..%2Fetc")
    assert r.status == 400


async def test_valid_ids_still_work(client):
    r = await client.post("/api/sessions", json={"title": "ok"})
    sid = (await r.json())["id"]
    r = await client.get(f"/api/sessions/{sid}")
    assert r.status == 200


async def test_static_assets_allow_nested_paths_but_not_traversal(client):
    """Regression: the param middleware rejected any nested static asset
    path (aiohttp binds them to 'filename'); nested paths must pass the
    middleware while traversal still dies."""
    # nested path reaches the static handler (404 = no such file, NOT 400)
    r = await client.get("/assets/sub/app.css")
    assert r.status in (403, 404), r.status
    # leading underscore / dot segments (bundler output) also pass
    r = await client.get("/assets/_chunks/x.js")
    assert r.status in (403, 404)
    # traversal is still rejected before any filesystem touch
    r = await client.get("/assets/..%2F..%2Fetc%2Fpasswd")
    assert r.status in (400, 403, 404)
    body = await r.read()
    assert b"root:" not in body


async def test_extension_uninstall_rejects_traversal(client):
    r = await client.delete("/api/extensions/commands/..%2F..%2Fconfig.yaml")
    assert r.status in (400, 404)
    # aiohttp normalizes the decoded ".." during routing → 405 on the
    # parent path; any of these means the loader was never reached
    r = await client.delete("/api/extensions/commands/%2e%2e")
    assert r.status in (400, 404, 405)
