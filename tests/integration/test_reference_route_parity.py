"""Reference-path route parity: the exact endpoint paths the reference
frontend and scripted clients address (reference api/routes/documents.py
upload subroutes + catalog-modules + indexing-config, startup.py
embedding-models/*, pdfs.py legacy upload)."""

import asyncio
import json

import numpy as np
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


def _make_built_index(tmp_path, module_name: str, model_id="tiny-embedder"):
    """A minimal VALID module index dir (embeddings.npy + metadata)."""
    d = tmp_path / "indexes" / model_id / module_name
    d.mkdir(parents=True, exist_ok=True)
    np.save(d / "embeddings.npy", np.zeros((4, 8), dtype=np.float16))
    (d / "index_metadata.json").write_text(
        json.dumps({"embedding_model": model_id, "index_version": "1.0"})
    )
    return d


async def _new_project(client, **kw):
    r = await client.post("/api/projects", json={"name": "P", **kw})
    assert r.status == 200
    return (await r.json())["id"]


# -- catalog modules ---------------------------------------------------------


async def test_catalog_module_attach_validates_built_index(client, tmp_path):
    pid = await _new_project(client)
    r = await client.post(
        f"/api/projects/{pid}/catalog-modules", json={"module_name": "nope"}
    )
    assert r.status == 400  # no built index on disk

    _make_built_index(tmp_path, "library_demo")
    r = await client.post(
        f"/api/projects/{pid}/catalog-modules", json={"module_name": "library_demo"}
    )
    assert r.status == 201
    assert await r.json() == {"module_name": "library_demo", "status": "indexed"}

    # double attach conflicts (reference documents.py:899-909 → 409)
    r = await client.post(
        f"/api/projects/{pid}/catalog-modules", json={"module_name": "library_demo"}
    )
    assert r.status == 409

    r = await client.get(f"/api/projects/{pid}")
    assert (await r.json())["catalog_modules"] == {
        "library_demo": {"status": "indexed"}
    }


async def test_catalog_modules_merge_into_project_sessions(client, tmp_path):
    """Sessions created inside the project inherit catalog modules
    (reference ChatContext.from_session merges catalog + session modules)."""
    _make_built_index(tmp_path, "library_demo")
    pid = await _new_project(client, modules=["base_mod"])
    await client.post(
        f"/api/projects/{pid}/catalog-modules", json={"module_name": "library_demo"}
    )
    r = await client.post(f"/api/projects/{pid}/sessions", json={})
    session = await r.json()
    assert set(session["modules"]) == {"base_mod", "library_demo"}


async def test_catalog_module_detach(client, tmp_path):
    _make_built_index(tmp_path, "library_demo")
    pid = await _new_project(client)
    await client.post(
        f"/api/projects/{pid}/catalog-modules", json={"module_name": "library_demo"}
    )
    r = await client.delete(f"/api/projects/{pid}/catalog-modules/library_demo")
    assert r.status == 200
    assert await r.json() == {"module_name": "library_demo", "status": "removed"}
    r = await client.delete(f"/api/projects/{pid}/catalog-modules/library_demo")
    assert r.status == 404
    # unknown project → 404, not 500
    r = await client.post(
        "/api/projects/nope/catalog-modules", json={"module_name": "library_demo"}
    )
    assert r.status == 404


# -- indexing config ----------------------------------------------------------


async def test_indexing_config_roundtrip(client):
    pid = await _new_project(client)
    r = await client.get(f"/api/projects/{pid}/indexing-config")
    assert r.status == 200 and await r.json() == {}

    r = await client.patch(
        f"/api/projects/{pid}/indexing-config",
        json={"chunk_sizes": [1024, 256], "conversion_method": "direct"},
    )
    assert r.status == 200
    assert await r.json() == {
        "chunk_sizes": [1024, 256],
        "conversion_method": "direct",
    }
    r = await client.get(f"/api/projects/{pid}/indexing-config")
    assert (await r.json())["chunk_sizes"] == [1024, 256]

    r = await client.patch(
        f"/api/projects/{pid}/indexing-config",
        json={"conversion_method": "bogus"},
    )
    assert r.status == 400  # reference documents.py:707-710

    r = await client.get("/api/projects/nope/indexing-config")
    assert r.status == 404


async def test_indexing_config_change_drops_scope_index(client, tmp_path):
    """A real settings change deletes the built scope index so the next
    build is a full rebuild (reference documents.py:722-740)."""
    pid = await _new_project(client)
    r = await client.post(
        f"/api/projects/{pid}/documents/upload-text",
        json={"content": "chunking settings test " * 80, "filename": "a.md"},
    )
    assert r.status == 201

    services = client.server.app["services"]
    from tensortruth_tpu.app.paths import get_project_dir

    scope = get_project_dir(pid)
    assert services.document_service.index_exists(scope)

    await client.patch(
        f"/api/projects/{pid}/indexing-config", json={"chunk_sizes": [512, 128]}
    )
    assert not services.document_service.index_exists(scope)

    # patching the SAME value again is a no-op (no index to delete, 200)
    r = await client.patch(
        f"/api/projects/{pid}/indexing-config", json={"chunk_sizes": [512, 128]}
    )
    assert r.status == 200


# -- reference-named upload subroutes -----------------------------------------


async def test_upload_text_subroute_both_scopes(client):
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    pid = await _new_project(client)
    for scope in (f"sessions/{sid}", f"projects/{pid}"):
        r = await client.post(
            f"/api/{scope}/documents/upload-text",
            json={"content": "subroute upload text " * 60, "filename": "t.md"},
        )
        assert r.status == 201, scope
        data = await r.json()
        assert data["status"] == "success" and data["chunks"] > 0
        r = await client.get(f"/api/{scope}/documents")
        assert data["doc_id"] in (await r.json())["ids"]
    # empty content → schema 422
    r = await client.post(
        f"/api/sessions/{sid}/documents/upload-text", json={"content": ""}
    )
    assert r.status == 422


async def test_upload_subroute_rejects_non_pdf(client):
    """reference documents.py:542-544: /upload is PDF-only → 400."""
    import aiohttp

    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    form = aiohttp.FormData()
    form.add_field("file", b"not a pdf", filename="n.md", content_type="text/markdown")
    r = await client.post(f"/api/sessions/{sid}/documents/upload", data=form)
    assert r.status == 400


async def test_legacy_pdfs_post_route_exists(client):
    """reference pdfs.py POST /sessions/{id}/pdfs (legacy upload)."""
    import aiohttp

    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    form = aiohttp.FormData()
    form.add_field("file", b"x", filename="n.txt", content_type="text/plain")
    r = await client.post(f"/api/sessions/{sid}/pdfs", data=form)
    assert r.status == 400  # route resolves; PDF-only contract enforced


async def test_build_index_subroute_runs_as_task(client):
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    await client.post(
        f"/api/sessions/{sid}/documents/upload-text",
        json={"content": "build index task test " * 60, "filename": "b.md"},
    )
    r = await client.post(f"/api/sessions/{sid}/documents/build-index", json={})
    assert r.status == 200
    task_id = (await r.json())["task_id"]

    for _ in range(100):
        r = await client.get(f"/api/tasks/{task_id}")
        info = await r.json()
        if info["status"] in ("completed", "failed"):
            break
        await asyncio.sleep(0.1)
    assert info["status"] == "completed"
    assert info["result"] == {"documents": 1}


# -- startup embedding-model endpoints -----------------------------------------


async def test_startup_embedding_model_suggestions(client):
    r = await client.get("/api/startup/embedding-models/suggestions")
    assert r.status == 200
    data = await r.json()
    assert data["default"] == "tiny-embedder"
    names = [s["model_name"] for s in data["suggestions"]]
    assert "BAAI/bge-m3" in names and len(names) >= 3
    assert all(s["description"] for s in data["suggestions"])


async def test_startup_available_indexes_reference_path(client):
    r = await client.get("/api/startup/embedding-models/available-indexes")
    assert r.status == 200
    assert "indexes" in await r.json()
