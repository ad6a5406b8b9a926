"""llama.cpp system routes against a local fake router-mode server
(reference api/routes/system.py:159-260, core/llama_cpp.py)."""

import threading

import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from tensortruth_tpu.app.config import ProviderConfig, TensorTruthTPUConfig
from tensortruth_tpu.core.providers import ProviderRegistry
from tensortruth_tpu.models.manager import ModelManager

pytestmark = pytest.mark.integration


@pytest.fixture(scope="module")
def fake_llama_cpp():
    """Fake llama.cpp router: /models list + load/unload state machine."""
    state = {"loaded": set()}

    async def models(request):
        return web.json_response(
            {
                "data": [
                    {
                        "id": "models/Qwen2.5-7B-Q4_K_M.gguf",
                        "status": {
                            "value": "loaded"
                            if "models/Qwen2.5-7B-Q4_K_M.gguf" in state["loaded"]
                            else "unloaded"
                        },
                        "in_cache": True,
                        "path": "/m/qwen.gguf",
                    }
                ]
            }
        )

    async def load(request):
        body = await request.json()
        if not body.get("model"):
            return web.json_response({}, status=400)
        state["loaded"].add(body["model"])
        return web.json_response({"success": True})

    async def unload(request):
        body = await request.json()
        state["loaded"].discard(body.get("model"))
        return web.json_response({"success": True})

    app = web.Application()
    app.router.add_get("/models", models)
    app.router.add_post("/models/load", load)
    app.router.add_post("/models/unload", unload)

    import asyncio

    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", 0)
    loop.run_until_complete(site.start())
    port = site._server.sockets[0].getsockname()[1]
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", state
    loop.call_soon_threadsafe(loop.stop)


@pytest.fixture
def client(tmp_path, monkeypatch, event_loop, fake_llama_cpp):
    base_url, _ = fake_llama_cpp
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    ModelManager.reset_instance()
    ProviderRegistry.reset_instance()
    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.use_fused_topk = False
    cfg.providers = [
        ProviderConfig(id="lcp", type="llama_cpp", base_url=base_url),
    ]

    from tensortruth_tpu.server.app import create_app

    app = create_app(data_dir=tmp_path, config=cfg)
    client = TestClient(TestServer(app, loop=event_loop), loop=event_loop)
    event_loop.run_until_complete(client.start_server())
    yield client
    event_loop.run_until_complete(client.close())
    ProviderRegistry.reset_instance()


async def test_status_lists_models_with_display_names(client):
    r = await client.get("/api/system/llama-cpp/status")
    assert r.status == 200
    body = await r.json()
    assert body["running"] is True
    assert body["models"][0]["display_name"] == "Qwen2.5 7B Q4 K M"
    assert body["models"][0]["status"] == "unloaded"


async def test_load_then_status_then_unload_roundtrip(client, fake_llama_cpp):
    _, state = fake_llama_cpp
    model = "models/Qwen2.5-7B-Q4_K_M.gguf"
    r = await client.post("/api/system/llama-cpp/load", json={"model": model})
    assert r.status == 200 and (await r.json())["success"] is True
    assert model in state["loaded"]

    r = await client.get("/api/system/llama-cpp/status")
    assert (await r.json())["models"][0]["status"] == "loaded"

    r = await client.post("/api/system/llama-cpp/unload", json={"model": model})
    assert r.status == 200
    assert model not in state["loaded"]


async def test_load_requires_model_param(client):
    r = await client.post("/api/system/llama-cpp/load", json={})
    assert r.status == 422


async def test_no_provider_configured_is_404_or_empty(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path / "noprov"))
    ModelManager.reset_instance()
    ProviderRegistry.reset_instance()
    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.use_fused_topk = False
    cfg.providers = []

    from tensortruth_tpu.server.app import create_app

    app = create_app(data_dir=tmp_path / "noprov", config=cfg)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        r = await client.get("/api/system/llama-cpp/status")
        body = await r.json()
        assert body == {"running": False, "models": [], "base_url": ""}
        r = await client.post(
            "/api/system/llama-cpp/load", json={"model": "x"}
        )
        assert r.status == 404
    finally:
        await client.close()
        ProviderRegistry.reset_instance()
