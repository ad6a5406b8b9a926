"""Bundled SPA consistency: the single-file UI has no build step or JS test
runner in this environment, so these tests statically verify the contracts
that would break the page at runtime — every element id the script wires
must exist in the markup, every REST path it calls must resolve to a
registered route, and the page must ship all management panels
(reference frontend/src feature areas: providers, documents, modules,
config, system, extensions, MCP, startup)."""

import re
from pathlib import Path

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.models.manager import ModelManager

pytestmark = pytest.mark.integration

SPA = Path("tensortruth_tpu/static/index.html").read_text(encoding="utf-8")

PANELS = [
    "providers", "documents", "modules", "config",
    "system", "extensions", "mcp", "startup",
]


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


def test_every_wired_element_id_exists():
    wired = set(re.findall(r'\$\("([^"]+)"\)', SPA))
    defined = set(re.findall(r'id="([^"]+)"', SPA))
    missing = wired - defined
    assert not missing, f"JS wires ids missing from markup: {sorted(missing)}"


def test_all_management_panels_present():
    for p in PANELS:
        assert f'id="panel-{p}"' in SPA, f"panel-{p} missing"
        assert f'data-panel="{p}"' in SPA, f"tab for {p} missing"
    # each panel has a loader registered
    for p in PANELS:
        assert re.search(rf"\b{p}: load\w+Panel", SPA), f"no loader for {p}"


async def test_root_serves_spa_with_panels(client):
    r = await client.get("/")
    assert r.status == 200
    html = await r.text()
    for p in PANELS:
        assert f'id="panel-{p}"' in html


async def test_every_js_api_path_resolves(client):
    """Each api("...") literal (with template params substituted) must hit a
    registered route — not the SPA catch-all (which would return HTML)."""
    calls = set(re.findall(r'api\(\s*[`"]([^`"]+)[`"]', SPA))
    calls |= set(re.findall(r'fetch\("/api([^"]+)"', SPA))
    for path in sorted(calls):
        concrete = re.sub(r"\$\{[^}]+\}", "x", path)
        url = "/api" + concrete
        r = await client.request("GET", url)
        body = await r.text()
        # A JS-called path that falls through to the SPA catch-all means the
        # route does not exist server-side.
        assert not body.lstrip().startswith("<!DOCTYPE"), f"{url} fell to catch-all"
        assert r.status in (200, 400, 404, 405, 422), (url, r.status)


async def test_panel_backing_endpoints_return_expected_shapes(client):
    checks = {
        "/api/providers": "providers",
        "/api/modules": "modules",
        "/api/embedding-models": "models",
        "/api/rerankers": "rerankers",
        "/api/config": "rag",
        "/api/system/devices": "backend",
        "/api/system/rag/status": "embedder",
        "/api/extensions": "extensions",
        "/api/extensions/library": "catalog",
        "/api/mcp-servers": "servers",
        "/api/mcp-servers/presets": "presets",
        "/api/startup/status": "index_count",
        "/api/startup/available-indexes": "indexes",
    }
    for url, key in checks.items():
        r = await client.get(url)
        assert r.status == 200, (url, r.status)
        assert key in (await r.json()), (url, key)
