"""Tool-confirmation REST flow over the real app (reference
api/routes/tool_confirmations.py:19-60 + services/tool_confirmation_service.py):
a tool parks on a confirmation id, the UI approves/rejects via REST, the
waiting coroutine resumes with the decision."""

import asyncio

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

    from tensortruth_tpu.server.app import create_app

    app = create_app(data_dir=tmp_path, config=cfg)
    client = TestClient(TestServer(app, loop=event_loop), loop=event_loop)
    event_loop.run_until_complete(client.start_server())
    yield client
    event_loop.run_until_complete(client.close())


def _svc(client):
    return client.server.app["services"].confirmation_service


async def test_get_pending_confirmation(client):
    conf = _svc(client).create("manage_mcp_server", "Install server X", {"name": "x"})
    r = await client.get(f"/api/tool-confirmations/{conf.id}")
    assert r.status == 200
    body = await r.json()
    assert body["tool_name"] == "manage_mcp_server"
    assert body["payload"] == {"name": "x"}
    assert body["decision"] is None


async def test_get_unknown_confirmation_404(client):
    r = await client.get("/api/tool-confirmations/nope123")
    assert r.status == 404


async def test_approve_resumes_waiter(client):
    svc = _svc(client)
    conf = svc.create("manage_mcp_server", "Install server X")
    waiter = asyncio.ensure_future(svc.wait(conf.id, timeout=5.0))
    await asyncio.sleep(0)  # let the waiter park on the event

    r = await client.post(f"/api/tool-confirmations/{conf.id}/approve")
    assert r.status == 200
    assert (await r.json())["status"] == "approved"
    assert await waiter == "approved"

    # second decision on the same id is rejected with 404
    r = await client.post(f"/api/tool-confirmations/{conf.id}/reject")
    assert r.status == 404


async def test_reject_resumes_waiter(client):
    svc = _svc(client)
    conf = svc.create("manage_mcp_server", "Remove server Y")
    waiter = asyncio.ensure_future(svc.wait(conf.id, timeout=5.0))
    await asyncio.sleep(0)

    r = await client.post(f"/api/tool-confirmations/{conf.id}/reject")
    assert r.status == 200
    assert await waiter == "rejected"


async def test_wait_timeout_defaults_to_rejected(client):
    svc = _svc(client)
    conf = svc.create("manage_mcp_server", "never decided")
    assert await svc.wait(conf.id, timeout=0.01) == "rejected"
    # a timed-out confirmation can no longer be approved
    r = await client.post(f"/api/tool-confirmations/{conf.id}/approve")
    assert r.status == 404
