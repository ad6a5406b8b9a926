"""MCP clients: stdio against our own web_tools_server (dogfooding), SSE and
streamable-HTTP against local aiohttp fixture servers, and per-server status
surfacing (VERDICT r3 item 5: the reference connects SSE/url servers,
server_registry.py:147-152; a bad transport must show an error, not silently
load zero tools)."""

import asyncio
import json
import sys
import time

import pytest

from tensortruth_tpu.agents.mcp_client import (
    MCPSSEClient,
    MCPStdioClient,
    MCPStreamableHTTPClient,
    load_mcp_tools,
    resolve_env,
    validate_server_config,
)

ECHO_TOOL = {
    "name": "echo",
    "description": "echo back",
    "inputSchema": {"type": "object", "properties": {"text": {"type": "string"}}},
}


def _rpc_result(rid, result):
    return {"jsonrpc": "2.0", "id": rid, "result": result}


def _handle_rpc(msg):
    """Minimal MCP server logic shared by both HTTP fixtures."""
    method = msg.get("method")
    if method == "initialize":
        return _rpc_result(msg["id"], {
            "protocolVersion": "2024-11-05",
            "serverInfo": {"name": "fixture", "version": "0"},
            "capabilities": {},
        })
    if method == "tools/list":
        return _rpc_result(msg["id"], {"tools": [ECHO_TOOL]})
    if method == "tools/call":
        text = msg["params"]["arguments"].get("text", "")
        return _rpc_result(msg["id"], {
            "content": [{"type": "text", "text": f"echo:{text}"}]
        })
    return None  # notification


def test_resolve_env(monkeypatch):
    monkeypatch.setenv("MY_TOKEN", "sekret")
    assert resolve_env("Bearer ${MY_TOKEN}") == "Bearer sekret"
    assert resolve_env("${MISSING_VAR_XYZ}") == "${MISSING_VAR_XYZ}"


def test_validate_server_config():
    assert validate_server_config({"transport": "stdio", "command": "x"}) is None
    assert validate_server_config({"transport": "sse", "url": "http://x"}) is None
    assert validate_server_config({"transport": "http", "url": "http://x"}) is None
    assert "no command" in validate_server_config({"transport": "stdio"})
    assert "no url" in validate_server_config({"transport": "sse"})
    assert "unsupported transport" in validate_server_config(
        {"transport": "websocket", "url": "ws://x"}
    )


def test_client_lists_tools():
    async def scenario():
        client = MCPStdioClient(
            "web-tools", sys.executable,
            ["-m", "tensortruth_tpu.mcp_servers.web_tools_server"],
        )
        await client.connect()
        try:
            tools = await client.list_tools()
            names = {t["name"] for t in tools}
            assert {"search_web", "fetch_page"} <= names
        finally:
            await client.close()

    asyncio.run(scenario())


# -- SSE fixture server -----------------------------------------------------------


async def _start_sse_server():
    """Legacy HTTP+SSE MCP server: GET /sse streams, POST /messages accepts."""
    from aiohttp import web

    queues: dict[str, asyncio.Queue] = {}

    async def sse(request):
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream"}
        )
        await resp.prepare(request)
        q: asyncio.Queue = asyncio.Queue()
        queues["only"] = q
        # server-relative endpoint, as real SDK servers send it
        await resp.write(b"event: endpoint\ndata: /messages?session=only\n\n")
        while True:
            msg = await q.get()
            if msg is None:
                break
            await resp.write(
                b"event: message\ndata: " + json.dumps(msg).encode() + b"\n\n"
            )
        return resp

    async def messages(request):
        msg = await request.json()
        reply = _handle_rpc(msg)
        if reply is not None:
            await queues["only"].put(reply)
        return web.Response(status=202, text="Accepted")

    app = web.Application()
    app.router.add_get("/sse", sse)
    app.router.add_post("/messages", messages)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    return runner, f"http://127.0.0.1:{port}/sse"


def test_sse_client_end_to_end():
    async def scenario():
        runner, url = await _start_sse_server()
        client = MCPSSEClient("fix", url)
        try:
            await client.connect()
            tools = await client.list_tools()
            assert [t["name"] for t in tools] == ["echo"]
            out = await client.call_tool("echo", {"text": "hi"})
            assert out == "echo:hi"
        finally:
            await client.close()
            await runner.cleanup()

    asyncio.run(scenario())


# -- streamable-HTTP fixture server -------------------------------------------------


async def _start_http_server(sse_responses: bool):
    """Streamable-HTTP MCP server; optionally answers via per-request SSE."""
    from aiohttp import web

    async def mcp(request):
        msg = await request.json()
        reply = _handle_rpc(msg)
        if reply is None:  # notification
            return web.Response(status=202)
        headers = {"Mcp-Session-Id": "sess-1"}
        if sse_responses:
            body = (
                b"event: message\ndata: " + json.dumps(reply).encode() + b"\n\n"
            )
            return web.Response(
                body=body, content_type="text/event-stream", headers=headers
            )
        return web.json_response(reply, headers=headers)

    app = web.Application()
    app.router.add_post("/mcp", mcp)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    return runner, f"http://127.0.0.1:{port}/mcp"


@pytest.mark.parametrize("sse_responses", [False, True])
def test_streamable_http_client_end_to_end(sse_responses):
    async def scenario():
        runner, url = await _start_http_server(sse_responses)
        client = MCPStreamableHTTPClient("fix", url)
        try:
            await client.connect()
            assert client._session_id == "sess-1"  # echoed on later requests
            tools = await client.list_tools()
            assert [t["name"] for t in tools] == ["echo"]
            out = await client.call_tool("echo", {"text": "yo"})
            assert out == "echo:yo"
        finally:
            await client.close()
            await runner.cleanup()

    asyncio.run(scenario())


# -- aggregation + status surfacing -------------------------------------------------


def test_load_mcp_tools_aggregates(tmp_path):
    from tensortruth_tpu.services.mcp_server_service import MCPServerService

    svc = MCPServerService(tmp_path / "mcp.json")
    svc.add_server(
        "web-tools",
        {"command": sys.executable,
         "args": ["-m", "tensortruth_tpu.mcp_servers.web_tools_server"]},
    )
    svc.add_server("broken", {"command": "/nonexistent-binary"})
    svc.add_server("disabled", {"command": sys.executable, "enabled": False})
    svc.add_server("weird", {"transport": "carrier-pigeon"})

    async def scenario():
        specs, clients, status = await load_mcp_tools(svc)
        try:
            assert "web-tools__search_web" in specs
            assert specs["web-tools__search_web"].source == "mcp"
            assert not any(n.startswith("broken") for n in specs)
            assert not any(n.startswith("disabled") for n in specs)
            assert len(clients) == 1
            assert status["web-tools"]["status"] == "connected"
            assert status["web-tools"]["n_tools"] >= 2
            assert status["broken"]["status"] == "error"
            assert status["disabled"]["status"] == "disabled"
            assert status["weird"]["status"] == "error"
            assert "unsupported transport" in status["weird"]["error"]
        finally:
            for c in clients:
                await c.close()

    asyncio.run(scenario())


def test_load_mcp_tools_mixed_transports(tmp_path):
    """stdio + SSE + streamable-HTTP servers aggregate into one tool set."""
    from tensortruth_tpu.services.mcp_server_service import MCPServerService

    svc = MCPServerService(tmp_path / "mcp.json")

    async def scenario():
        sse_runner, sse_url = await _start_sse_server()
        http_runner, http_url = await _start_http_server(False)
        svc.add_server("s1", {"transport": "sse", "url": sse_url})
        svc.add_server("s2", {"transport": "streamable-http", "url": http_url})
        specs, clients, status = await load_mcp_tools(svc)
        try:
            assert {"s1__echo", "s2__echo"} <= set(specs)
            assert status["s1"] == {
                "status": "connected", "transport": "sse", "n_tools": 1
            }
            assert status["s2"]["status"] == "connected"
            assert await specs["s1__echo"].fn(text="a") == "echo:a"
            assert await specs["s2__echo"].fn(text="b") == "echo:b"
        finally:
            for c in clients:
                await c.close()
            await sse_runner.cleanup()
            await http_runner.cleanup()

    asyncio.run(scenario())


def test_sse_dead_endpoint_errors_cleanly(tmp_path):
    from tensortruth_tpu.services.mcp_server_service import MCPServerService

    svc = MCPServerService(tmp_path / "mcp.json")
    svc.add_server("dead", {"transport": "sse",
                            "url": "http://127.0.0.1:1/sse"})

    async def scenario():
        specs, clients, status = await load_mcp_tools(svc)
        assert specs == {} and clients == []
        assert status["dead"]["status"] == "error"

    asyncio.run(scenario())


async def _start_closing_sse_server(close_after_handshake: bool):
    """SSE server that ends its event stream — immediately (before the
    endpoint event) or right after the initialize handshake completes."""
    from aiohttp import web

    queues: dict[str, asyncio.Queue] = {}

    async def sse(request):
        resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
        await resp.prepare(request)
        if not close_after_handshake:
            return resp  # clean EOF before any endpoint event
        q: asyncio.Queue = asyncio.Queue()
        queues["only"] = q
        await resp.write(b"event: endpoint\ndata: /messages?session=only\n\n")
        while True:
            msg = await q.get()
            if msg is None:
                break  # clean EOF mid-session
            await resp.write(
                b"event: message\ndata: " + json.dumps(msg).encode() + b"\n\n"
            )
        return resp

    async def messages(request):
        msg = await request.json()
        reply = _handle_rpc(msg)
        if reply is not None:
            await queues["only"].put(reply)
        if msg.get("method") == "notifications/initialized":
            await queues["only"].put(None)  # close the stream post-handshake
        return web.Response(status=202, text="Accepted")

    app = web.Application()
    app.router.add_get("/sse", sse)
    app.router.add_post("/messages", messages)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    return runner, f"http://127.0.0.1:{port}/sse"


def test_sse_request_fails_fast_on_clean_stream_eof():
    """A gracefully closed event stream (server restart) must fail in-flight
    and subsequent requests immediately — not strand each one for the full
    REQUEST_TIMEOUT (the pump's finally fails every pending future)."""

    async def scenario():
        runner, url = await _start_closing_sse_server(close_after_handshake=True)
        client = MCPSSEClient("fix", url)
        try:
            await client.connect()
            # the server closed the stream right after the handshake; the
            # next request must fail fast with the stream-closed error
            t0 = time.monotonic()
            with pytest.raises(RuntimeError, match="SSE stream closed"):
                await client.list_tools()
            assert time.monotonic() - t0 < 5, "request hung instead of failing fast"
        finally:
            await client.close()
            await runner.cleanup()

    asyncio.run(scenario())


def test_sse_connect_fails_fast_without_endpoint_event():
    """A stream that ends before the endpoint event must fail connect()
    immediately (endpoint future gets the stream-closed error), not wait
    the full REQUEST_TIMEOUT."""

    async def scenario():
        runner, url = await _start_closing_sse_server(close_after_handshake=False)
        client = MCPSSEClient("fix", url)
        try:
            t0 = time.monotonic()
            with pytest.raises(RuntimeError, match="SSE stream closed"):
                await client.connect()
            assert time.monotonic() - t0 < 5, "connect hung instead of failing fast"
        finally:
            await client.close()
            await runner.cleanup()

    asyncio.run(scenario())
