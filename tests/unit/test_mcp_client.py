"""MCP stdio client against our own web_tools_server (dogfooding; tools/list
needs no network)."""

import asyncio
import sys

import pytest

from tensortruth_tpu.agents.mcp_client import MCPStdioClient, load_mcp_tools, resolve_env


def test_resolve_env(monkeypatch):
    monkeypatch.setenv("MY_TOKEN", "sekret")
    assert resolve_env("Bearer ${MY_TOKEN}") == "Bearer sekret"
    assert resolve_env("${MISSING_VAR_XYZ}") == "${MISSING_VAR_XYZ}"


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

    async def scenario():
        specs, clients = await load_mcp_tools(svc)
        try:
            assert "web-tools__search_web" in specs
            assert specs["web-tools__search_web"].source == "mcp"
            assert not any(n.startswith("broken") for n in specs)
            assert not any(n.startswith("disabled") for n in specs)
            assert len(clients) == 1
        finally:
            for c in clients:
                await c.close()

    asyncio.run(scenario())
