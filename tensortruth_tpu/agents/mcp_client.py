"""MCP stdio client: spawn configured servers, aggregate their tools.

Mirrors reference agents/server_registry.py:18-234 (JSON-configured MCP
servers, env-var resolution, connect + aggregate tools into the agent tool
set). Implements the MCP JSON-RPC stdio framing directly (no ``mcp`` SDK in
this environment); newline-delimited JSON, matching
mcp_servers/web_tools_server.py.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os

from tensortruth_tpu.services.tool_service import ToolSpec

logger = logging.getLogger(__name__)

REQUEST_TIMEOUT = 30


def resolve_env(value: str) -> str:
    """${VAR} resolution in server configs (reference server_registry.py:18-47)."""
    import re

    return re.sub(
        r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}",
        lambda m: os.environ.get(m.group(1), m.group(0)),
        value,
    )


class MCPStdioClient:
    """One connected stdio MCP server."""

    def __init__(self, name: str, command: str, args: list[str] | None = None,
                 env: dict | None = None):
        self.name = name
        self.command = resolve_env(command)
        self.args = [resolve_env(a) for a in (args or [])]
        self.env = {k: resolve_env(v) for k, v in (env or {}).items()}
        self._proc: asyncio.subprocess.Process | None = None
        self._id = 0
        self._lock = asyncio.Lock()

    async def connect(self) -> None:
        self._proc = await asyncio.create_subprocess_exec(
            self.command,
            *self.args,
            stdin=asyncio.subprocess.PIPE,
            stdout=asyncio.subprocess.PIPE,
            stderr=asyncio.subprocess.DEVNULL,
            env={**os.environ, **self.env},
        )
        await self._request("initialize", {
            "protocolVersion": "2024-11-05",
            "clientInfo": {"name": "tensortruth-tpu", "version": "0.1.0"},
            "capabilities": {},
        })
        # the MCP lifecycle REQUIRES this notification before normal
        # operations — SDK-built servers reject tools/list without it
        await self._notify("notifications/initialized")

    async def _notify(self, method: str, params: dict | None = None) -> None:
        assert self._proc is not None and self._proc.stdin
        async with self._lock:
            msg = {"jsonrpc": "2.0", "method": method, "params": params or {}}
            self._proc.stdin.write((json.dumps(msg) + "\n").encode())
            await self._proc.stdin.drain()

    async def _request(self, method: str, params: dict | None = None) -> dict:
        assert self._proc is not None and self._proc.stdin and self._proc.stdout
        async with self._lock:
            self._id += 1
            req = {"jsonrpc": "2.0", "id": self._id, "method": method,
                   "params": params or {}}
            self._proc.stdin.write((json.dumps(req) + "\n").encode())
            await self._proc.stdin.drain()
            # read until OUR response id: servers may interleave
            # notifications (logging/progress) and, after an earlier
            # timeout, a stale response — both must be skipped or every
            # later call pairs with the wrong reply
            deadline = asyncio.get_running_loop().time() + REQUEST_TIMEOUT
            while True:
                remaining = deadline - asyncio.get_running_loop().time()
                if remaining <= 0:
                    raise TimeoutError(f"MCP {self.name}.{method} timed out")
                line = await asyncio.wait_for(
                    self._proc.stdout.readline(), remaining
                )
                if not line.strip():
                    continue
                try:
                    resp = json.loads(line)
                except json.JSONDecodeError:
                    continue  # non-protocol noise on stdout
                if resp.get("id") == self._id:
                    break
                # notification or stale response from a timed-out call
                logger.debug(
                    "MCP %s: skipping message id=%s (%s)",
                    self.name, resp.get("id"), resp.get("method", "response"),
                )
        if "error" in resp:
            raise RuntimeError(f"MCP {self.name}.{method}: {resp['error']}")
        return resp.get("result", {})

    async def list_tools(self) -> list[dict]:
        return (await self._request("tools/list")).get("tools", [])

    async def call_tool(self, name: str, arguments: dict):
        result = await self._request(
            "tools/call", {"name": name, "arguments": arguments}
        )
        parts = result.get("content", [])
        text = "\n".join(p.get("text", "") for p in parts if p.get("type") == "text")
        if result.get("isError"):
            raise RuntimeError(text or "MCP tool error")
        return text

    async def close(self) -> None:
        if self._proc is not None:
            if self._proc.stdin:
                self._proc.stdin.close()
            try:
                await asyncio.wait_for(self._proc.wait(), 5)
            except asyncio.TimeoutError:
                self._proc.kill()
            self._proc = None


async def load_mcp_tools(mcp_service) -> tuple[dict, list["MCPStdioClient"]]:
    """Connect every enabled stdio server; returns (name→ToolSpec, clients).

    Tool names are prefixed ``{server}__{tool}`` to avoid collisions
    (reference server_registry aggregation). Failures isolate per server.
    """
    specs: dict[str, ToolSpec] = {}
    clients: list[MCPStdioClient] = []
    for cfg in mcp_service.list_servers():
        if not cfg.get("enabled", True) or cfg.get("transport", "stdio") != "stdio":
            continue
        client = MCPStdioClient(
            cfg["name"], cfg.get("command", ""), cfg.get("args"), cfg.get("env")
        )
        try:
            await client.connect()
            tools = await client.list_tools()
        except Exception as e:
            logger.warning("MCP server %s failed to connect: %s", cfg["name"], e)
            await client.close()
            continue
        clients.append(client)
        for tool in tools:
            qualified = f"{cfg['name']}__{tool['name']}"

            def make_fn(c=client, n=tool["name"]):
                async def fn(**kwargs):
                    return await c.call_tool(n, kwargs)

                return fn

            specs[qualified] = ToolSpec(
                name=qualified,
                description=f"[MCP:{cfg['name']}] {tool.get('description', '')}",
                parameters=tool.get("inputSchema", {"type": "object", "properties": {}}),
                fn=make_fn(),
                source="mcp",
            )
    return specs, clients
