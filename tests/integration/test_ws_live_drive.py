"""Live-drive regression gate for the SPA's WS protocol (VERDICT r3 item 8).

Promotes the verify-skill drive recipe into CI: a real server, a real WS
client, and scripted fake LLMs exercise EVERY ``WS_HANDLERS`` branch the
browser implements (static/assets/js/chat/ws.js), then assert on the HTML
the browser renderer would paint for the streamed content (via the
line-faithful Python twin, tensortruth_tpu/utils/mdrender.py — no JS
runtime exists in this image, tests/integration/test_spa_render.py).

Two-way protocol-drift gate:

* every handler the SPA defines must be OBSERVED on the wire in this drive
  (a new ``WS_HANDLERS`` entry fails the test until a scenario emits it);
* every ``msg.<field>`` a handler body reads must be present in at least
  one observed event of that type, unless listed in ``OPTIONAL_FIELDS``
  (a server payload rename fails the test the moment the SPA still reads
  the old name).

Reference analog: frontend/src/hooks/useWebSocket.ts message switch +
vitest component tests (MessageItem.test.tsx) — here the server, the wire,
and the renderer twin are all exercised in one scripted conversation.
"""

import re
from pathlib import Path

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.models.manager import ModelManager
from tensortruth_tpu.utils import mdrender

pytestmark = pytest.mark.integration

_JS_DIR = (
    Path(__file__).resolve().parents[2]
    / "tensortruth_tpu" / "static" / "assets" / "js" / "chat"
)
WS_JS = (_JS_DIR / "ws.js").read_text()
PROGRESS_JS = (_JS_DIR / "progress.js").read_text()

# Fields a handler reads but the server legitimately omits sometimes
# (guarded with `||` fallbacks in the JS).
OPTIONAL_FIELDS = {
    # the /web pipeline emits bare {tool, message} progress; phase/output
    # ride only the agent path (`resolveToolCall` `||` fallbacks)
    "tool_progress": {"phase", "output"},
    "tool_phase": {"calls"},             # legacy emitters send only `tools`
    "confirmation_request": {"message"},  # `msg.message || msg.description`
    "done": {"content"},                 # `msg.content || stream.raw`
    # the RAG path sends bare {status}; the /web pipeline adds `message`
    "status": {"message"},
}


CONFIRMCARD_JS = (_JS_DIR / "confirmcard.js").read_text()


def _parse_helper_reads() -> dict[str, set[str]]:
    """Delegated-module helper → the msg.<field> names its body reads, so a
    ws.js handler that delegates (beginToolCalls(…, msg),
    renderConfirmationCard(msg)) still counts as reading those fields for
    the drift gate."""
    helpers: dict[str, set[str]] = {}
    name = None
    for src in (PROGRESS_JS, CONFIRMCARD_JS):
        for line in src.splitlines():
            m = re.match(r"export function (\w+)\(", line)
            if m:
                name = m.group(1)
                helpers[name] = set()
            elif name is not None:
                helpers[name].update(re.findall(r"msg\.(\w+)", line))
    return helpers


def _parse_handlers() -> dict[str, set[str]]:
    """WS_HANDLERS entries → the msg.<field> names each body reads
    (directly, or via a progress.js helper the body calls with msg)."""
    helpers = _parse_helper_reads()
    block = WS_JS[WS_JS.index("const WS_HANDLERS = {"):]
    block = block[: block.index("\n};")]
    handlers: dict[str, set[str]] = {}
    name = None
    for line in block.splitlines()[1:]:
        m = re.match(r"  (\w+)\((?:msg)?\)", line)
        if m:
            name = m.group(1)
            handlers[name] = set()
        elif name:
            handlers[name].update(re.findall(r"msg\.(\w+)", line))
            for helper, fields in helpers.items():
                if re.search(rf"\b{helper}\([^)]*\bmsg\b", line):
                    handlers[name].update(fields)
    return handlers


HANDLERS = _parse_handlers()


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


# Answer the fake LLM streams in the RAG scenario: display + inline math and
# a fenced Python block — the content class the renderer gate (VERDICT r3
# item 1) exists for.
RICH_ANSWER = (
    "The loss is $$L = \\frac{1}{N} \\sum_{i=1}^{N} (y_i - \\hat{y}_i)^2$$ "
    "with inline rate $\\alpha > 0$.\n\n"
    "```python\ndef step(w, g):\n    return w - 0.01 * g\n```\n"
)


async def _drive_rag(client) -> dict[str, list[dict]]:
    """Doc upload + chat with a thinking/streaming fake LLM.

    Expected branches: status, thinking, token, sources, done, title.
    """
    from tensortruth_tpu.core.providers import ChatDelta

    class FakeLLM:
        def complete(self, prompt):
            return "Matrix unit drive"

        def stream_chat(self, messages, system=None):
            yield ChatDelta(thinking="planning the answer")
            for piece in RICH_ANSWER.split(" "):
                yield ChatDelta(text=piece + " ")

    client.server.app["services"].rag_service._llm_factory = (
        lambda params: FakeLLM()
    )
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    await client.post(
        f"/api/sessions/{sid}/documents",
        json={"filename": "mxu.md", "text": "MXU systolic array details. " * 120},
    )
    ws = await client.ws_connect(f"/ws/chat/{sid}")
    await ws.send_json({"message": "explain the MXU loss"})
    seen: dict[str, list[dict]] = {}
    while True:
        msg = await ws.receive_json(timeout=60)
        seen.setdefault(msg["type"], []).append(msg)
        if msg["type"] in ("done", "error"):
            break
    # title arrives after done on the first exchange
    msg = await ws.receive_json(timeout=10)
    seen.setdefault(msg["type"], []).append(msg)
    await ws.close()
    return seen


async def _drive_orchestrator(client) -> dict[str, list[dict]]:
    """Tool-capable fake LLM calls the confirmation-gated MCP tool.

    Expected branches: reasoning (loop commentary alongside the tool call,
    with show_orchestrator_reasoning on), tool_phase, tool_progress,
    confirmation_request, plus the final token/done from synthesis.
    """
    import asyncio

    from tensortruth_tpu.core.providers import ChatDelta, ProviderRegistry

    class ToolLLM:
        def __init__(self):
            self.turns = 0

        def complete(self, prompt):
            return "standalone"

        def chat_with_tools(self, messages, tools, system=None):
            self.turns += 1
            if self.turns == 1:
                assert any(t["name"] == "manage_mcp_server" for t in tools)
                return "I should register srv-x first.", [{
                    "name": "manage_mcp_server",
                    "arguments": {"action": "add", "name": "srv-x",
                                  "config": {"transport": "stdio", "command": "x"}},
                }]
            return "tool work finished", []

        def stream_chat(self, messages, system=None):
            yield ChatDelta(text="final synthesized answer")

    services = client.server.app["services"]
    services.rag_service._llm_factory = lambda params: ToolLLM()
    services.config.agent.show_orchestrator_reasoning = True
    services.config.providers[0].default_capabilities = ["tools"]
    services.config.providers[0].models = [{"name": "fake-model"}]
    ProviderRegistry.reset_instance()

    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    await client.post(
        f"/api/sessions/{sid}/documents",
        json={"filename": "d.md", "text": "MCP server registry details. " * 120},
    )
    await client.patch(
        f"/api/sessions/{sid}",
        json={"params": {"orchestrator_enabled": True, "model": "fake-model"}},
    )
    ws = await client.ws_connect(f"/ws/chat/{sid}")
    await ws.send_json({"message": "add the srv-x MCP server"})
    seen: dict[str, list[dict]] = {}
    while True:
        msg = await ws.receive_json(timeout=60)
        seen.setdefault(msg["type"], []).append(msg)
        if msg["type"] == "confirmation_request":
            # the SPA's approve button posts to the confirmation route while
            # the orchestrator blocks on the decision — do exactly that
            cid = msg["confirmation_id"]
            r = await client.post(f"/api/tool-confirmations/{cid}/approve")
            assert r.status == 200
        if msg["type"] in ("done", "error"):
            break
    await ws.close()
    await asyncio.sleep(0)
    # Persistence parity (reference chat.py:507-519 / SPA
    # renderHistoryMessage): the saved assistant message must carry the
    # tool timeline and generation stats so a reload repaints them.
    r = await client.get(f"/api/sessions/{sid}")
    saved = (await r.json())["messages"][-1]
    assert saved["role"] == "assistant"
    steps = saved.get("tool_steps") or []
    assert steps and steps[0]["tool"] == "manage_mcp_server"
    assert steps[0]["status"] in ("completed", "failed")
    assert steps[0].get("params", {}).get("name") == "srv-x"
    assert saved.get("stats", {}).get("est_tokens") is not None
    return seen


async def _drive_error(client) -> dict[str, list[dict]]:
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    ws = await client.ws_connect(f"/ws/chat/{sid}")
    # COMMAND_RE only matches /word — hyphens would fall through to RAG
    await ws.send_json({"message": "/definitelynotacommand"})
    msg = await ws.receive_json(timeout=30)
    await ws.close()
    return {msg["type"]: [msg]}


async def test_every_ws_handler_branch_is_driven(client):
    assert set(HANDLERS) == {
        "status", "tool_phase", "tool_progress", "thinking", "reasoning",
        "token", "sources", "done", "error", "title", "confirmation_request",
    }, "WS_HANDLERS changed — extend the drive scenarios for the new branch"

    seen: dict[str, list[dict]] = {}
    for part in (
        await _drive_rag(client),
        await _drive_orchestrator(client),
        await _drive_error(client),
    ):
        for k, v in part.items():
            seen.setdefault(k, []).extend(v)

    missing = set(HANDLERS) - set(seen)
    assert not missing, f"WS branches never driven: {sorted(missing)}"

    # every msg.<field> the JS body reads must ride the wire (or be
    # explicitly optional) — catches payload renames on either side
    for handler, fields in HANDLERS.items():
        required = fields - OPTIONAL_FIELDS.get(handler, set()) - {"type"}
        present = set().union(*(e.keys() for e in seen[handler]))
        gap = required - present
        assert not gap, f"{handler}: SPA reads {sorted(gap)}, server never sent it"

    # unknown optional entries rot: every OPTIONAL_FIELDS key must still be
    # read by the JS handler it excuses
    for handler, fields in OPTIONAL_FIELDS.items():
        assert fields <= HANDLERS.get(handler, set()), (
            f"OPTIONAL_FIELDS[{handler!r}] lists fields ws.js no longer reads"
        )


async def test_done_content_renders_math_and_code(client):
    """The streamed answer, rendered exactly as the SPA's done() handler
    does (renderMarkdown on msg.content), produces real math + highlighted
    code HTML — the item-1 gate wired to live WS output."""
    seen = await _drive_rag(client)
    content = seen["done"][-1]["content"]
    assert "$$" in content  # fake LLM's math survived the pipeline verbatim

    html = mdrender.render_markdown(content)
    assert 'class="tex' in html and "tex-frac" in html  # display math box
    assert "∑" in html or "&#8721;" in html  # \sum became the glyph
    assert '<pre class="code"' in html or "<code" in html
    assert 'class="hl-kw"' in html  # `def` keyword highlighted
    assert "$$" not in html  # no raw TeX delimiters leak into the DOM
    # thinking + token branches carried the same turn
    assert seen["thinking"] and seen["token"]


async def test_orchestrator_synthesis_streams_on_the_wire(client):
    """r4 verdict item 1: the orchestrator path must stream its synthesized
    answer DURING generation — the stub blocks mid-stream until the client
    has received the first token frame over the real socket, so collecting
    deltas before the first send (the old defect) deadlocks-and-fails here
    instead of passing on frame counts alone."""
    import threading

    from tensortruth_tpu.core.providers import ChatDelta, ProviderRegistry

    gate = threading.Event()
    state = {"late": False}

    class SlowSynthLLM:
        def __init__(self):
            self.turns = 0

        def complete(self, prompt):
            return "standalone"

        def chat_with_tools(self, messages, tools, system=None):
            self.turns += 1
            if self.turns == 1:
                return "", [{"name": "rag_query",
                             "arguments": {"query": "mxu"}}]
            return "found it", []

        def stream_chat(self, messages, system=None):
            yield ChatDelta(text="first-chunk ")
            if not gate.wait(15):
                state["late"] = True
            yield ChatDelta(text="second-chunk")

    services = client.server.app["services"]
    services.rag_service._llm_factory = lambda params: SlowSynthLLM()
    services.config.providers[0].default_capabilities = ["tools"]
    services.config.providers[0].models = [{"name": "fake-model"}]
    ProviderRegistry.reset_instance()

    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    await client.post(
        f"/api/sessions/{sid}/documents",
        json={"filename": "m.md", "text": "MXU systolic array details. " * 120},
    )
    await client.patch(
        f"/api/sessions/{sid}",
        json={"params": {"orchestrator_enabled": True, "model": "fake-model"}},
    )
    ws = await client.ws_connect(f"/ws/chat/{sid}")
    await ws.send_json({"message": "what is the MXU?"})
    tokens_before_done = 0
    while True:
        msg = await ws.receive_json(timeout=60)
        if msg["type"] == "token":
            tokens_before_done += 1
            gate.set()  # only reachable if the frame crossed mid-generation
        if msg["type"] in ("done", "error"):
            assert msg["type"] == "done", msg
            break
    await ws.close()
    assert not state["late"], "first token frame never arrived mid-generation"
    assert tokens_before_done >= 2
