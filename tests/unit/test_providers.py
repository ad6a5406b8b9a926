"""Provider clients against a local fake Ollama/OpenAI server
(reference auto-mocks Ollama in conftest; here the HTTP protocol itself is
under test so a real local server is used)."""

import json
import threading

import pytest
from aiohttp import web

from tensortruth_tpu.app.config import ProviderConfig
from tensortruth_tpu.core.providers import (
    ModelReference,
    OllamaLLM,
    OpenAICompatibleLLM,
    ProviderRegistry,
    create_llm,
)


@pytest.fixture(scope="module")
def fake_server():
    """Fake Ollama + OpenAI-compatible endpoints on a random port."""

    async def tags(request):
        return web.json_response({"models": [{"name": "llama3:8b"}, {"name": "qwen:4b"}]})

    async def show(request):
        body = await request.json()
        caps = ["tools"] if body.get("model") == "llama3:8b" else []
        return web.json_response({"capabilities": caps})

    async def ollama_chat(request):
        body = await request.json()
        if body.get("stream"):
            resp = web.StreamResponse()
            await resp.prepare(request)
            chunks = [
                {"message": {"thinking": "pondering"}, "done": False},
                {"message": {"content": "Hello "}, "done": False},
                {"message": {"content": "world"}, "done": True},
            ]
            for c in chunks:
                await resp.write((json.dumps(c) + "\n").encode())
            return resp
        # tool-calling turn
        if body.get("tools"):
            return web.json_response(
                {"message": {"content": "", "tool_calls": [
                    {"function": {"name": "search_web",
                                  "arguments": {"queries": ["x"]}}}]}}
            )
        return web.json_response({"message": {"content": "plain"}})

    async def oai_models(request):
        return web.json_response({"data": [{"id": "gpt-oss"}]})

    async def oai_chat(request):
        body = await request.json()
        if body.get("stream"):
            resp = web.StreamResponse()
            await resp.prepare(request)
            deltas = [{"reasoning_content": "hmm"}, {"content": "Hi"}, {"content": "!"}]
            if "reasoning_format" in body:  # echo llama.cpp thinking params
                deltas.append({"content": f" rf={body['reasoning_format']}"
                                          f" tb={body.get('think_budget')}"})
            for delta in deltas:
                payload = {"choices": [{"delta": delta}]}
                await resp.write(f"data: {json.dumps(payload)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            return resp
        if body.get("tools"):
            return web.json_response(
                {"choices": [{"message": {"content": None, "tool_calls": [
                    {"function": {"name": "fetch_page",
                                  "arguments": json.dumps({"url": "http://x"})}}]}}]}
            )
        return web.json_response({"choices": [{"message": {"content": "done"}}]})

    app = web.Application()
    app.router.add_get("/api/tags", tags)
    app.router.add_post("/api/show", show)
    app.router.add_post("/api/chat", ollama_chat)
    app.router.add_get("/v1/models", oai_models)
    app.router.add_post("/v1/chat/completions", oai_chat)

    import asyncio

    loop = asyncio.new_event_loop()
    runner = web.AppRunner(app)
    loop.run_until_complete(runner.setup())
    site = web.TCPSite(runner, "127.0.0.1", 0)
    loop.run_until_complete(site.start())
    port = site._server.sockets[0].getsockname()[1]
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    loop.call_soon_threadsafe(loop.stop)


def test_ollama_stream_chat(fake_server):
    llm = OllamaLLM(fake_server, "llama3:8b")
    deltas = list(llm.stream_chat([{"role": "user", "content": "hi"}], system="sys"))
    assert "".join(d.thinking for d in deltas) == "pondering"
    assert "".join(d.text for d in deltas) == "Hello world"
    assert llm.complete("hi") == "Hello world"


def test_ollama_tool_calls(fake_server):
    llm = OllamaLLM(fake_server, "llama3:8b")
    text, calls = llm.chat_with_tools(
        [{"role": "user", "content": "q"}],
        [{"name": "search_web", "description": "", "parameters": {}}],
    )
    assert calls == [{"name": "search_web", "arguments": {"queries": ["x"]}}]


def test_openai_stream_and_tools(fake_server):
    llm = OpenAICompatibleLLM(fake_server, "gpt-oss", api_key="${FAKE_KEY}")
    deltas = list(llm.stream_chat([{"role": "user", "content": "hi"}]))
    assert "".join(d.thinking for d in deltas) == "hmm"
    assert "".join(d.text for d in deltas) == "Hi!"
    _, calls = llm.chat_with_tools(
        [{"role": "user", "content": "q"}],
        [{"name": "fetch_page", "description": "", "parameters": {}}],
    )
    assert calls == [{"name": "fetch_page", "arguments": {"url": "http://x"}}]
    assert llm.list_models() == ["gpt-oss"]


def test_registry_discovery_and_capabilities(fake_server):
    ProviderRegistry.reset_instance()
    registry = ProviderRegistry(
        [
            ProviderConfig(id="ollama", type="ollama", base_url=fake_server),
            ProviderConfig(id="oai", type="openai_compatible", base_url=fake_server),
        ]
    )
    assert registry.list_models("ollama") == ["llama3:8b", "qwen:4b"]
    assert registry.list_models("oai") == ["gpt-oss"]

    ref = registry.resolve_model(None)  # first available
    assert ref == ModelReference("ollama", "llama3:8b")
    assert registry.resolve_model("gpt-oss").provider_id == "oai"

    assert registry.check_capability(ModelReference("ollama", "llama3:8b"), "tools")
    assert not registry.check_capability(ModelReference("ollama", "qwen:4b"), "tools")
    # TTL cache: second call shouldn't re-probe (same result)
    assert registry.check_capability(ModelReference("ollama", "llama3:8b"), "tools")


def test_create_llm_dispatch(fake_server):
    ProviderRegistry.reset_instance()
    providers = [ProviderConfig(id="ollama", type="ollama", base_url=fake_server)]
    llm = create_llm({"model": "llama3:8b", "temperature": 0.1}, providers=providers)
    assert isinstance(llm, OllamaLLM)
    assert llm.temperature == 0.1
    ProviderRegistry.reset_instance()


def test_llama_cpp_thinking_translation():
    """Thinking preferences become llama.cpp request params (reference
    providers.py:564-589): off → reasoning_format none, levels → deepseek
    with a budget, bare true → deepseek, unset → nothing."""
    from tensortruth_tpu.core.providers import _llama_cpp_thinking_params as t

    assert t(None) == {}
    assert t(False) == {"reasoning_format": "none"}
    assert t(True) == {"reasoning_format": "deepseek"}
    assert t("low") == {"reasoning_format": "deepseek", "think_budget": 1024}
    assert t("medium") == {"reasoning_format": "deepseek", "think_budget": 4096}
    assert t("high") == {"reasoning_format": "deepseek", "think_budget": -1}


def test_llama_cpp_llm_sends_thinking_params(fake_server):
    """create_llm on a llama_cpp provider merges the translated params into
    the chat payload — the fake server echoes them back in the stream."""
    ProviderRegistry.reset_instance()
    providers = [ProviderConfig(id="lcpp", type="llama_cpp", base_url=fake_server)]
    llm = create_llm(
        {"model": "gpt-oss", "thinking": "medium"}, providers=providers
    )
    assert isinstance(llm, OpenAICompatibleLLM)
    assert llm.extra_payload == {"reasoning_format": "deepseek", "think_budget": 4096}
    text = "".join(
        d.text for d in llm.stream_chat([{"role": "user", "content": "hi"}])
    )
    assert "rf=deepseek" in text and "tb=4096" in text
    # thinking=False path
    off = create_llm({"model": "gpt-oss", "thinking": False}, providers=providers)
    assert off.extra_payload == {"reasoning_format": "none"}
    ProviderRegistry.reset_instance()
