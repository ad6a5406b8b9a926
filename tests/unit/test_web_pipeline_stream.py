"""/web command pipeline end-to-end with stubbed network."""

import asyncio

import numpy as np
import pytest

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.core.providers import ChatDelta
from tensortruth_tpu.web import pipeline as wp
from tensortruth_tpu.web.search import SearchResult


class FakeLLM:
    def stream_chat(self, messages, system=None):
        assert "Question:" in messages[-1]["content"]
        yield ChatDelta(text="Synthesized [A](https://a.com).")


class FakeReranker:
    def rerank(self, query, docs, top_n):
        scores = np.linspace(0.9, 0.3, len(docs)).astype(np.float32)
        return np.argsort(-scores)[:top_n], scores


@pytest.fixture
def stubbed(monkeypatch):
    from tensortruth_tpu.web import search as ws_mod
    from tensortruth_tpu.web import fetch as fetch_mod

    monkeypatch.setattr(
        ws_mod, "search_multi",
        lambda queries, n: [
            SearchResult(title=f"R{i}", url=f"https://r{i}.com", snippet="snip")
            for i in range(4)
        ],
    )
    monkeypatch.setattr(
        fetch_mod, "fetch_url_as_markdown",
        lambda url: (f"Title {url}", f"content for {url} " * 100),
    )
    # web/pipeline imports search_multi lazily from web.search; fetch via web.fetch
    return None


async def _run(query, context):
    events = []
    async for e in wp.web_search_stream(query, context):
        events.append(e)
    return events


def test_web_stream_full_flow(stubbed):
    context = {
        "config": TensorTruthTPUConfig.default(),
        "params": {"context_window": 8192},
        "llm": FakeLLM(),
        "reranker": FakeReranker(),
    }
    events = asyncio.run(_run("what is a tpu?", context))
    types = [e["type"] for e in events]
    assert types[0] == "status"
    assert "sources" in types
    assert types[-1] == "done"
    sources = next(e for e in events if e["type"] == "sources")["sources"]
    assert sources and all(s["content"] for s in sources)
    assert events[-1]["content"].startswith("Synthesized")
    # progress events for fetches
    assert any(e["type"] == "tool_progress" for e in events)


def test_web_stream_no_llm(stubbed):
    context = {"config": TensorTruthTPUConfig.default(), "params": {}, "llm": None,
               "reranker": None}
    events = asyncio.run(_run("q", context))
    assert events[-1]["type"] == "error"
    assert "LLM" in events[-1]["error"]


def test_web_stream_search_failure(monkeypatch):
    from tensortruth_tpu.web import search as ws_mod

    def boom(queries, n):
        raise RuntimeError("offline")

    monkeypatch.setattr(ws_mod, "search_multi", boom)
    context = {"config": TensorTruthTPUConfig.default(), "params": {}, "llm": FakeLLM(),
               "reranker": None}
    events = asyncio.run(_run("q", context))
    assert events[-1]["type"] == "error"
