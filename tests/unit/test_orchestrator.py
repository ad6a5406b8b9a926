"""Orchestrator loop + synthesis handoff
(reference tests/unit/test_orchestrator_service.py analog)."""

import numpy as np
import pytest

from tensortruth_tpu.core.providers import ChatDelta
from tensortruth_tpu.core.source import SourceNode
from tensortruth_tpu.services.orchestrator_service import (
    OrchestratorService,
    budget_history,
)
from tensortruth_tpu.services.rag_service import RetrievalResult
from tensortruth_tpu.services.synthesis_service import build_source_reference
from tensortruth_tpu.services.tool_service import ToolService


class ToolCallingLLM:
    """First turn: call rag_query; second: answer."""

    def __init__(self):
        self.turns = 0

    def chat_with_tools(self, messages, tools, system=None):
        self.turns += 1
        if self.turns == 1:
            assert any(t["name"] == "rag_query" for t in tools)
            assert "rag_query" in (system or "")
            return "", [{"name": "rag_query", "arguments": {"query": "broadcasting"}}]
        assert messages[-1]["role"] == "tool"
        return "Broadcasting aligns array shapes.", []

    def stream_chat(self, messages, system=None):
        assert "[1]" in messages[-1]["content"] or "Tool outputs" in messages[-1]["content"]
        yield ChatDelta(text="Final answer [1].")


class FakeRAGService:
    def retrieve(self, query, params=None, session_messages=None):
        src = SourceNode(id="n1", title="numpy doc", content="broadcast rules",
                         score=0.9, metadata={"module": "numpy"})
        return RetrievalResult(sources=[src], confidence="normal")


class OfflineToolService(ToolService):
    def load_tools(self):  # no web tools (offline unit test)
        self._tools = {}


async def _collect(gen):
    return [e async for e in gen]


async def test_orchestrator_rag_then_synthesis():
    llm = ToolCallingLLM()
    orch = OrchestratorService(FakeRAGService(), OfflineToolService())
    events = await _collect(
        orch.execute("what is broadcasting?", llm, modules=["numpy"])
    )
    types = [e["type"] for e in events]
    assert "tool_phase" in types
    assert "tool_progress" in types
    assert "sources" in types
    assert types[-1] == "done"
    assert events[-1]["content"] == "Final answer [1]."
    src_event = next(e for e in events if e["type"] == "sources")
    assert src_event["sources"][0]["title"] == "numpy doc"


async def test_orchestrator_no_tools_direct_answer():
    class NoToolLLM:
        def chat_with_tools(self, messages, tools, system=None):
            return "plain answer", []

    orch = OrchestratorService(FakeRAGService(), OfflineToolService())
    events = await _collect(orch.execute("hi", NoToolLLM(), modules=[]))
    assert events[-1]["type"] == "done"
    assert events[-1]["content"] == "plain answer"


async def test_orchestrator_tool_error_continues():
    """A failing tool surfaces as an ERROR result, loop continues."""

    class BadToolLLM:
        def __init__(self):
            self.turns = 0

        def chat_with_tools(self, messages, tools, system=None):
            self.turns += 1
            if self.turns == 1:
                return "", [{"name": "rag_query", "arguments": {"bogus": 1}}]
            assert "ERROR" in messages[-1]["content"]
            return "recovered", []

        def stream_chat(self, messages, system=None):
            yield ChatDelta(text="synthesized")

    orch = OrchestratorService(FakeRAGService(), OfflineToolService())
    events = await _collect(orch.execute("q", BadToolLLM(), modules=["numpy"]))
    assert events[-1]["type"] == "done"


def test_budget_history_trims_oldest():
    history = [{"role": "user", "content": "x" * 1000} for _ in range(100)]
    out = budget_history(history, context_window=1000)
    # 18% of 1000 tokens * 4 chars = 720 chars -> 0 full messages fit? budget
    # floor keeps newest-first whole messages only.
    assert len(out) < len(history)
    assert out == history[-len(out):] if out else True


def test_build_source_reference():
    from tensortruth_tpu.core.source import SourceType

    srcs = [
        SourceNode(title="A", url="http://a", type=SourceType.WEB),
        SourceNode(title="B"),
    ]
    ref = build_source_reference(srcs)
    assert '[1] "A" (web) - http://a' in ref
    assert '[2] "B" (knowledge base)' in ref


def test_startup_service_status(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.services.startup_service import StartupService

    status = StartupService().check_startup_status()
    assert status.first_run  # no config.yaml before the check
    assert status.config_ok
    assert not status.indexes_present
    d = status.to_dict()
    assert d["index_count"] == 0

    # second run: config now exists
    status2 = StartupService().check_startup_status()
    assert not status2.first_run


def test_synthesis_truncates_to_budget():
    from tensortruth_tpu.core.providers import ChatDelta
    from tensortruth_tpu.services.synthesis_service import SynthesisService

    captured = {}

    class LLM:
        def stream_chat(self, messages, system=None):
            captured["prompt"] = messages[-1]["content"]
            yield ChatDelta(text="ok")

    svc = SynthesisService(LLM(), context_window=1000)
    outputs = [{"tool": "t", "arguments": {}, "output": "x" * 50_000}]
    list(svc.synthesize("q", outputs))
    assert len(captured["prompt"]) < 10_000
    assert "[...truncated]" in captured["prompt"]


class TestContextBudgeting:
    """Full 12/18/18/50 partition (reference orchestrator_service.py:559-636)."""

    def test_history_gets_its_18_pct_share(self):
        from tensortruth_tpu.services.orchestrator_service import budget_history

        ctx = 1000  # 4000 chars total; history budget = 720 chars
        history = [
            {"role": "user", "content": "u" * 300},
            {"role": "assistant", "content": "a" * 300},
            {"role": "user", "content": "u" * 300},
            {"role": "assistant", "content": "a" * 300},
        ]
        kept = budget_history(history, ctx)
        assert len(kept) == 2  # newest turn (600 chars) fits; older does not
        assert kept[0]["role"] == "user"

    def test_oversized_system_prompt_eats_history_not_response(self):
        from tensortruth_tpu.services.orchestrator_service import budget_history

        ctx = 1000  # 4000 chars; response buffer 2000
        history = [{"role": "user", "content": "hello"}]
        # system 1900 + user 200 + buffer 2000 = 4100 > 4000 → no history
        kept = budget_history(
            history, ctx, system_prompt="s" * 1900, user_prompt="u" * 200
        )
        assert kept == []

    def test_orphaned_assistant_head_is_dropped(self):
        from tensortruth_tpu.services.orchestrator_service import budget_history

        history = [
            {"role": "user", "content": "x" * 5000},  # too big — gets cut
            {"role": "assistant", "content": "a" * 10},
            {"role": "user", "content": "u" * 10},
            {"role": "assistant", "content": "a" * 10},
        ]
        kept = budget_history(history, 1000)
        assert kept and kept[0]["role"] == "user"  # complete turns only


class TestModuleDescriptions:
    def test_reads_doc_type_and_display_name(self, tmp_path):
        import json

        from tensortruth_tpu.services.orchestrator_service import (
            load_module_descriptions,
        )

        d = tmp_path / "bge-m3" / "library_numpy"
        d.mkdir(parents=True)
        (d / "index_metadata.json").write_text(
            json.dumps({"display_name": "NumPy API docs", "embedding_model": "BAAI/bge-m3"})
        )
        out = load_module_descriptions(["numpy", "ghost"], indexes_dir=tmp_path)
        assert out[0] == {
            "name": "numpy", "display_name": "NumPy API docs", "doc_type": "library",
        }
        assert out[1]["doc_type"] == "unknown"  # missing module falls back


class TestSourceReference:
    def test_numbered_across_kb_and_web_with_scores(self):
        from tensortruth_tpu.core.source import SourceNode, SourceType
        from tensortruth_tpu.services.synthesis_service import build_source_reference

        sources = [
            SourceNode(title="Chapter 3", score=0.82, type=SourceType.LIBRARY_DOC),
            SourceNode(title="Blog post", url="https://b.org/p", score=0.41,
                       type=SourceType.WEB),
        ]
        ref = build_source_reference(sources)
        assert '[1] "Chapter 3" (knowledge base, score: 0.82)' in ref
        assert '[2] "Blog post" (web, score: 0.41) - https://b.org/p' in ref
        assert ref.startswith("--- Source Reference ---")
        assert build_source_reference([]) == ""
