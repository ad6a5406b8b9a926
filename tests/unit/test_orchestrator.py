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


def _spec(name, description="does things " * 30):
    from tensortruth_tpu.services.tool_service import ToolSpec

    async def fn(**kw):
        return "ok"

    return ToolSpec(
        name=name,
        description=description,
        parameters={"type": "object", "properties": {}},
        fn=fn,
    )


class TestPromptComposition:
    """Sectioned system-prompt contract (reference
    tests/unit/test_orchestrator_service.py::TestSystemPromptComposition)."""

    def _orch(self):
        return OrchestratorService(FakeRAGService(), OfflineToolService())

    def test_base_prompt_always_present(self):
        head, guard = self._orch()._system_prompt([], {"rag_query": _spec("rag_query")})
        assert "research orchestrator" in head
        assert "Tool routing:" in head
        assert "PARALLEL TOOL CALLS" in head
        assert "DISCARDED" in head  # synthesis-handoff contract
        assert "ONLY these tools: rag_query" in guard

    def test_no_modules_section_when_empty(self):
        head, _ = self._orch()._system_prompt([], {})
        assert "knowledge modules" not in head

    def test_modules_appear_with_descriptions(self, tmp_path):
        import json

        mod = tmp_path / "bge-m3" / "papers_numpy"
        mod.mkdir(parents=True)
        (mod / "index_metadata.json").write_text(
            json.dumps({"display_name": "NumPy Papers", "doc_type": "papers"})
        )
        orch = OrchestratorService(FakeRAGService(), OfflineToolService())
        from tensortruth_tpu.services import orchestrator_service as mod_

        descs = mod_.load_module_descriptions(
            ["numpy"], indexes_dir=tmp_path, params={"embedding_model": "BAAI/bge-m3"}
        )
        # splice via the same composition path the service uses
        import unittest.mock as mock

        with mock.patch.object(
            mod_, "load_module_descriptions", return_value=descs
        ):
            head, _ = orch._system_prompt(["numpy"], {})
        assert "- numpy: NumPy Papers (papers)" in head
        assert "rag_query FIRST" in head

    def test_project_prompt_prefixes_role(self):
        head, _ = self._orch()._system_prompt(
            [], {}, project_prompt="Answer in French."
        )
        assert head.startswith("Answer in French.")

    def test_mcp_management_guidance_gated_on_tools(self):
        orch = self._orch()
        without, _ = orch._system_prompt([], {"rag_query": _spec("rag_query")})
        assert "MCP server management" not in without
        with_mgmt, _ = orch._system_prompt(
            [], {"manage_mcp_server": _spec("manage_mcp_server")}
        )
        assert "MCP server management" in with_mgmt
        assert "never retry with the same" in with_mgmt

    def test_mcp_tools_get_descriptions_capped_at_200(self):
        tools = {
            "search_web": _spec("search_web"),
            "github_search": _spec("github_search", "x" * 500),
        }
        head, guard = self._orch()._system_prompt([], tools)
        assert "Additional tools:\n- github_search: " + "x" * 200 in head
        assert "- search_web:" not in head  # builtins live in routing rules
        assert "github_search" in guard and "search_web" in guard

    def test_iteration_budget_reflects_param(self):
        head, _ = self._orch()._system_prompt([], {}, max_iterations=7)
        assert "budget of 7 iterations" in head


class RecordingLLM:
    """No tool calls — records the system prompt the agent composed."""

    def __init__(self):
        self.system = None

    def chat_with_tools(self, messages, tools, system=None):
        self.system = system
        return "direct answer", []


async def test_tool_list_survives_tiny_context_window():
    """r4 verdict item 6: with 50 MCP tools at context_window=2048 the
    budget guard must trim guidance, never the explicit tool list."""
    llm = RecordingLLM()
    orch = OrchestratorService(FakeRAGService(), OfflineToolService())
    extra = {f"mcp_tool_{i:02d}": _spec(f"mcp_tool_{i:02d}") for i in range(50)}
    events = await _collect(
        orch.execute(
            "hello", llm, modules=["numpy"], params={"context_window": 2048},
            extra_tools=extra,
        )
    )
    assert events[-1]["type"] == "done"
    assert "[truncated]" in llm.system  # the guard DID engage...
    for name in list(extra) + ["rag_query"]:
        assert name in llm.system, f"{name} severed from tool list"


class GatedSynthesisLLM(ToolCallingLLM):
    """Synthesis stream that blocks mid-generation until the consumer has
    SEEN the first token — proves deltas cross the executor boundary as
    they are produced, not collected up front (r4 verdict item 1)."""

    def __init__(self, gate):
        super().__init__()
        self.gate = gate
        self.late = False

    def stream_chat(self, messages, system=None):
        yield ChatDelta(text="first ")
        if not self.gate.wait(10):
            self.late = True
        yield ChatDelta(text="second")


async def test_synthesis_streams_during_generation():
    import threading

    gate = threading.Event()
    llm = GatedSynthesisLLM(gate)
    orch = OrchestratorService(FakeRAGService(), OfflineToolService())
    tokens = []
    async for e in orch.execute("what is broadcasting?", llm, modules=["numpy"]):
        if e["type"] == "token":
            tokens.append(e["content"])
            gate.set()  # only reachable if the first delta streamed out
    assert not llm.late, "first token never reached the consumer mid-generation"
    assert tokens == ["first ", "second"]
