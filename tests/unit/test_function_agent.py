"""FunctionAgent loop: termination, retry ladder, tool dispatch, side-channel.

Mirrors the reference orchestrator loop contract
(reference services/orchestrator_service.py:101-116, 504-515, 646-1006,
938-989): bounded iterations, transient-error retry, parallel tool calls,
scratchpad summaries vs full-output side channel."""

import pytest

from tensortruth_tpu.agents.function_agent import (
    SCRATCHPAD_SUMMARY_CHARS,
    FunctionAgent,
    is_transient_error,
)
from tensortruth_tpu.services.tool_service import ToolSpec


def spec(name, fn):
    return ToolSpec(name=name, description=name, parameters={}, fn=fn)


class ScriptedLLM:
    """chat_with_tools returns scripted (text, calls) turns; raises scripted
    exceptions first if given."""

    def __init__(self, turns, raises=()):
        self.turns = list(turns)
        self.raises = list(raises)
        self.seen_messages = []

    def chat_with_tools(self, messages, schemas, system_prompt=None):
        self.seen_messages.append([dict(m) for m in messages])
        if self.raises:
            raise self.raises.pop(0)
        if len(self.turns) > 1:
            return self.turns.pop(0)
        return self.turns[0]


async def collect(agent, task, context):
    return [e async for e in agent.run(task, context)]


def test_is_transient_error():
    assert is_transient_error(Exception("Connection reset by peer"))
    assert is_transient_error(Exception("503 service overloaded"))
    assert not is_transient_error(Exception("invalid api key"))


async def test_no_llm_yields_error():
    events = await collect(FunctionAgent(), "hi", {})
    assert events == [{"type": "error", "error": "no LLM available for agent"}]


async def test_direct_answer_no_tools():
    llm = ScriptedLLM([("the answer", None)])
    events = await collect(FunctionAgent(), "q", {"llm": llm})
    assert events[-1]["type"] == "agent_done"
    assert events[-1]["content"] == "the answer"
    assert events[-1]["tool_outputs"] == []


async def test_tool_call_then_answer_with_side_channel():
    long_result = "R" * (SCRATCHPAD_SUMMARY_CHARS + 500)

    async def lookup(**kw):
        return long_result

    llm = ScriptedLLM(
        [
            ("", [{"name": "lookup", "arguments": {"q": "x"}}]),
            ("done!", None),
        ]
    )
    agent = FunctionAgent(context={"extra_tools": {"lookup": spec("lookup", lookup)}})
    events = await collect(agent, "q", {"llm": llm})

    kinds = [e["type"] for e in events]
    assert kinds == ["tool_phase", "tool_progress", "agent_done"]
    # full output goes to the synthesis side channel un-truncated ...
    assert agent.full_outputs[0]["output"] == long_result
    assert events[-1]["tool_outputs"][0]["output"] == long_result
    # ... while the loop scratchpad keeps only the summary excerpt
    tool_msgs = [m for m in llm.seen_messages[-1] if m["role"] == "tool"]
    assert len(tool_msgs[0]["content"]) == SCRATCHPAD_SUMMARY_CHARS


async def test_parallel_tool_calls_same_iteration():
    calls_seen = []

    async def t1(**kw):
        calls_seen.append("t1")
        return "r1"

    async def t2(**kw):
        calls_seen.append("t2")
        return {"k": 2}

    llm = ScriptedLLM(
        [
            ("", [{"name": "t1", "arguments": {}}, {"name": "t2", "arguments": {}}]),
            ("ok", None),
        ]
    )
    agent = FunctionAgent(
        context={"extra_tools": {"t1": spec("t1", t1), "t2": spec("t2", t2)}}
    )
    events = await collect(agent, "q", {"llm": llm})
    assert sorted(calls_seen) == ["t1", "t2"]
    phase = next(e for e in events if e["type"] == "tool_phase")
    assert phase["tools"] == ["t1", "t2"]
    # per-call params ride the event for the live step timeline
    assert phase["calls"] == [{"tool": "t1", "params": {}},
                              {"tool": "t2", "params": {}}]
    progress = [e for e in events if e["type"] == "tool_progress"]
    assert [p["phase"] for p in progress] == ["completed", "completed"]
    assert progress[1]["output"] == '{"k": 2}'
    # non-str result json-serialized for the scratchpad
    assert agent.full_outputs[1]["output"] == '{"k": 2}'


async def test_unknown_tool_and_tool_exception_become_error_results():
    async def boom(**kw):
        raise RuntimeError("kaput")

    llm = ScriptedLLM(
        [
            ("", [{"name": "ghost", "arguments": {}}, {"name": "boom", "arguments": {}}]),
            ("fine", None),
        ]
    )
    agent = FunctionAgent(context={"extra_tools": {"boom": spec("boom", boom)}})
    events = await collect(agent, "q", {"llm": llm})
    outs = {o["tool"]: o["output"] for o in agent.full_outputs}
    assert outs["ghost"].startswith("ERROR: unknown tool")
    assert "kaput" in outs["boom"]
    # error results surface as phase="failed" on the wire (live timeline ✗)
    progress = {e["tool"]: e for e in events if e["type"] == "tool_progress"}
    assert progress["ghost"]["phase"] == "failed"
    assert progress["boom"]["phase"] == "failed"


async def test_transient_error_retries_once_then_succeeds(monkeypatch):
    import asyncio as aio

    monkeypatch.setattr(aio, "sleep", _instant_sleep)
    llm = ScriptedLLM([("recovered", None)], raises=[Exception("connection timeout")])
    events = await collect(FunctionAgent(), "q", {"llm": llm})
    assert events[-1]["content"] == "recovered"


async def test_non_transient_error_fails_immediately():
    llm = ScriptedLLM([("never", None)], raises=[Exception("invalid api key")])
    events = await collect(FunctionAgent(), "q", {"llm": llm})
    assert events == [{"type": "error", "error": "agent LLM failed: invalid api key"}]


async def test_two_transient_errors_exhaust_retry(monkeypatch):
    import asyncio as aio

    monkeypatch.setattr(aio, "sleep", _instant_sleep)
    llm = ScriptedLLM(
        [("never", None)],
        raises=[Exception("connection timeout"), Exception("503 overloaded")],
    )
    events = await collect(FunctionAgent(), "q", {"llm": llm})
    assert events[0]["type"] == "error"


async def test_not_implemented_means_no_tool_calling():
    llm = ScriptedLLM([("x", None)], raises=[NotImplementedError()])
    events = await collect(FunctionAgent(), "q", {"llm": llm})
    assert events == [{"type": "error", "error": "model lacks tool calling"}]


async def test_max_iterations_fallthrough_keeps_outputs():
    async def t(**kw):
        return "r"

    # LLM always asks for another tool call → loop must stop at max_iterations
    llm = ScriptedLLM([("", [{"name": "t", "arguments": {}}])])
    agent = FunctionAgent(
        context={"extra_tools": {"t": spec("t", t)}}, max_iterations=3
    )
    events = await collect(agent, "q", {"llm": llm})
    done = events[-1]
    assert done["type"] == "agent_done" and done["content"] == ""
    assert len(done["tool_outputs"]) == 3  # one per iteration, all preserved


async def test_allowed_tools_filters_tool_set():
    async def t(**kw):
        return "r"

    agent = FunctionAgent(
        context={"extra_tools": {"a": spec("a", t), "b": spec("b", t)}},
        allowed_tools=["a"],
    )
    assert set(agent._tools()) == {"a"}


async def test_show_reasoning_emits_loop_commentary():
    async def t(**kw):
        return "r"

    llm = ScriptedLLM(
        [("thinking about it", [{"name": "t", "arguments": {}}]), ("ok", None)]
    )
    agent = FunctionAgent(context={"extra_tools": {"t": spec("t", t)}})
    events = await collect(agent, "q", {"llm": llm, "show_reasoning": True})
    assert events[0] == {"type": "reasoning", "content": "thinking about it"}


async def _instant_sleep(_):
    return None
