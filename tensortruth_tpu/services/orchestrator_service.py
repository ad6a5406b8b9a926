"""Agentic chat orchestration: tool loop + synthesis handoff.

Mirrors reference services/orchestrator_service.py:646-1345:

* tool set = ``rag_query`` (retrieve-only against the TPU engine) + built-in
  web tools + MCP tools;
* system prompt composed from role, attached module list, tool-routing
  rules, and the explicit tool list (reference :391-553);
* context budgeting 12% system / 18% history / 18% user / 50% response with
  CHARS_PER_TOKEN=4 (reference :59-65,559-636);
* FunctionAgent loop (max 10 iterations) with transient retry, then
  SynthesisService streams the final cited answer (reference :1008-1043);
* sources side-channel: rag_query results surface as SourceNodes for the
  ``sources`` WS message.
"""

from __future__ import annotations

import asyncio
import logging
from typing import AsyncIterator

from tensortruth_tpu.agents.function_agent import FunctionAgent
from tensortruth_tpu.core.prompts import current_date_context
from tensortruth_tpu.services.synthesis_service import SynthesisService
from tensortruth_tpu.services.tool_service import ToolSpec

logger = logging.getLogger(__name__)

CHARS_PER_TOKEN = 4
BUDGET_SYSTEM, BUDGET_HISTORY, BUDGET_USER, BUDGET_RESPONSE = 0.12, 0.18, 0.18, 0.50
MAX_ITERATIONS = 10

ORCHESTRATOR_SYSTEM_PROMPT = (
    "You are the research orchestrator of a document-intelligence "
    "assistant. Decide which tools answer the user's request, call them "
    "(several in parallel when independent), then stop calling tools and "
    "reply once you have enough evidence.\n\n"
    "{date_context}\n\n"
    "Routing rules:\n"
    "1. Questions about the attached knowledge modules ({modules}) go to "
    "`rag_query` FIRST.\n"
    "2. Current events, library versions, or anything outside the modules: "
    "`search_web`, then `fetch_page` on the most promising results.\n"
    "3. Academic papers: `search_arxiv`.\n"
    "4. Do not repeat a tool call with identical arguments.\n"
    "5. After the final tool round, answer concisely — a synthesis stage "
    "will write the full cited answer from complete tool outputs.\n\n"
    "Available tools:\n{tool_list}\n"
)


def budget_history(history: list[dict], context_window: int) -> list[dict]:
    """Char-budget trim, newest first (reference :559-636)."""
    budget = int(context_window * BUDGET_HISTORY) * CHARS_PER_TOKEN
    out: list[dict] = []
    used = 0
    for msg in reversed(history):
        n = len(msg.get("content", ""))
        if used + n > budget:
            break
        out.append(msg)
        used += n
    return list(reversed(out))


class OrchestratorService:
    def __init__(self, rag_service, tool_service, config=None):
        self.rag_service = rag_service
        self.tool_service = tool_service
        self.config = config
        self.last_sources: list = []

    def _rag_tool(self, params: dict) -> ToolSpec:
        service = self.rag_service
        outer = self

        async def rag_query(query: str):
            result = await asyncio.to_thread(service.retrieve, query, params)
            outer.last_sources.extend(result.sources)
            if not result.sources:
                return "No indexed documents matched this query."
            parts = [
                f"[{i + 1}] (score {s.score:.2f}, {s.metadata.get('module', '?')}) {s.content}"
                for i, s in enumerate(result.sources)
            ]
            return "\n\n".join(parts)

        return ToolSpec(
            name="rag_query",
            description=(
                "Retrieve the most relevant chunks from the attached knowledge "
                "modules for a search query. Returns scored excerpts."
            ),
            parameters={
                "type": "object",
                "properties": {"query": {"type": "string"}},
                "required": ["query"],
            },
            fn=rag_query,
        )

    def _system_prompt(self, modules: list[str], tools: dict) -> str:
        tool_list = "\n".join(
            f"- {t.name}: {t.description}" for t in tools.values()
        )
        return ORCHESTRATOR_SYSTEM_PROMPT.format(
            date_context=current_date_context(),
            modules=", ".join(modules) or "none",
            tool_list=tool_list,
        )

    async def execute(
        self,
        prompt: str,
        llm,
        synthesis_llm=None,
        modules: list[str] | None = None,
        params: dict | None = None,
        history: list[dict] | None = None,
        extra_tools: dict | None = None,
    ) -> AsyncIterator[dict]:
        """Yields WS events; final 'done' carries the synthesized answer.

        ``extra_tools`` lets the caller add service-backed tools (MCP
        management, project ingestion — services/orchestrator_tools.py).
        """
        params = params or {}
        modules = modules or []
        self.last_sources = []

        extra_tools = dict(extra_tools or {})
        # rag_query exists whenever a retrieval engine is loaded — catalog
        # modules AND/OR session/project document indexes.
        if modules or getattr(self.rag_service, "engine", None) is not None:
            extra_tools["rag_query"] = self._rag_tool(params)
        agent = FunctionAgent(
            context={
                "llm": llm,
                "tool_service": self.tool_service,
                "extra_tools": extra_tools,
                "history": budget_history(
                    history or [], params.get("context_window", 8192)
                ),
                "show_reasoning": bool(
                    self.config and self.config.agent.show_orchestrator_reasoning
                ),
            },
            max_iterations=params.get("max_iterations", MAX_ITERATIONS),
        )
        all_tools = dict(extra_tools)
        all_tools.update(self.tool_service.tools)
        agent.system_prompt = self._system_prompt(modules, all_tools)

        agent_answer = ""
        tool_outputs: list[dict] = []
        async for event in agent.run(prompt):
            if event["type"] == "agent_done":
                agent_answer = event["content"]
                tool_outputs = event["tool_outputs"]
            else:
                yield event
                if event["type"] == "error":
                    return

        sources = list(self.last_sources)
        if sources:
            yield {"type": "sources", "sources": [s.to_dict() for s in sources]}

        if not tool_outputs and agent_answer:
            # No tools ran — the loop answer IS the final answer.
            yield {"type": "token", "content": agent_answer}
            yield {"type": "done", "content": agent_answer}
            return

        synthesis = SynthesisService(
            synthesis_llm or llm,
            context_window=params.get("context_window", 8192),
        )
        parts: list[str] = []
        loop = asyncio.get_running_loop()
        deltas = await loop.run_in_executor(
            None,
            lambda: list(
                synthesis.synthesize(prompt, tool_outputs, sources, agent_answer)
            ),
        )
        for d in deltas:
            if d.thinking:
                yield {"type": "thinking", "content": d.thinking}
            if d.text:
                parts.append(d.text)
                yield {"type": "token", "content": d.text}
        yield {"type": "done", "content": "".join(parts)}
