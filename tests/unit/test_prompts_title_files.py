"""Prompt template contract, title generation, atomic file helpers, and the
ChatService facade (reference rag_engine.py:67-174, app_utils/
title_generation.py, app_utils/file_utils.py:10, services/chat_service.py)."""

import datetime
import json

import pytest

from tensortruth_tpu.core import prompts

# -------------------------------------------------------------------- prompts


def test_all_templates_format_with_their_variables():
    ctx = dict(context_str="CTX", chat_history="HIST", query_str="Q")
    for tpl in (prompts.CONTEXT_PROMPT_TEMPLATE, prompts.CONTEXT_PROMPT_LOW_CONFIDENCE):
        out = tpl.format(**ctx)
        assert "CTX" in out and "HIST" in out and "Q" in out
    out = prompts.CONTEXT_PROMPT_NO_SOURCES.format(chat_history="HIST", query_str="Q")
    assert "HIST" in out and "Q" in out
    out = prompts.CONDENSE_PROMPT_TEMPLATE.format(chat_history="HIST", question="Q")
    assert "HIST" in out and "Q" in out


def test_no_sources_template_mandates_fallback_labels():
    """The UI keys on the mandatory labels (reference rag_engine.py:114-132)."""
    t = prompts.CONTEXT_PROMPT_NO_SOURCES
    assert "NO INDEXED DATA FOUND" in t
    assert "General knowledge fallback:" in t
    assert "OUT OF SCOPE" in t


def test_current_date_context_grounds_today():
    line = prompts.current_date_context()
    today = datetime.date.today()
    assert today.strftime("%B") in line and str(today.year) in line


# ---------------------------------------------------------------------- title


def test_heuristic_title_normalizes_and_truncates():
    from tensortruth_tpu.app.title_generation import heuristic_title

    assert heuristic_title("  how   do\nI foo  ") == "how do I foo"
    assert heuristic_title("/web latest TPU news") == "latest TPU news"
    long = heuristic_title("x" * 100)
    assert len(long) == 48 and long.endswith("…")
    assert heuristic_title("   ") == "New Session"


class FakeLLM:
    def __init__(self, reply=None, err=None):
        self.reply, self.err = reply, err

    def complete(self, prompt):
        if self.err:
            raise self.err
        return self.reply


def test_smart_title_uses_llm_and_cleans_output():
    from tensortruth_tpu.app.title_generation import generate_smart_title

    t = generate_smart_title("q", llm=FakeLLM('"JAX Sharding Basics"\nextra line'))
    assert t == "JAX Sharding Basics"


def test_smart_title_falls_back_on_error_empty_or_overlong():
    from tensortruth_tpu.app.title_generation import generate_smart_title

    assert generate_smart_title("the prompt", llm=FakeLLM(err=RuntimeError("down"))) == "the prompt"
    assert generate_smart_title("the prompt", llm=FakeLLM(reply="")) == "the prompt"
    assert generate_smart_title("the prompt", llm=FakeLLM(reply="y" * 500)) == "the prompt"
    assert generate_smart_title("no llm at all") == "no llm at all"


# ----------------------------------------------------------------- file utils


def test_atomic_write_and_read_roundtrip(tmp_path):
    from tensortruth_tpu.app.file_utils import atomic_write_json, read_json

    p = tmp_path / "deep" / "nested" / "f.json"
    atomic_write_json(p, {"a": [1, 2], "s": "é"})
    assert read_json(p) == {"a": [1, 2], "s": "é"}
    # no temp droppings left behind
    assert [f.name for f in p.parent.iterdir()] == ["f.json"]


def test_atomic_write_failure_leaves_no_tmp_and_old_content(tmp_path):
    from tensortruth_tpu.app.file_utils import atomic_write_json, read_json

    p = tmp_path / "f.json"
    atomic_write_json(p, {"v": 1})
    with pytest.raises(TypeError):
        atomic_write_json(p, {"bad": object()})  # not JSON-serializable
    assert read_json(p) == {"v": 1}  # old content intact
    assert [f.name for f in tmp_path.iterdir()] == ["f.json"]


def test_read_json_defaults_on_missing_and_corrupt(tmp_path):
    from tensortruth_tpu.app.file_utils import read_json

    assert read_json(tmp_path / "nope.json", default={"d": 1}) == {"d": 1}
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert read_json(bad, default=[]) == []


# --------------------------------------------------------------- chat service


def test_chat_service_execute_pumps_generator_to_response():
    from tensortruth_tpu.core.source import SourceNode
    from tensortruth_tpu.services.chat_service import ChatService
    from tensortruth_tpu.services.rag_service import RAGChunk, RAGResponse

    src = SourceNode(id="s1", title="T", content="body", score=0.9)
    final = RAGResponse(text="hello world", sources=[src])

    class FakeRAG:
        def query(self, prompt, params=None, session_messages=None):
            def gen():
                yield RAGChunk(status="retrieving")
                yield RAGChunk(text="hello ")
                yield RAGChunk(text="world")
                return final

            return gen()

    svc = ChatService(FakeRAG())
    resp = svc.execute("q")
    assert resp.text == "hello world"
    dicts = ChatService.extract_sources(resp)
    assert dicts[0]["id"] == "s1" and dicts[0]["score"] == 0.9
