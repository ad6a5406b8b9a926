"""Query-adaptive web synthesis (reference core/synthesis.py:77-349 parity)."""

import pytest

from tensortruth_tpu.core.source import SourceNode
from tensortruth_tpu.web.synthesis import (
    CitationStyle,
    QueryType,
    build_citation_instructions,
    build_no_sources_prompt,
    build_structure_template,
    build_synthesis_prompt,
    detect_query_type,
    get_model_prompt_config,
    no_sources_fallback_text,
)


@pytest.mark.parametrize(
    "query,expected",
    [
        ("who is Grace Hopper", QueryType.PERSON),
        ("biography of Turing", QueryType.PERSON),
        ("jax versus torch performance", QueryType.COMPARISON),
        ("difference between TPU and GPU", QueryType.COMPARISON),
        ("pros and cons of IVF indexes", QueryType.COMPARISON),
        ("latest TPU announcements", QueryType.NEWS_EVENT),
        ("what happened at the launch", QueryType.NEWS_EVENT),
        ("how to shard a matrix in jax", QueryType.TECHNICAL),
        ("pallas kernel tutorial", QueryType.TECHNICAL),
        ("tell me about photosynthesis", QueryType.GENERAL),
    ],
)
def test_detect_query_type(query, expected):
    assert detect_query_type(query) == expected


def test_model_prompt_config_deepseek_r1():
    cfg = get_model_prompt_config("deepseek-r1:8b")
    assert cfg.use_system_prompt is False
    assert cfg.temperature_override == 0.6
    assert cfg.include_reasoning_directives is True
    assert cfg.model_family == "deepseek-r1"


def test_model_prompt_config_families_and_default():
    assert get_model_prompt_config("qwen3:8b-q8_0").model_family == "qwen3"
    assert get_model_prompt_config("llama3.1:8b").model_family == "llama"
    assert get_model_prompt_config(None).use_system_prompt is True
    assert get_model_prompt_config("mistral").model_family == "generic"


def test_citation_instructions_styles():
    hyper = build_citation_instructions(
        CitationStyle.HYPERLINK, "My Page", "https://x.org/p"
    )
    assert "[My Page](https://x.org/p)" in hyper
    assert "Never bare numbers" in hyper
    bracket = build_citation_instructions(CitationStyle.BRACKET)
    assert "[Source N]" in bracket
    assert "hyperlink" not in bracket.lower()


def test_structure_template_adapts_to_query_type():
    for qtype, marker in [
        (QueryType.PERSON, "Career"),
        (QueryType.COMPARISON, "Differences"),
        (QueryType.NEWS_EVENT, "Timeline"),
        (QueryType.TECHNICAL, "Implementation"),
        (QueryType.GENERAL, "Key Concepts"),
    ]:
        t = build_structure_template(qtype, CitationStyle.HYPERLINK)
        assert "### Overview" in t
        assert marker in t, (qtype, marker)


def _sources():
    return [
        SourceNode(title="Page A", url="https://a.org", content="alpha facts"),
        SourceNode(title="Page B", url="https://b.org", content="beta facts"),
    ]


def test_build_synthesis_prompt_hyperlink_system_split():
    prompt, system, temp = build_synthesis_prompt(
        "how to do X", _sources(), model_name="llama3.1:8b"
    )
    assert system is not None and "research assistant" in system
    assert temp is None
    assert "[Page A](https://a.org)" in prompt  # example drawn from source 1
    assert "### Source: [Page B](https://b.org)" in prompt
    assert "Question: how to do X" in prompt


def test_build_synthesis_prompt_deepseek_folds_system():
    prompt, system, temp = build_synthesis_prompt(
        "how to do X", _sources(), model_name="deepseek-r1:14b"
    )
    assert system is None  # folded into the user turn
    assert "research assistant" in prompt
    assert temp == 0.6


def test_build_synthesis_prompt_bracket_numbers_sources():
    prompt, _, _ = build_synthesis_prompt(
        "q", _sources(), citation_style=CitationStyle.BRACKET
    )
    assert "[Source 1] Page A" in prompt
    assert "[Source 2] Page B" in prompt


def test_no_sources_prompt_and_fallback():
    p = build_no_sources_prompt(
        "obscure query",
        [("Weak title", 0.04)],
        [("Thin page", 0.02)],
        0.1,
        0.1,
    )
    assert '"obscure query"' in p
    assert "Weak title" in p and "4%" in p
    assert "Thin page" in p
    assert "obscure" in no_sources_fallback_text("obscure")
