"""Web pipeline building blocks: thin-content penalty, context fitting,
adaptive fetch, source metrics (reference web_search.py:176-346,
source_pipeline.py:159-318, core/source_metrics.py)."""

import numpy as np
import pytest

from tensortruth_tpu.core.source import SourceNode, SourceStatus
from tensortruth_tpu.web.metrics import compute_source_metrics
from tensortruth_tpu.web.pipeline import (
    THIN_CONTENT_CHARS,
    fetch_adaptive,
    fit_sources_to_context,
    rerank_sources,
)


class FixedReranker:
    """Returns a preset score per doc, in input order."""

    def __init__(self, scores):
        self.scores = scores

    def rerank(self, query, texts, top_n):
        s = np.asarray(self.scores[: len(texts)], np.float32)
        return np.argsort(-s)[:top_n], s


def _src(i, content="", score=None, url=None):
    return SourceNode(id=f"s{i}", title=f"t{i}", content=content, score=score,
                      url=url or f"https://x/{i}")


def test_thin_content_penalty_halves_floor():
    """A near-empty page's score is multiplied by ~0.5; a full page keeps
    its raw score (reference thin-content factor 0.5-1.0x)."""
    rr = FixedReranker([0.8, 0.8])
    thin = _src(0, content="x" * 10)
    full = _src(1, content="y" * (THIN_CONTENT_CHARS + 1))
    passed, _ = rerank_sources(rr, "q", [thin, full], lambda s: s.content, 0.0)
    by_id = {s.id: s.score for s in passed}
    assert by_id["s1"] == pytest.approx(0.8, abs=1e-6)
    assert by_id["s0"] == pytest.approx(0.8 * (0.5 + 0.5 * 10 / THIN_CONTENT_CHARS), abs=1e-6)


def test_rerank_sources_threshold_marks_filtered():
    rr = FixedReranker([0.9, 0.05])
    a, b = _src(0, "A" * 2000), _src(1, "B" * 2000)
    passed, filtered = rerank_sources(rr, "q", [a, b], lambda s: s.content, 0.3)
    assert [s.id for s in passed] == ["s0"]
    assert [s.id for s in filtered] == ["s1"]
    assert filtered[0].status == SourceStatus.FILTERED


def test_rerank_sources_no_reranker_passthrough():
    srcs = [_src(0, "A"), _src(1, "B")]
    passed, filtered = rerank_sources(None, "q", srcs, lambda s: s.content, 0.9)
    assert passed == srcs and filtered == []


def test_fit_sources_budget_and_per_source_cap():
    """60% input budget, 15% per-source cap, fill best-first; oversized
    tail sources are skipped, kept ones truncated to the cap."""
    ctx = 1000  # budget = 600*4 = 2400 chars; cap = 150*4 = 600 chars
    sources = [
        _src(0, "a" * 5000, score=0.9),
        _src(1, "b" * 600, score=0.8),
        _src(2, "c" * 5000, score=0.7),
        _src(3, "d" * 5000, score=0.6),
        _src(4, "e" * 5000, score=0.5),
        _src(5, "f" * 100, score=0.4),
    ]
    out = fit_sources_to_context(sources, ctx)
    ids = [s.id for s in out]
    assert ids[0] == "s0" and len(out[0].content) == 600  # truncated to cap
    total = sum(len(s.content) for s in out)
    assert total <= 2400
    # budget exactly filled by the four top-scored sources; nothing else
    # fits (greedy fill-from-top, no backtracking — reference behavior)
    assert ids == ["s0", "s1", "s2", "s3"]


async def test_fetch_adaptive_overprovisions_and_classifies(monkeypatch):
    """Batches of needed+2; failures classified (timeout/too_short/http)."""
    from tensortruth_tpu.web import pipeline as pl

    calls = []

    def fake_fetch(url):
        calls.append(url)
        i = int(url.rsplit("/", 1)[1])
        if i == 0:
            raise ValueError("boom")  # classified as http_error
        if i == 1:
            return "t", "x"  # too short
        return f"title{i}", "word " * 100

    monkeypatch.setattr(
        "tensortruth_tpu.web.fetch.fetch_url_as_markdown", fake_fetch
    )
    events = []

    async def emit(ev):
        events.append(ev)

    sources = [_src(i) for i in range(6)]
    got = await fetch_adaptive(sources, needed=2, emit=emit)
    assert len(got) == 2
    assert all(s.status == SourceStatus.SUCCESS for s in got)
    # first batch = needed+2 = 4 urls; two fail → second batch fetched
    assert len(calls) >= 4
    failed = [s for s in sources if s.status == SourceStatus.FAILED]
    errs = {s.id: s.error for s in failed}
    assert errs["s1"] == "too_short"
    assert errs["s0"].startswith("http_error")  # ValueError → http_error bucket
    # one tool_progress per fetched URL, plus a per-batch "fetching (x/y)"
    # status counter for the phase indicator
    progress = [e for e in events if e["type"] == "tool_progress"]
    counters = [e for e in events if e["type"] == "status"]
    assert len(progress) == len(calls)
    assert counters and all(c["status"] == "fetching" for c in counters)
    assert counters[-1]["message"].endswith("(2/2)")


def test_source_metrics_aggregation():
    a = _src(0, "x" * 400, score=0.5)
    a.status = SourceStatus.SUCCESS
    b = _src(1, "", score=0.9)
    b.status = SourceStatus.FAILED
    m = compute_source_metrics([a, b])
    assert m["total"] == 2
    assert m["by_status"] == {"success": 1, "failed": 1}
    assert m["score_mean"] == pytest.approx(0.7)
    assert m["score_max"] == 0.9
    assert m["estimated_tokens"] == 100


def test_rerank_sources_empty_and_all_filtered():
    rr = FixedReranker([0.01, 0.02])
    a, b = _src(0, "A" * 2000), _src(1, "B" * 2000)
    passed, filtered = rerank_sources(rr, "q", [a, b], lambda s: s.content, 0.5)
    assert passed == [] and len(filtered) == 2
    passed, filtered = rerank_sources(rr, "q", [], lambda s: s.content, 0.5)
    assert passed == [] and filtered == []


def test_fit_sources_keeps_order_by_score_not_input():
    out = fit_sources_to_context(
        [_src(0, "a" * 100, score=0.1), _src(1, "b" * 100, score=0.9)],
        context_window=1000,
    )
    assert [s.id for s in out] == ["s1", "s0"]


def test_source_metrics_empty():
    m = compute_source_metrics([])
    assert m["total"] == 0 and m["score_mean"] is None
    assert m["estimated_tokens"] == 0
