"""RankingStage, confidence gating, RetrievalMetrics
(reference tests/unit/core/test_ranking.py + test_retrieval_metrics.py analogs)."""

import numpy as np
import pytest

from tensortruth_tpu.core.source import SourceNode, SourceStatus
from tensortruth_tpu.retrieval.metrics import (
    calculate_entropy,
    compute_retrieval_metrics,
)
from tensortruth_tpu.retrieval.ranking import (
    ConfidenceLevel,
    RankingStage,
    apply_confidence_gate,
)


class FakeReranker:
    """Scores docs by keyword overlap with the query (deterministic)."""

    def rerank(self, query, docs, top_n):
        qset = set(query.lower().split())
        scores = np.array(
            [len(qset & set(d.lower().split())) / max(1, len(qset)) for d in docs],
            dtype=np.float32,
        )
        order = np.argsort(-scores, kind="stable")[:top_n]
        return order, scores


def _sources(texts):
    return [SourceNode(id=f"s{i}", content=t) for i, t in enumerate(texts)]


def test_rank_orders_by_relevance():
    stage = RankingStage(reranker=FakeReranker(), threshold=0.1)
    items = _sources(["alpha beta gamma", "unrelated words here", "alpha beta"])
    res = stage.rank(items, "alpha beta")
    assert res.passed[0].id in ("s0", "s2")
    assert all(s.score >= 0.1 for s in res.passed)
    assert all(s.status == SourceStatus.FILTERED for s in res.filtered)


def test_rank_top_n_marks_rest_filtered():
    stage = RankingStage(reranker=FakeReranker())
    items = _sources(["alpha", "alpha", "alpha"])
    res = stage.rank(items, "alpha", top_n=2)
    assert len(res.passed) == 2
    assert len(res.filtered) == 1
    assert res.filtered[0].score == 0.0


def test_passthrough_without_reranker():
    stage = RankingStage(threshold=0.5)
    items = _sources(["a", "b"])
    items[0].score = 0.9
    items[1].score = 0.1
    res = stage.rank(items, "q")
    assert [s.id for s in res.passed] == ["s0"]
    assert [s.id for s in res.filtered] == ["s1"]


def test_custom_instructions_change_query():
    captured = {}

    class Spy(FakeReranker):
        def rerank(self, query, docs, top_n):
            captured["query"] = query
            return super().rerank(query, docs, top_n)

    RankingStage(reranker=Spy()).rank(_sources(["x"]), "base", custom_instructions="ctx")
    assert "base" in captured["query"] and "ctx" in captured["query"]


def test_confidence_gate_levels():
    srcs = _sources(["a", "b", "c"])
    srcs[0].score, srcs[1].score, srcs[2].score = 0.8, 0.2, 0.01
    kept, level = apply_confidence_gate(srcs)
    assert level == ConfidenceLevel.NORMAL
    assert [s.id for s in kept] == ["s0", "s1"]  # 0.01 < hard cutoff dropped

    srcs2 = _sources(["a"])
    srcs2[0].score = 0.2
    _, level2 = apply_confidence_gate(srcs2)
    assert level2 == ConfidenceLevel.LOW

    srcs3 = _sources(["a"])
    srcs3[0].score = 0.01
    kept3, level3 = apply_confidence_gate(srcs3)
    assert kept3 == [] and level3 == ConfidenceLevel.NO_SOURCES


def test_entropy():
    assert calculate_entropy([]) == 0.0
    assert calculate_entropy([5]) == 0.0
    assert calculate_entropy([1, 1]) == pytest.approx(1.0)
    assert calculate_entropy([1, 1, 1, 1]) == pytest.approx(2.0)


def test_metrics_schema_and_values():
    srcs = _sources(["x" * 100, "y" * 200, "z" * 100])
    for s, sc in zip(srcs, (0.9, 0.5, 0.1)):
        s.score = sc
        s.metadata = {"filename": f"f{s.id}", "doc_type": "library"}
    srcs[2].metadata["filename"] = "fs0"  # duplicate source

    m = compute_retrieval_metrics(srcs)
    assert m.total_chunks == 3
    assert m.total_context_chars == 400
    assert m.estimated_tokens == 100
    assert m.score_max == pytest.approx(0.9)
    assert m.score_min == pytest.approx(0.1)
    assert m.high_confidence_ratio == pytest.approx(1 / 3)
    assert m.low_confidence_ratio == pytest.approx(1 / 3)
    assert m.unique_sources == 2  # fs0 duplicated across two chunks
    assert m.source_entropy == pytest.approx(calculate_entropy([2, 1]))

    d = m.to_dict()
    # Schema parity with reference retrieval_metrics.py:82-110
    assert set(d) == {
        "score_distribution", "diversity", "coverage", "quality", "configuration",
    }
    assert set(d["score_distribution"]) == {
        "mean", "median", "min", "max", "std", "q1", "q3", "iqr", "range",
    }


def test_metrics_empty():
    m = compute_retrieval_metrics([])
    assert m.total_chunks == 0
    assert m.score_mean is None
    assert m.to_dict()["coverage"]["total_chunks"] == 0
