"""Auto-merging semantics (reference AutoMergingRetriever contract,
rag_engine.py:641-644)."""

import pytest

from tensortruth_tpu.index.nodes import HierarchyStore, Node
from tensortruth_tpu.retrieval.automerge import auto_merge


def _tree():
    """root(p) with children c1..c4; c1 has grandchildren g1, g2."""
    store = HierarchyStore()
    p = Node(node_id="p", text="parent", level=0, doc_id="d")
    kids = [
        Node(node_id=f"c{i}", text=f"child{i}", level=1, doc_id="d", parent_id="p")
        for i in range(1, 5)
    ]
    p.child_ids = [k.node_id for k in kids]
    g = [
        Node(node_id=f"g{i}", text=f"grand{i}", level=2, doc_id="d", parent_id="c1")
        for i in range(1, 3)
    ]
    kids[0].child_ids = [x.node_id for x in g]
    store.add_all([p] + kids + g)
    store.finalize_leaves()
    return store


def test_no_merge_below_ratio():
    store = _tree()
    hits = [("c1", 0.9), ("c2", 0.8)]  # 2/4 = 0.5, not > 0.5
    assert auto_merge(hits, store) == hits


def test_merge_majority_children():
    store = _tree()
    hits = [("c1", 0.9), ("c2", 0.8), ("c3", 0.7)]  # 3/4 > 0.5
    merged = auto_merge(hits, store)
    assert len(merged) == 1
    assert merged[0][0] == "p"
    assert merged[0][1] == pytest.approx((0.9 + 0.8 + 0.7) / 3)


def test_cascading_merge():
    store = _tree()
    # Both grandchildren present → merge to c1; then c1+c2+c3 → merge to p.
    hits = [("g1", 0.9), ("g2", 0.8), ("c2", 0.7), ("c3", 0.6)]
    merged = auto_merge(hits, store)
    assert [nid for nid, _ in merged] == ["p"]


def test_unmerged_hits_preserved_sorted():
    store = _tree()
    hits = [("g1", 0.9), ("c2", 0.5)]
    merged = auto_merge(hits, store)
    assert merged == hits  # 1/2 grandchildren, 1/4 children — nothing merges


def test_unknown_ids_pass_through():
    store = _tree()
    hits = [("zzz", 0.4)]
    assert auto_merge(hits, store) == hits
