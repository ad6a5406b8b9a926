"""Property-based tests (hypothesis is a dev dep in the reference too,
pyproject.toml:117)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tensortruth_tpu.index.chunker import _token_windows, hierarchical_chunk
from tensortruth_tpu.index.nodes import HierarchyStore
from tensortruth_tpu.retrieval.automerge import auto_merge
from tensortruth_tpu.tokenization import SimpleTokenizer

TOK = SimpleTokenizer()


@given(
    n_tokens=st.integers(0, 5000),
    size=st.integers(1, 512),
    overlap_frac=st.floats(0, 0.9),
)
@settings(max_examples=100, deadline=None)
def test_token_windows_cover_everything(n_tokens, size, overlap_frac):
    overlap = int(size * overlap_frac)
    windows = _token_windows(n_tokens, size, overlap)
    if n_tokens == 0:
        assert windows == []
        return
    assert windows[0][0] == 0
    assert windows[-1][1] == n_tokens
    covered = set()
    for s, e in windows:
        assert 0 < e - s <= size
        covered.update(range(s, e))
    assert covered == set(range(n_tokens))  # no token dropped


@given(
    n_words=st.integers(1, 400),
    seed=st.integers(0, 1000),
)
@settings(max_examples=30, deadline=None)
def test_hierarchy_invariants(n_words, seed):
    rng = np.random.default_rng(seed)
    text = " ".join(f"w{rng.integers(0, 50)}" for _ in range(n_words))
    nodes = hierarchical_chunk(text, TOK, "doc", chunk_sizes=[64, 16], chunk_overlap=4)
    by_id = {n.node_id: n for n in nodes}
    for n in nodes:
        # span sanity
        assert 0 <= n.start <= n.end <= len(text)
        assert n.text == text[n.start : n.end]
        # child containment
        if n.parent_id:
            p = by_id[n.parent_id]
            assert p.start <= n.start and n.end <= p.end
            assert n.level == p.level + 1
    # every non-leaf has children; leaves at deepest reached level only
    for n in nodes:
        if n.child_ids:
            assert all(c in by_id for c in n.child_ids)


@given(
    scores=st.lists(st.floats(0.01, 1.0), min_size=1, max_size=12),
    ratio=st.floats(0.1, 0.9),
)
@settings(max_examples=50, deadline=None)
def test_automerge_fixpoint_and_order(scores, ratio):
    """auto_merge output is a fixpoint, sorted desc, and never larger."""
    # Flat two-level tree: one parent with 4 children c0..c3; hits are a
    # random subset of children (ids cycle over c0..c3).
    from tensortruth_tpu.index.nodes import Node

    store = HierarchyStore()
    p = Node(node_id="p", text="p", level=0, doc_id="d")
    kids = [Node(node_id=f"c{i}", text="x", level=1, doc_id="d", parent_id="p")
            for i in range(4)]
    p.child_ids = [k.node_id for k in kids]
    store.add_all([p] + kids)
    store.finalize_leaves()

    hits = sorted(
        {(f"c{i % 4}", s) for i, s in enumerate(scores)}, key=lambda x: -x[1]
    )
    # dedupe ids keeping best score (auto_merge assumes unique ids)
    seen, uniq = set(), []
    for nid, s in hits:
        if nid not in seen:
            seen.add(nid)
            uniq.append((nid, s))
    merged = auto_merge(uniq, store, ratio=ratio)
    assert len(merged) <= len(uniq)
    got = [s for _, s in merged]
    assert got == sorted(got, reverse=True)
    # fixpoint: merging again changes nothing
    assert auto_merge(merged, store, ratio=ratio) == merged


@given(
    texts=st.lists(st.text(min_size=0, max_size=200), min_size=1, max_size=8),
    max_length=st.integers(8, 64),
)
@settings(max_examples=50, deadline=None)
def test_batch_encode_shapes_and_mask(texts, max_length):
    ids, mask = TOK.encode_batch(texts, max_length)
    assert ids.shape == mask.shape == (len(texts), max_length)
    for i, t in enumerate(texts):
        n = int(mask[i].sum())
        assert 0 < n <= max_length  # at least CLS+SEP
        assert (ids[i, :n] != TOK.pad_id).all() or n <= 2
        assert (mask[i, n:] == 0).all()
        assert ids[i, 0] == TOK.cls_id
