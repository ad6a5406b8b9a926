import numpy as np
import pytest

from tensortruth_tpu.index.chunker import (
    ChunkingStrategy,
    build_hierarchy,
    chunk_document,
    hierarchical_chunk,
    semantic_chunk,
    split_sentences,
    _token_windows,
)
from tensortruth_tpu.index.nodes import HierarchyStore


def test_token_windows_overlap():
    w = _token_windows(100, 40, 10)
    assert w[0] == (0, 40)
    assert w[1][0] == 30  # step = size - overlap
    assert w[-1][1] == 100
    # full coverage
    covered = set()
    for s, e in w:
        covered.update(range(s, e))
    assert covered == set(range(100))


def test_token_windows_short_input():
    assert _token_windows(5, 40, 10) == [(0, 5)]
    assert _token_windows(0, 40, 10) == []


def test_hierarchical_levels_and_links(tiny_tokenizer, sample_text):
    nodes = hierarchical_chunk(
        sample_text, tiny_tokenizer, doc_id="d1", chunk_sizes=[256, 64, 32],
        chunk_overlap=8,
    )
    levels = {n.level for n in nodes}
    assert levels == {0, 1, 2}
    by_id = {n.node_id: n for n in nodes}
    for n in nodes:
        if n.level > 0:
            assert n.parent_id in by_id
            assert n.node_id in by_id[n.parent_id].child_ids
        # chunk text matches its char span in the document
        assert sample_text[n.start : n.end] == n.text
    leaves = [n for n in nodes if n.is_leaf]
    assert all(n.level == 2 for n in leaves)
    # leaf token lengths bounded by leaf chunk size
    for n in leaves:
        assert len(tiny_tokenizer.encode(n.text)) <= 32


def test_hierarchy_store_roundtrip(tmp_path, tiny_tokenizer, sample_text):
    nodes = hierarchical_chunk(
        sample_text, tiny_tokenizer, doc_id="d1", chunk_sizes=[128, 32], chunk_overlap=8
    )
    store = build_hierarchy(nodes)
    assert len(store.leaf_ids) == sum(1 for n in nodes if n.is_leaf)
    store.save(tmp_path / "nodes.jsonl")
    loaded = HierarchyStore.load(tmp_path / "nodes.jsonl")
    assert len(loaded) == len(store)
    assert loaded.leaf_ids == store.leaf_ids
    row0 = loaded.leaf_by_row(0)
    assert loaded.row_of(row0.node_id) == 0


def test_remove_doc(tiny_tokenizer, sample_text):
    n1 = hierarchical_chunk(sample_text, tiny_tokenizer, "d1", chunk_sizes=[128, 32], chunk_overlap=8)
    n2 = hierarchical_chunk(sample_text, tiny_tokenizer, "d2", chunk_sizes=[128, 32], chunk_overlap=8)
    store = build_hierarchy(n1 + n2)
    before = len(store.leaf_ids)
    removed = store.remove_doc("d1")
    assert len(removed) == sum(1 for n in n1 if n.is_leaf)
    assert len(store.leaf_ids) == before - len(removed)
    assert all(store.get(nid).doc_id == "d2" for nid in store.leaf_ids)


def test_split_sentences():
    text = "One sentence. Another one! A third?\n\nNew para here."
    spans = split_sentences(text)
    assert [s.strip() for s, _, _ in spans] == [
        "One sentence.",
        "Another one!",
        "A third?",
        "New para here.",
    ]
    for s, a, b in spans:
        assert text[a:b] == s


def _fake_embed(groups):
    # Map each group to a vector determined by its topic marker so that
    # topic changes create large cosine distances.
    out = np.zeros((len(groups), 8), dtype=np.float32)
    for i, g in enumerate(groups):
        out[i, hash(g.split()[0]) % 8] = 1.0
    return out


def test_semantic_chunk_covers_text(tiny_tokenizer):
    text = ". ".join(f"Topic{i % 3} sentence number {i} with words" for i in range(20)) + "."
    nodes = semantic_chunk(text, tiny_tokenizer, "d1", _fake_embed)
    assert nodes
    for n in nodes:
        assert text[n.start : n.end] == n.text
    # sections are ordered and non-overlapping
    for a, b in zip(nodes, nodes[1:]):
        assert a.end <= b.start


def test_chunk_document_dispatch(tiny_tokenizer, sample_text):
    h = chunk_document(sample_text, tiny_tokenizer, "d", strategy="hierarchical",
                       chunk_sizes=[128, 32], chunk_overlap=8)
    assert {n.level for n in h} == {0, 1}
    with pytest.raises(ValueError):
        chunk_document(sample_text, tiny_tokenizer, "d", strategy="semantic")
    sh = chunk_document(
        sample_text, tiny_tokenizer, "d",
        strategy=ChunkingStrategy.SEMANTIC_HIERARCHICAL,
        embed_fn=_fake_embed, chunk_sizes=[128, 32], chunk_overlap=8,
    )
    for n in sh:
        assert sample_text[n.start : n.end] == n.text


def test_tokenizer_batch_shapes(tiny_tokenizer):
    ids, mask = tiny_tokenizer.encode_batch(["hello world", "a"], max_length=8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids[0, 0] == tiny_tokenizer.cls_id
    assert mask[1].sum() == 3  # cls + 1 token + sep
    # pair encoding
    ids2, mask2 = tiny_tokenizer.encode_batch(
        ["query words here"], max_length=16, pair=["document body text"]
    )
    assert ids2.shape == (1, 16)
    row = list(ids2[0][mask2[0] == 1])
    assert row.count(tiny_tokenizer.sep_id) == 3  # </s></s> ... </s>
