"""VectorIndex build/persist/mutate contract (reference
tests/unit/test_document_index.py analog)."""

import numpy as np

from tensortruth_tpu.index.chunker import hierarchical_chunk
from tensortruth_tpu.index.store import VectorIndex, sanitize_model_id

import hashlib


def _stable_seed(t: str) -> int:
    return int.from_bytes(hashlib.blake2b(t.encode(), digest_size=4).digest(), "little")



def _embed_fn(dim=8):
    def fn(texts):
        out = np.zeros((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(_stable_seed(t))
            v = rng.standard_normal(dim)
            out[i] = v / np.linalg.norm(v)
        return out

    return fn


def _build(tiny_tokenizer, sample_text, doc_id="doc1"):
    nodes = hierarchical_chunk(
        sample_text, tiny_tokenizer, doc_id, chunk_sizes=[128, 32], chunk_overlap=8
    )
    return VectorIndex.build(
        nodes,
        _embed_fn(),
        embedding_model="tiny-embedder",
        chunk_sizes=[128, 32],
        chunk_overlap=8,
    )


def test_build_embeds_only_leaves(tiny_tokenizer, sample_text):
    idx = _build(tiny_tokenizer, sample_text)
    n_leaves = sum(1 for n in idx.store.nodes() if n.is_leaf)
    assert idx.n_rows == n_leaves
    assert idx.n_alive == n_leaves
    assert len(idx.store) > n_leaves  # parents in hierarchy only


def test_save_load_roundtrip(tiny_tokenizer, sample_text, tmp_path):
    idx = _build(tiny_tokenizer, sample_text)
    idx.save(tmp_path / "mod")
    assert VectorIndex.is_valid(tmp_path / "mod")
    idx2 = VectorIndex.load(tmp_path / "mod")
    assert idx2.n_rows == idx.n_rows
    m1, r1 = idx.matrix()
    m2, r2 = idx2.matrix()
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(r1, r2)
    assert idx2.metadata["index_version"] == "1.0"
    assert idx2.metadata["embedding_model"] == "tiny-embedder"
    assert idx2.metadata["chunk_sizes"] == [128, 32]


def test_incremental_add_and_remove(tiny_tokenizer, sample_text):
    idx = _build(tiny_tokenizer, sample_text, doc_id="doc1")
    n0 = idx.n_alive
    extra = hierarchical_chunk(
        "Another document. " * 100, tiny_tokenizer, "doc2",
        chunk_sizes=[128, 32], chunk_overlap=8,
    )
    added = idx.add_nodes(extra, _embed_fn())
    assert added > 0
    assert idx.n_alive == n0 + added

    removed = idx.remove_document("doc2")
    assert removed == added
    assert idx.n_alive == n0
    assert idx.n_rows == n0 + added  # tombstoned, not compacted

    mat, row_map = idx.matrix()
    assert mat.shape[0] == n0  # compacted view hides tombstones
    for r in row_map:
        assert idx.node_of_row(int(r)).doc_id == "doc1"

    idx.compact()
    assert idx.n_rows == n0


def test_sanitize_model_id():
    assert sanitize_model_id("BAAI/bge-m3") == "bge-m3"
    assert sanitize_model_id("bge-m3") == "bge-m3"
