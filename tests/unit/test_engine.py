"""MultiIndexEngine: stacked multi-module search, balancing, cache, mutation
(reference tests/unit/test_rag_engine.py analog)."""

import numpy as np
import pytest

from tensortruth_tpu.index.chunker import hierarchical_chunk
from tensortruth_tpu.index.store import VectorIndex
from tensortruth_tpu.parallel import make_mesh
from tensortruth_tpu.retrieval.engine import MultiIndexEngine

import hashlib


def _stable_seed(t: str) -> int:
    return int.from_bytes(hashlib.blake2b(t.encode(), digest_size=4).digest(), "little")


DIM = 16


def _embed_fn(seed_base=0):
    def fn(texts):
        out = np.zeros((len(texts), DIM), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng((_stable_seed(t) + seed_base) % 2**32)
            v = rng.standard_normal(DIM)
            out[i] = v / np.linalg.norm(v)
        return out

    return fn


def _index(tokenizer, text, doc_id, module):
    nodes = hierarchical_chunk(
        text, tokenizer, doc_id, module=module, chunk_sizes=[128, 32], chunk_overlap=8
    )
    return VectorIndex.build(nodes, _embed_fn(), embedding_model="tiny")


@pytest.fixture
def engine(tiny_tokenizer, sample_text):
    idx_a = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    idx_b = _index(tiny_tokenizer, "Quantum physics text. " * 300, "docB", "mod_b")
    return MultiIndexEngine(
        {"mod_a": idx_a, "mod_b": idx_b}, similarity_top_k=5, use_fused=False
    )


def test_retrieve_returns_exact_top_hit(engine):
    # Query with the exact embedding of a known leaf → that leaf must rank 1st.
    idx = engine.indexes["mod_a"]
    mat, rows = idx.matrix()
    target_row = 3
    q = mat[target_row]
    results = engine.retrieve(q, "q1")
    assert results
    top = results[0]
    expected = idx.node_of_row(int(rows[target_row]))
    # Either the leaf itself or (if siblings merged) its parent.
    assert top.node_id in (expected.node_id, expected.parent_id)
    assert top.score == pytest.approx(1.0, abs=1e-3)


def test_balancing_caps_per_index(engine):
    """Direct _balance contract: per-index limit = max(1, total//n_indexes)
    computed on the PRE-balance pool, re-sorted by score
    (reference rag_engine.py:463-507)."""
    from tensortruth_tpu.index.nodes import Node
    from tensortruth_tpu.retrieval.engine import RetrievedNode

    def rn(i, idx, score):
        return RetrievedNode(
            node=Node(node_id=f"n{i}", text="t", level=0, doc_id="d"),
            score=score, module=f"m{idx}", source_index=idx,
        )

    # 7 from index 0, 3 from index 1 → limit = 10//2 = 5 per index.
    pool = [rn(i, 0, 0.9 - i * 0.01) for i in range(7)]
    pool += [rn(10 + i, 1, 0.5 - i * 0.01) for i in range(3)]
    balanced = engine._balance(pool)
    by_idx = {}
    for r in balanced:
        by_idx.setdefault(r.source_index, []).append(r)
    assert len(by_idx[0]) == 5  # capped
    assert len(by_idx[1]) == 3  # untouched
    scores = [r.score for r in balanced]
    assert scores == sorted(scores, reverse=True)

    # end-to-end retrieve still returns score-sorted results
    q = np.ones(DIM, np.float32) / np.sqrt(DIM)
    results = engine.retrieve(q, "balance-q")
    scores = [r.score for r in results]
    assert scores == sorted(scores, reverse=True)


def test_cache_hits_and_clear(engine):
    q = np.ones(DIM, np.float32) / np.sqrt(DIM)
    r1 = engine.retrieve(q, "cached-q")
    r2 = engine.retrieve(np.zeros(DIM, np.float32), "cached-q")  # emb ignored on hit
    assert r1 is r2
    engine.clear_cache()
    r3 = engine.retrieve(q, "cached-q")
    assert r3 is not r1


def test_refresh_after_remove(engine, tiny_tokenizer):
    q_idx = engine.indexes["mod_b"]
    mat, _ = q_idx.matrix()
    q = mat[0]
    before = engine.retrieve_batch(q[None, :])[0]
    assert any(r.module == "mod_b" for r in before)

    q_idx.remove_document("docB")
    engine.refresh()
    after = engine.retrieve_batch(q[None, :])[0]
    assert all(r.module != "mod_b" for r in after)


def test_batch_matches_single(engine):
    rng = np.random.default_rng(1)
    qs = rng.standard_normal((3, DIM)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    batch = engine.retrieve_batch(qs)
    for i in range(3):
        single = engine.retrieve_batch(qs[i : i + 1])[0]
        assert [r.node_id for r in batch[i]] == [r.node_id for r in single]


def test_sharded_engine_matches_single_device(tiny_tokenizer, sample_text):
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    single = MultiIndexEngine({"mod_a": idx}, similarity_top_k=5, use_fused=False)
    sharded = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, mesh=make_mesh(), use_fused=False
    )
    rng = np.random.default_rng(2)
    q = rng.standard_normal(DIM).astype(np.float32)
    q /= np.linalg.norm(q)
    r1 = single.retrieve_batch(q[None, :])[0]
    r2 = sharded.retrieve_batch(q[None, :])[0]
    assert [r.node_id for r in r1] == [r.node_id for r in r2]
    np.testing.assert_allclose(
        [r.score for r in r1], [r.score for r in r2], rtol=1e-5
    )


def test_empty_engine():
    eng = MultiIndexEngine({}, similarity_top_k=5, use_fused=False)
    assert eng.retrieve_batch(np.zeros((1, DIM), np.float32)) == [[]]


def test_ivf_tier_selected_for_large_corpus(tiny_tokenizer, sample_text):
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    eng = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=False,
        ivf_threshold=1, ivf_clusters=4, ivf_nprobe=4,
    )
    assert eng._ivf is not None
    mat, rows = idx.matrix()
    results = eng.retrieve_batch(mat[2][None, :])[0]
    assert results
    expected = idx.node_of_row(int(rows[2]))
    assert results[0].node_id in (expected.node_id, expected.parent_id)


def test_int8_corpus_tier(tiny_tokenizer, sample_text):
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    bf = MultiIndexEngine({"mod_a": idx}, similarity_top_k=5, use_fused=False)
    q8 = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=True, corpus_dtype="int8"
    )
    assert q8._stacked_scales is not None
    mat, rows = idx.matrix()
    r_bf = bf.retrieve_batch(mat[1][None, :])[0]
    r_q8 = q8.retrieve_batch(mat[1][None, :])[0]
    # top hit identical; ordering may swap near-ties under quantization
    assert r_q8[0].node_id == r_bf[0].node_id
    assert abs(r_q8[0].score - r_bf[0].score) < 0.02


def test_mesh_scales_ivf_threshold(tiny_tokenizer, sample_text):
    """A mesh shards the flat scan P ways, so the IVF threshold scales ×P:
    below P×threshold the mesh runs the full-recall sharded scan; above it
    the IVF cluster blocks themselves shard over the mesh."""
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    n = idx.n_alive
    mesh = make_mesh()  # 8 shards

    eng = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=False,
        mesh=mesh, ivf_threshold=(n // 8) + 1,  # 8×threshold > n: flat scan
    )
    assert eng._ivf is None and eng._ivf_sharded is None
    mat, rows = idx.matrix()
    results = eng.retrieve_batch(np.asarray(mat[0][None, :], np.float32))[0]
    assert results

    eng = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=False,
        mesh=mesh, ivf_threshold=max(1, n // 8),  # 8×threshold ≤ n: IVF tier
        ivf_clusters=8, ivf_nprobe=4,
    )
    assert eng._ivf_sharded is not None and eng._ivf is None
    results = eng.retrieve_batch(np.asarray(mat[0][None, :], np.float32))[0]
    assert results


def test_int8_ivf_tier_keeps_query_float(tiny_tokenizer, sample_text):
    """Regression: the int8-IVF tier (corpus past the beyond-HBM threshold
    with corpus_dtype='int8') must NOT cast normalized query embeddings to
    the int8 block dtype — |v|<1 components truncate to zero and retrieval
    silently collapses to arbitrary rows."""
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    eng = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=False,
        corpus_dtype="int8", ivf_threshold=1, ivf_clusters=4, ivf_nprobe=4,
    )
    assert eng._ivf is not None and eng._ivf.scales is not None  # int8 blocks
    mat, rows = idx.matrix()
    results = eng.retrieve_batch(mat[2][None, :])[0]
    assert results
    # self-retrieval: the query IS row 2, score must be ~1, not ~0
    assert results[0].score > 0.9
    expected = idx.node_of_row(int(rows[2]))
    assert results[0].node_id in (expected.node_id, expected.parent_id)


def test_int8_corpus_on_mesh(tiny_tokenizer, sample_text):
    """corpus_dtype=int8 with a mesh must run the quantized sharded flat
    tier (half HBM per shard), not silently fall back to bf16."""
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    bf = MultiIndexEngine({"mod_a": idx}, similarity_top_k=5, use_fused=False)
    q8 = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, mesh=make_mesh(),
        use_fused=False, corpus_dtype="int8",
    )
    assert q8._stacked_scales is not None
    assert q8._stacked.dtype == np.int8
    mat, rows = idx.matrix()
    r_bf = bf.retrieve_batch(mat[1][None, :])[0]
    r_q8 = q8.retrieve_batch(mat[1][None, :])[0]
    assert r_q8[0].node_id == r_bf[0].node_id
    assert abs(r_q8[0].score - r_bf[0].score) < 0.02


def test_int8_without_fused_single_device_warns(tiny_tokenizer, sample_text, caplog):
    """Single-device int8 without the fused kernel falls back to bf16 — and
    must say so instead of silently doubling HBM."""
    import logging

    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    with caplog.at_level(logging.WARNING, logger="tensortruth_tpu.retrieval.engine"):
        eng = MultiIndexEngine(
            {"mod_a": idx}, similarity_top_k=5, use_fused=False,
            corpus_dtype="int8",
        )
    assert eng._stacked_scales is None
    assert any("falling back to bfloat16" in r.message for r in caplog.records)


def test_float32_corpus_dtype(tiny_tokenizer, sample_text):
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    eng = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=False,
        corpus_dtype="float32",
    )
    assert str(eng._stacked.dtype) == "float32"
    mat, rows = idx.matrix()
    res = eng.retrieve_batch(mat[0][None, :])[0]
    # top hit = the row itself or its auto-merged parent
    expected = idx.node_of_row(int(rows[0]))
    assert res and res[0].node_id in (expected.node_id, expected.parent_id)


def test_refresh_resets_quantization_state(tiny_tokenizer, sample_text):
    """Changing corpus_dtype then refresh() must not leave stale scales."""
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    eng = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=True, corpus_dtype="int8"
    )
    assert eng._stacked_scales is not None
    eng.corpus_dtype = "bfloat16"
    eng.refresh()
    assert eng._stacked_scales is None
    assert str(eng._stacked.dtype) == "bfloat16"


def test_cache_key_includes_query_text_only_when_given(engine):
    rng = np.random.default_rng(9)
    q = rng.standard_normal(DIM).astype(np.float32)
    q /= np.linalg.norm(q)
    r1 = engine.retrieve(q, query_text="the query")
    r2 = engine.retrieve(q, query_text="the query")  # cache hit
    assert [n.node_id for n in r1] == [n.node_id for n in r2]
    engine.clear_cache()
    assert engine.retrieve(q, query_text="the query")  # recompute ok


def test_int8_doubles_ivf_threshold(tiny_tokenizer, sample_text):
    """int8 halves bytes/chunk, so the flat tier holds to 2x the rows
    before IVF (measured: 10M int8 rows on one chip, BASELINE.md)."""
    idx = _index(tiny_tokenizer, sample_text, "docA", "mod_a")
    n = idx.n_alive
    # threshold such that bf16 tips into IVF but int8 stays flat
    bf = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=False,
        ivf_threshold=n, ivf_clusters=4, ivf_nprobe=4,
    )
    assert bf._ivf is not None  # bf16: at threshold → IVF
    q8 = MultiIndexEngine(
        {"mod_a": idx}, similarity_top_k=5, use_fused=True,
        corpus_dtype="int8", ivf_threshold=n, ivf_clusters=4, ivf_nprobe=4,
    )
    assert q8._ivf is None  # int8: threshold doubled → flat quantized scan
    assert q8._stacked_scales is not None
