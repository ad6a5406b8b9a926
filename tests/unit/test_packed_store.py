"""Packed mmap hierarchy store (index/packed.py): full lookup-surface parity
with the JSONL HierarchyStore, read-only semantics, VectorIndex integration,
threshold-based format selection, and engine retrieval equivalence.

The packed format is the host-side half of the 10M-chunk capacity tier
(scripts/bench_10m_int8.py): the device can scan 10M rows in ~23 ms, so the
host must hydrate nodes without ever parsing the corpus into Python.
"""

import json

import numpy as np
import pytest

from tensortruth_tpu.index.chunker import hierarchical_chunk
from tensortruth_tpu.index.nodes import HierarchyStore, Node, new_node_id
from tensortruth_tpu.index.packed import (
    PACKED_DIR,
    PackedHierarchyStore,
    ReadOnlyHierarchyError,
    is_packed,
    pack_index,
)
from tensortruth_tpu.index.store import PackedVectorIndex, VectorIndex


def _random_hierarchy(n_docs=4, leaves_per_doc=7, with_meta=True):
    """Two-level hierarchy with non-ASCII text, metadata, multiple docs."""
    store = HierarchyStore()
    for d in range(n_docs):
        doc = f"doc-{d}"
        parent = Node(
            node_id=new_node_id(),
            text=f"parent Σ{d} " + "lorem ipsum " * 20,
            level=0,
            doc_id=doc,
            module="mod",
            metadata={"chapter": d} if with_meta else {},
        )
        kids = []
        for j in range(leaves_per_doc):
            kid = Node(
                node_id=new_node_id(),
                text=f"leaf 文{d}.{j} naïve—text " + "chunk body " * 10,
                level=1,
                doc_id=doc,
                module="mod",
                parent_id=parent.node_id,
                start=j * 100,
                end=j * 100 + 99,
                metadata={"j": j} if with_meta and j % 2 else {},
            )
            kids.append(kid)
        parent.child_ids = [k.node_id for k in kids]
        store.add(parent)
        store.add_all(kids)
    store.finalize_leaves()
    return store


def _nodes_equal(a: Node, b: Node):
    assert a.node_id == b.node_id
    assert a.text == b.text
    assert a.level == b.level
    assert a.doc_id == b.doc_id
    assert a.module == b.module
    assert a.parent_id == b.parent_id
    assert a.child_ids == b.child_ids
    assert (a.start, a.end) == (b.start, b.end)
    assert a.metadata == b.metadata


@pytest.fixture
def packed_pair(tmp_path):
    store = _random_hierarchy()
    row_ids = list(store.leaf_ids)
    alive = np.ones(len(row_ids), bool)
    alive[3] = False  # a tombstone must survive the roundtrip
    pack_index(tmp_path, store, row_ids, alive)
    return store, PackedHierarchyStore(tmp_path), row_ids, alive


class TestLookupParity:
    def test_every_node_identical(self, packed_pair):
        store, packed, _, _ = packed_pair
        assert len(packed) == len(store)
        for n in store.nodes():
            _nodes_equal(packed.get(n.node_id), n)

    def test_parent_and_children_navigation(self, packed_pair):
        store, packed, _, _ = packed_pair
        for n in store.nodes():
            p1, p2 = store.parent(n.node_id), packed.parent(n.node_id)
            assert (p1 is None) == (p2 is None)
            if p1 is not None:
                _nodes_equal(p2, p1)
            kids1 = store.children(n.node_id)
            kids2 = packed.children(n.node_id)
            assert [k.node_id for k in kids2] == [k.node_id for k in kids1]

    def test_leaf_order_and_row_maps(self, packed_pair):
        store, packed, _, _ = packed_pair
        assert packed.leaf_ids == store.leaf_ids
        for row, nid in enumerate(store.leaf_ids):
            assert packed.leaf_by_row(row).node_id == nid
            assert packed.row_of(nid) == store.row_of(nid) == row

    def test_iterators_cover_everything(self, packed_pair):
        store, packed, _, _ = packed_pair
        assert {n.node_id for n in packed.nodes()} == {n.node_id for n in store.nodes()}
        assert [n.node_id for n in packed.leaves()] == [n.node_id for n in store.leaves()]

    def test_contains_and_missing(self, packed_pair):
        store, packed, _, _ = packed_pair
        some = next(iter(store.nodes())).node_id
        assert some in packed
        assert "definitely-not-a-node" not in packed
        with pytest.raises(KeyError):
            packed.get("definitely-not-a-node")
        with pytest.raises(KeyError):
            packed.row_of(next(n for n in store.nodes() if not n.is_leaf).node_id)

    def test_row_nodes_and_alive_roundtrip(self, packed_pair):
        store, packed, row_ids, alive = packed_pair
        rn = packed.row_nodes()
        assert [packed.by_index(int(i)).node_id for i in rn] == row_ids
        np.testing.assert_array_equal(packed.alive(), alive)


class TestReadOnly:
    def test_all_mutations_raise(self, packed_pair):
        _, packed, _, _ = packed_pair
        node = Node(node_id="x", text="t", level=0, doc_id="d")
        for op in (
            lambda: packed.add(node),
            lambda: packed.add_all([node]),
            lambda: packed.remove_doc("doc-0"),
            lambda: packed.finalize_leaves(),
        ):
            with pytest.raises(ReadOnlyHierarchyError, match="immutable"):
                op()


class TestVectorIndexIntegration:
    def _build(self, tiny_tokenizer, text="The quick brown fox. " * 200):
        rng = np.random.default_rng(7)
        cache = {}

        def embed(texts):
            out = []
            for t in texts:
                if t not in cache:
                    v = rng.standard_normal(12).astype(np.float32)
                    cache[t] = v / np.linalg.norm(v)
                out.append(cache[t])
            return np.stack(out)

        nodes = []
        for d in range(3):
            nodes += hierarchical_chunk(
                f"document {d}. " + text, tiny_tokenizer, f"doc{d}",
                module="m", chunk_sizes=[64, 16], chunk_overlap=4,
            )
        return VectorIndex.build(nodes, embed, embedding_model="tiny")

    def test_forced_pack_roundtrip_is_packed_class(self, tmp_path, tiny_tokenizer):
        idx = self._build(tiny_tokenizer)
        idx.remove_document("doc1")
        idx.save(tmp_path / "mod", packed=True)
        assert is_packed(tmp_path / "mod")
        assert not (tmp_path / "mod" / "hierarchy.jsonl").exists()
        assert not (tmp_path / "mod" / "rows.json").exists()
        loaded = VectorIndex.load(tmp_path / "mod")
        assert isinstance(loaded, PackedVectorIndex)
        assert loaded.n_rows == idx.n_rows and loaded.n_alive == idx.n_alive
        m1, r1 = idx.matrix()
        m2, r2 = loaded.matrix()
        np.testing.assert_allclose(m1, m2)
        np.testing.assert_array_equal(r1, r2)
        _, alive_rows = idx.matrix()
        for r in alive_rows[::5]:
            _nodes_equal(loaded.node_of_row(int(r)), idx.node_of_row(int(r)))
        dead = next(r for r in range(idx.n_rows) if r not in set(alive_rows.tolist()))
        with pytest.raises(KeyError):
            loaded.node_of_row(dead)  # dead rows raise, same as the JSONL path
        assert loaded.metadata["embedding_model"] == "tiny"

    def test_default_threshold_keeps_small_indexes_jsonl(self, tmp_path, tiny_tokenizer):
        idx = self._build(tiny_tokenizer)
        idx.save(tmp_path / "mod")
        assert not is_packed(tmp_path / "mod")
        assert (tmp_path / "mod" / "hierarchy.jsonl").exists()
        assert type(VectorIndex.load(tmp_path / "mod")) is VectorIndex

    def test_threshold_triggers_packing(self, tmp_path, tiny_tokenizer, monkeypatch):
        import tensortruth_tpu.index.packed as packed_mod

        monkeypatch.setattr(packed_mod, "PACK_THRESHOLD", 10)
        idx = self._build(tiny_tokenizer)
        assert len(idx.store) >= 10
        idx.save(tmp_path / "mod")
        assert is_packed(tmp_path / "mod")

    def test_packed_index_is_read_only(self, tmp_path, tiny_tokenizer):
        idx = self._build(tiny_tokenizer)
        idx.save(tmp_path / "mod", packed=True)
        loaded = VectorIndex.load(tmp_path / "mod")
        with pytest.raises(ReadOnlyHierarchyError):
            loaded.add_nodes([], lambda t: np.zeros((0, 12), np.float32))
        with pytest.raises(ReadOnlyHierarchyError):
            loaded.remove_document("doc0")
        with pytest.raises(ReadOnlyHierarchyError):
            loaded.compact()
        with pytest.raises(ReadOnlyHierarchyError):
            loaded.save(tmp_path / "elsewhere")

    def test_engine_retrieval_identical_over_packed(self, tmp_path, tiny_tokenizer):
        """The whole serving contract: retrieve → automerge → hydrate must
        give identical results from the JSONL and packed artifacts."""
        from tensortruth_tpu.retrieval.engine import MultiIndexEngine

        idx = self._build(tiny_tokenizer)
        idx.save(tmp_path / "packed", packed=True)
        idx.save(tmp_path / "jsonl", packed=False)
        e_mem = MultiIndexEngine({"m": idx}, similarity_top_k=5, use_fused=False)
        e_pak = MultiIndexEngine(
            {"m": VectorIndex.load(tmp_path / "packed")},
            similarity_top_k=5, use_fused=False,
        )
        e_jsn = MultiIndexEngine(
            {"m": VectorIndex.load(tmp_path / "jsonl")},
            similarity_top_k=5, use_fused=False,
        )
        mat, _ = idx.matrix()
        for r in range(0, mat.shape[0], 3):
            ref = e_mem.retrieve(mat[r], f"q{r}")
            for eng in (e_pak, e_jsn):
                got = eng.retrieve(mat[r], f"q{r}")
                assert [(n.node_id, round(n.score, 5)) for n in got] == [
                    (n.node_id, round(n.score, 5)) for n in ref
                ]
                for g, rf in zip(got, ref):
                    assert g.node.text == rf.node.text


def test_automerge_over_packed_store(tmp_path):
    """auto_merge walks parents/children through the packed store exactly
    as through the dict store (SURVEY §2.1 auto-merging contract)."""
    from tensortruth_tpu.retrieval.automerge import auto_merge

    store = _random_hierarchy(n_docs=2, leaves_per_doc=4)
    pack_index(tmp_path, store, list(store.leaf_ids), np.ones(len(store.leaf_ids), bool))
    packed = PackedHierarchyStore(tmp_path)

    parent = next(n for n in store.nodes() if not n.is_leaf)
    hits = [(cid, 0.9 - i * 0.01) for i, cid in enumerate(parent.child_ids[:3])]
    merged_ref = auto_merge(hits, store)
    merged_pak = auto_merge(hits, packed)
    assert merged_pak == merged_ref
    assert merged_pak[0][0] == parent.node_id  # 3/4 children > 0.5 → merged up


def test_manifest_is_atomic_finish_marker(tmp_path):
    """A crash mid-pack (no manifest yet) must leave the dir detectable as
    NOT packed so load falls back / build redoes the pack."""
    store = _random_hierarchy(n_docs=1, leaves_per_doc=2)
    pack_index(tmp_path, store, list(store.leaf_ids), np.ones(2, bool))
    (tmp_path / PACKED_DIR / "manifest.json").unlink()
    assert not is_packed(tmp_path)


def test_empty_metadata_and_unicode_blobs(tmp_path):
    """Zero-length meta entries and multi-byte UTF-8 ids/texts pack cleanly."""
    store = HierarchyStore()
    a = Node(node_id="α-node", text="", level=0, doc_id="d")
    b = Node(node_id="b", text="文字テキスト", level=1, doc_id="d", parent_id="α-node")
    a.child_ids = ["b"]
    store.add_all([a, b])
    store.finalize_leaves()
    pack_index(tmp_path, store, list(store.leaf_ids), np.ones(1, bool))
    packed = PackedHierarchyStore(tmp_path)
    _nodes_equal(packed.get("α-node"), a)
    _nodes_equal(packed.get("b"), b)
    manifest = json.loads((tmp_path / PACKED_DIR / "manifest.json").read_text())
    assert manifest["n_nodes"] == 2 and manifest["n_leaves"] == 1


class TestStreamingMatrixLoad:
    """Capacity-tier load path: mmap shards, zero-copy matrix(), piecewise
    streaming into the device buffer (engine._restack)."""

    def _saved_sharded(self, tmp_path, monkeypatch, n=700, d=16):
        import tensortruth_tpu.index.store as store_mod

        monkeypatch.setattr(store_mod, "SHARD_ROWS", 250)
        rng = np.random.default_rng(3)
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        store = HierarchyStore()
        nodes = [Node(node_id=f"n{i:06d}", text=f"t{i}", level=0, doc_id="d")
                 for i in range(n)]
        store.add_all(nodes)
        store.finalize_leaves()
        idx = VectorIndex(emb, [f"n{i:06d}" for i in range(n)], store,
                          {"embedding_model": "tiny"})
        idx.save(tmp_path / "mod", packed=True)
        assert (tmp_path / "mod" / "embeddings.manifest.json").exists()
        return emb, tmp_path / "mod"

    def test_packed_sharded_load_is_lazy_and_equal(self, tmp_path, monkeypatch):
        from tensortruth_tpu.index.store import ShardedMatrix

        emb, path = self._saved_sharded(tmp_path, monkeypatch)
        loaded = VectorIndex.load(path)
        assert isinstance(loaded._emb, ShardedMatrix)
        np.testing.assert_allclose(np.asarray(loaded._emb), emb, rtol=1e-6)
        # fully-alive matrix() must NOT copy: it returns the backing object
        m, rows = loaded.matrix()
        assert m is loaded._emb
        np.testing.assert_array_equal(rows, np.arange(len(emb)))
        # pieces concatenate back to the matrix, in order
        pieces = list(loaded.iter_matrix_pieces())
        assert len(pieces) > 1  # actually sharded
        np.testing.assert_allclose(np.concatenate(pieces), emb, rtol=1e-6)

    def test_packed_single_file_load_is_memmap(self, tmp_path, tiny_tokenizer):
        store = HierarchyStore()
        nodes = [Node(node_id=f"n{i}", text="t", level=0, doc_id="d") for i in range(8)]
        store.add_all(nodes)
        store.finalize_leaves()
        emb = np.eye(8, dtype=np.float32)
        idx = VectorIndex(emb, [f"n{i}" for i in range(8)], store, {})
        idx.save(tmp_path / "mod", packed=True)
        loaded = VectorIndex.load(tmp_path / "mod")
        assert isinstance(loaded._emb, np.memmap)
        m, _ = loaded.matrix()
        assert m is loaded._emb  # zero-copy fast path

    def test_quantize_corpus_streaming_matches_eager(self):
        from tensortruth_tpu.ops.topk import (
            pad_corpus_for_fused,
            quantize_corpus,
            quantize_corpus_streaming,
        )

        rng = np.random.default_rng(5)
        emb = rng.standard_normal((5000, 32)).astype(np.float32)
        q_ref, s_ref = quantize_corpus(emb)
        q_ref, n = pad_corpus_for_fused(q_ref)
        s_ref = np.pad(s_ref, (0, q_ref.shape[0] - len(s_ref)))
        pieces = [emb[:1024], emb[1024:1024], emb[1024:4000], emb[4000:]]
        q, s, n2 = quantize_corpus_streaming(iter(pieces), 5000, 32)
        assert n2 == n == 5000
        np.testing.assert_array_equal(q, q_ref)
        np.testing.assert_allclose(s, s_ref)
        with pytest.raises(ValueError, match="supplied"):
            quantize_corpus_streaming(iter([emb[:10]]), 5000, 32)

    def test_engine_over_sharded_mmap_matches_eager(self, tmp_path, monkeypatch):
        from tensortruth_tpu.retrieval.engine import MultiIndexEngine

        emb, path = self._saved_sharded(tmp_path, monkeypatch)
        lazy = VectorIndex.load(path)
        e_lazy = MultiIndexEngine({"m": lazy}, similarity_top_k=5, use_fused=False)
        store2 = HierarchyStore()
        store2.add_all([Node(node_id=f"n{i:06d}", text=f"t{i}", level=0, doc_id="d")
                        for i in range(len(emb))])
        store2.finalize_leaves()
        eager = VectorIndex(emb, [f"n{i:06d}" for i in range(len(emb))], store2, {})
        e_eager = MultiIndexEngine({"m": eager}, similarity_top_k=5, use_fused=False)
        for r in range(0, len(emb), 97):
            a = e_lazy.retrieve(emb[r], f"q{r}")
            b = e_eager.retrieve(emb[r], f"q{r}")
            assert [(n.node_id, round(n.score, 5)) for n in a] == [
                (n.node_id, round(n.score, 5)) for n in b
            ]

    def test_tombstoned_pieces_fall_back_to_compacted(self, tmp_path, tiny_tokenizer):
        store = HierarchyStore()
        nodes = [Node(node_id=f"n{i}", text="t", level=0,
                      doc_id="d0" if i < 3 else "d1") for i in range(8)]
        store.add_all(nodes)
        store.finalize_leaves()
        emb = np.eye(8, dtype=np.float32)
        idx = VectorIndex(emb, [f"n{i}" for i in range(8)], store, {})
        idx.remove_document("d0")
        pieces = list(idx.iter_matrix_pieces())
        assert len(pieces) == 1
        np.testing.assert_array_equal(np.concatenate(pieces), emb[3:])
