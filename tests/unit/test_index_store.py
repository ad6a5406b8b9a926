"""VectorIndex build/persist/mutate contract (reference
tests/unit/test_document_index.py analog)."""

import numpy as np
import pytest

from tensortruth_tpu.index.chunker import hierarchical_chunk
from tensortruth_tpu.index.nodes import HierarchyStore, Node
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


class TestManifestCorruption:
    """Sharded-matrix persistence must fail loudly and typed on corruption
    (VERDICT round-1 weak #7), and the engine must isolate the bad module."""

    def _big_index(self, tmp_path, monkeypatch, n=600):
        import tensortruth_tpu.index.store as store_mod

        monkeypatch.setattr(store_mod, "SHARD_ROWS", 256)  # force sharding
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((n, 8)).astype(np.float32)
        nodes = [
            Node(node_id=f"n{i}", text=f"t{i}", level=0, doc_id="d")
            for i in range(n)
        ]
        store = HierarchyStore()
        store.add_all(nodes)
        store.finalize_leaves()
        idx = VectorIndex(emb, [f"n{i}" for i in range(n)],
                          store, {"embedding_model": "tiny"})
        path = tmp_path / "mod"
        idx.save(path)
        return path

    def test_sharded_roundtrip(self, tmp_path, monkeypatch):
        path = self._big_index(tmp_path, monkeypatch)
        assert (path / "embeddings.manifest.json").exists()
        assert len(list(path.glob("embeddings.shard*.npy"))) == 3
        loaded = VectorIndex.load(path)
        assert loaded.n_rows == 600

    def test_missing_shard_raises_typed_error(self, tmp_path, monkeypatch):
        from tensortruth_tpu.index.store import CorruptIndexError

        path = self._big_index(tmp_path, monkeypatch)
        next(path.glob("embeddings.shard*.npy")).unlink()
        with pytest.raises(CorruptIndexError, match="missing shard"):
            VectorIndex.load(path)

    def test_garbage_manifest_raises_typed_error(self, tmp_path, monkeypatch):
        from tensortruth_tpu.index.store import CorruptIndexError

        path = self._big_index(tmp_path, monkeypatch)
        (path / "embeddings.manifest.json").write_text("{not json")
        with pytest.raises(CorruptIndexError, match="unreadable"):
            VectorIndex.load(path)

    def test_shard_shape_mismatch_raises(self, tmp_path, monkeypatch):
        from tensortruth_tpu.index.store import CorruptIndexError

        path = self._big_index(tmp_path, monkeypatch)
        shard = sorted(path.glob("embeddings.shard*.npy"))[0]
        np.save(shard, np.zeros((5, 8), np.float32))  # wrong row count
        with pytest.raises(CorruptIndexError, match="shape"):
            VectorIndex.load(path)

    def test_engine_skips_corrupt_module(self, tmp_path, monkeypatch, tiny_tokenizer):
        """A corrupt module is skipped with an error log; healthy modules load."""
        from tensortruth_tpu.engine import load_engine_for_modules
        from tensortruth_tpu.app.config import TensorTruthTPUConfig
        from tensortruth_tpu.models.manager import ModelManager

        monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
        ModelManager.reset_instance()
        model_dir = tmp_path / "indexes" / "tiny-embedder"
        good = self._big_index(model_dir, monkeypatch)
        (model_dir / "mod").rename(model_dir / "library_good")
        bad = self._big_index(model_dir, monkeypatch)
        (model_dir / "mod").rename(model_dir / "library_bad")
        (model_dir / "library_bad" / "embeddings.manifest.json").write_text("{broken")

        cfg = TensorTruthTPUConfig.default()
        cfg.rag.default_embedding_model = "tiny-embedder"
        cfg.rag.default_reranker = "tiny-reranker"
        cfg.rag.use_fused_topk = False
        engine = load_engine_for_modules(
            ["good", "bad"], {}, indexes_dir=tmp_path / "indexes", config=cfg
        )
        assert engine.modules == ["good"]


def test_artifact_roundtrip_preserves_tombstones_and_retrieval(tmp_path, tiny_tokenizer):
    """save→load fidelity: alive mask, gelu metadata, and the engine's
    retrieval over the loaded artifact must equal the in-memory one."""
    from tensortruth_tpu.index.chunker import chunk_document
    from tensortruth_tpu.retrieval.engine import MultiIndexEngine

    rng = np.random.default_rng(0)
    emb_of = {}

    def embed(texts):
        out = []
        for t in texts:
            if t not in emb_of:
                v = rng.standard_normal(16).astype(np.float32)
                emb_of[t] = v / np.linalg.norm(v)
            out.append(emb_of[t])
        return np.stack(out)

    nodes = []
    for d in range(3):
        nodes += chunk_document(
            f"document {d} text. " * 40, tiny_tokenizer, doc_id=f"doc{d}",
            chunk_sizes=[64, 16], chunk_overlap=4,
        )
    idx = VectorIndex.build(nodes, embed, embedding_model="tiny", gelu_flavor="exact")
    removed = idx.remove_document("doc1")
    assert removed > 0
    idx.save(tmp_path / "art")
    loaded = VectorIndex.load(tmp_path / "art")

    assert loaded.metadata["gelu"] == "exact"
    assert loaded.n_alive == idx.n_alive
    assert loaded.n_rows == idx.n_rows

    e1 = MultiIndexEngine({"m": idx}, similarity_top_k=5, use_fused=False)
    e2 = MultiIndexEngine({"m": loaded}, similarity_top_k=5, use_fused=False)
    mat, rows = idx.matrix()
    for r in range(0, mat.shape[0], 7):
        a = e1.retrieve_batch(mat[r][None, :])[0]
        b = e2.retrieve_batch(mat[r][None, :])[0]
        assert [x.node_id for x in a] == [x.node_id for x in b]
        # no tombstoned doc ever comes back
        assert all("doc1" != x.node.doc_id for x in b)


class TestSaveFailureHygiene:
    """ADVICE r4: the non-packed save path must clean its staged tmps on
    failure, sweep dead-PID debris for ALL artifacts, and surface
    mixed-generation row-count mismatches as CorruptIndexError."""

    def test_row_count_mismatch_raises_typed_error(self, tiny_tokenizer, sample_text, tmp_path):
        import json

        from tensortruth_tpu.index.store import ROWS_FILE, CorruptIndexError

        idx = _build(tiny_tokenizer, sample_text)
        idx.save(tmp_path / "mod")
        rows_path = tmp_path / "mod" / ROWS_FILE
        rows = json.loads(rows_path.read_text())
        rows["row_ids"] = rows["row_ids"][:-1]  # crash-torn generation mix
        rows["alive"] = rows["alive"][:-1]
        rows_path.write_text(json.dumps(rows))
        with pytest.raises(CorruptIndexError):
            VectorIndex.load(tmp_path / "mod")

    def test_failed_jsonl_save_leaves_no_tmps_and_old_generation_intact(
        self, tiny_tokenizer, sample_text, tmp_path, monkeypatch
    ):
        idx = _build(tiny_tokenizer, sample_text)
        idx.save(tmp_path / "mod")
        before = VectorIndex.load(tmp_path / "mod").n_rows

        def boom(_path):
            raise OSError("disk full")

        monkeypatch.setattr(type(idx.store), "save", lambda self, p: boom(p))
        with pytest.raises(OSError):
            idx.save(tmp_path / "mod")
        assert not list((tmp_path / "mod").glob("*.tmp-*"))
        assert VectorIndex.load(tmp_path / "mod").n_rows == before

    def test_dead_pid_debris_swept_for_all_artifacts(
        self, tiny_tokenizer, sample_text, tmp_path
    ):
        from tensortruth_tpu.index.store import METADATA_FILE, ROWS_FILE

        mod = tmp_path / "mod"
        mod.mkdir()
        dead = 2**22 + 12345  # beyond pid_max defaults: guaranteed dead
        for name in (
            f"embeddings.npy.tmp-{dead}",
            f"{ROWS_FILE}.tmp-{dead}",
            f"{METADATA_FILE}.tmp-{dead}",
        ):
            (mod / name).write_text("debris")
        idx = _build(tiny_tokenizer, sample_text)
        idx.save(mod)
        assert not list(mod.glob("*.tmp-*"))
