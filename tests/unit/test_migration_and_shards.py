"""Legacy migration + sharded matrix persistence."""

import json

import numpy as np

from tensortruth_tpu.index import store as store_mod
from tensortruth_tpu.index.nodes import HierarchyStore, Node
from tensortruth_tpu.index.store import VectorIndex
from tensortruth_tpu.indexing.migration import (
    detect_legacy_indexes,
    migrate_legacy_indexes,
)


def _tiny_index(n=10, d=4):
    store = HierarchyStore()
    nodes = [Node(node_id=f"n{i}", text=f"t{i}", level=0, doc_id="d") for i in range(n)]
    store.add_all(nodes)
    store.finalize_leaves()
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    return VectorIndex(emb, [f"n{i}" for i in range(n)], store, {"index_version": "1.0"})


def test_sharded_matrix_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(store_mod, "SHARD_ROWS", 4)  # force sharding
    idx = _tiny_index(n=10)
    idx.save(tmp_path / "mod")
    files = sorted(p.name for p in (tmp_path / "mod").glob("embeddings*"))
    assert "embeddings.manifest.json" in files
    assert sum(1 for f in files if f.startswith("embeddings.shard")) == 3
    assert not (tmp_path / "mod" / "embeddings.npy").exists()
    assert VectorIndex.is_valid(tmp_path / "mod")

    idx2 = VectorIndex.load(tmp_path / "mod")
    m1, _ = idx.matrix()
    m2, _ = idx2.matrix()
    np.testing.assert_array_equal(m1, m2)

    # re-save small after compaction cleans up shards
    monkeypatch.setattr(store_mod, "SHARD_ROWS", 250_000)
    idx2.save(tmp_path / "mod")
    assert (tmp_path / "mod" / "embeddings.npy").exists()
    assert not (tmp_path / "mod" / "embeddings.manifest.json").exists()
    assert not list((tmp_path / "mod").glob("embeddings.shard*"))
    VectorIndex.load(tmp_path / "mod")


def test_legacy_migration(tmp_path):
    # legacy flat layout: indexes/mymod/embeddings.npy
    legacy = tmp_path / "indexes" / "library_mymod"
    idx = _tiny_index()
    idx.save(legacy)
    (legacy / "index_metadata.json").unlink()  # legacy had no metadata

    assert [d.name for d in detect_legacy_indexes(tmp_path / "indexes")] == ["library_mymod"]
    moved = migrate_legacy_indexes(tmp_path / "indexes", "BAAI/bge-m3")
    assert moved == ["library_mymod"]
    target = tmp_path / "indexes" / "bge-m3" / "library_mymod"
    assert VectorIndex.is_valid(target)
    meta = json.loads((target / "index_metadata.json").read_text())
    assert meta["embedding_model"] == "BAAI/bge-m3"
    assert meta["migrated_from"] == "legacy-flat-layout"
    # idempotent
    assert migrate_legacy_indexes(tmp_path / "indexes", "BAAI/bge-m3") == []
