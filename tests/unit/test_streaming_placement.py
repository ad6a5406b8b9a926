"""Streaming index placement: NO path may materialize the full f32 corpus
(VERDICT r3 item 2).

Every `_restack` branch — single-device bf16/int8, mesh bf16/int8, IVF
(single-device and mesh-sharded) — must consume row-contiguous pieces
(`VectorIndex.iter_matrix_pieces`, mmap shards at the capacity tier). The
tests here (a) prove the streaming placement functions are bit-equal to the
array-in-hand versions, and (b) wire a poisoned `ShardedMatrix.__array__`
through the real engine on the 8-virtual-device mesh so any regression back
to full materialization fails loudly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tensortruth_tpu.index.store as store_mod
from tensortruth_tpu.index.nodes import HierarchyStore, Node
from tensortruth_tpu.index.store import VectorIndex
from tensortruth_tpu.ops.ivf import build_ivf, ivf_search
from tensortruth_tpu.parallel import make_mesh
from tensortruth_tpu.parallel.sharded_topk import (
    shard_corpus,
    shard_corpus_int8,
    shard_corpus_int8_streaming,
    shard_corpus_streaming,
    sharded_topk,
)
from tensortruth_tpu.retrieval.engine import MultiIndexEngine


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _pieces(emb, sizes):
    """Split an (N, D) matrix into row-contiguous pieces of given sizes."""
    assert sum(sizes) == emb.shape[0]
    out, row = [], 0
    for s in sizes:
        out.append(emb[row : row + s])
        row += s
    return out


class TestShardCorpusStreaming:
    @pytest.mark.parametrize("sizes", [[1000], [300, 500, 200], [999, 1]])
    def test_bf16_streaming_equals_array_path(self, rng, sizes):
        emb = _normed(rng, 1000, 32)
        mesh = make_mesh()
        import ml_dtypes

        a, n_a = shard_corpus(emb.astype(ml_dtypes.bfloat16), mesh, tile_n=128)
        b, n_b = shard_corpus_streaming(
            iter(_pieces(emb, sizes)), 1000, 32, mesh, tile_n=128
        )
        assert n_a == n_b == 1000
        assert a.shape == b.shape and a.dtype == b.dtype == jnp.bfloat16
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )

    def test_int8_streaming_equals_array_path(self, rng):
        emb = _normed(rng, 770, 32)
        mesh = make_mesh()
        qa, sa, _ = shard_corpus_int8(emb, mesh, tile_n=128)
        qb, sb, _ = shard_corpus_int8_streaming(
            iter(_pieces(emb, [256, 256, 258])), 770, 32, mesh, tile_n=128
        )
        assert qa.sharding == qb.sharding and sa.sharding == sb.sharding
        np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))

    def test_streaming_search_matches_exact(self, rng):
        from tensortruth_tpu.ops.topk import exact_topk

        emb = _normed(rng, 500, 16)
        q = _normed(rng, 3, 16)
        mesh = make_mesh()
        emb_dev, n = shard_corpus_streaming(
            iter(_pieces(emb, [100, 400])), 500, 16, mesh, np_dtype=np.float32
        )
        vals, idx = sharded_topk(jnp.asarray(q), emb_dev, k=7, mesh=mesh, n_actual=n)
        rv, ri = exact_topk(jnp.asarray(q), jnp.asarray(emb), 7)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))

    def test_row_count_mismatch_raises(self, rng):
        emb = _normed(rng, 100, 8)
        mesh = make_mesh()
        with pytest.raises(RuntimeError, match="supplied 100 rows"):
            shard_corpus_streaming(iter([emb]), 200, 8, mesh)


class TestBuildIVFStreaming:
    @pytest.mark.parametrize("block_dtype", [jnp.bfloat16, jnp.int8])
    def test_pieces_equal_array_build(self, rng, block_dtype):
        emb = _normed(rng, 2000, 24)
        kw = dict(n_clusters=8, sample_size=400, kmeans_iters=3, seed=7,
                  block_dtype=block_dtype)
        a = build_ivf(emb, **kw)
        pieces = _pieces(emb, [700, 700, 600])
        b = build_ivf(lambda: iter(pieces), n_rows=2000, dim=24, **kw)
        np.testing.assert_array_equal(a.row_map, b.row_map)
        np.testing.assert_array_equal(
            np.asarray(a.blocks, np.float32), np.asarray(b.blocks, np.float32)
        )
        if block_dtype == jnp.int8:
            np.testing.assert_array_equal(np.asarray(a.scales), np.asarray(b.scales))
        q = _normed(rng, 4, 24)
        va, ra = ivf_search(a, q, 10, nprobe=4)
        vb, rb = ivf_search(b, q, 10, nprobe=4)
        np.testing.assert_array_equal(ra, rb)
        np.testing.assert_allclose(va, vb, rtol=1e-5)

    def test_host_blocks_mode_searches_identically(self, rng):
        """device_blocks=False (the mesh path) must not change results."""
        from tensortruth_tpu.ops.ivf import ivf_search_sharded, shard_ivf

        emb = _normed(rng, 1500, 16)
        kw = dict(n_clusters=6, sample_size=300, kmeans_iters=3, seed=3)
        dev = build_ivf(emb, **kw)
        host = build_ivf(emb, device_blocks=False, **kw)
        assert isinstance(host.blocks, np.ndarray)
        mesh = make_mesh()
        sidx = shard_ivf(host, mesh)
        q = _normed(rng, 4, 16)
        v_dev, r_dev = ivf_search(dev, q, 8, nprobe=6)
        v_sh, r_sh = ivf_search_sharded(sidx, q, 8, nprobe=6)
        # sharded probing covers a superset of the single-device probe set;
        # at nprobe=n_clusters both are exhaustive and must agree exactly
        np.testing.assert_array_equal(r_dev, r_sh)
        np.testing.assert_allclose(v_dev, v_sh, rtol=1e-5)

    def test_capacity_spill_round_streams(self, rng):
        """Skewed corpus forcing the capacity-aware round: every row must
        still be placed exactly once (no drops), streaming or not."""
        # 90% of rows in one blob → best cluster overflows hard
        blob = _normed(rng, 900, 8) * 0.01 + np.ones(8, np.float32) / np.sqrt(8)
        blob /= np.linalg.norm(blob, axis=1, keepdims=True)
        rest = _normed(rng, 100, 8)
        emb = np.concatenate([blob, rest]).astype(np.float32)
        kw = dict(n_clusters=4, sample_size=1000, kmeans_iters=4, seed=1,
                  overflow=1.1, max_overflow=1.2)
        a = build_ivf(emb, **kw)
        b = build_ivf(lambda: iter(_pieces(emb, [250, 250, 500])),
                      n_rows=1000, dim=8, **kw)
        placed_a = np.sort(a.row_map[a.row_map >= 0].ravel())
        placed_b = np.sort(b.row_map[b.row_map >= 0].ravel())
        np.testing.assert_array_equal(placed_a, np.arange(1000))
        np.testing.assert_array_equal(placed_b, np.arange(1000))
        np.testing.assert_array_equal(a.row_map, b.row_map)


def _sharded_index(tmp_path, monkeypatch, n=600, d=16):
    """A VectorIndex persisted as mmap shards and re-loaded lazily."""
    monkeypatch.setattr(store_mod, "SHARD_ROWS", 256)
    rng = np.random.default_rng(0)
    emb = _normed(rng, n, d)
    store = HierarchyStore()
    nodes = [Node(node_id=f"n{i}", text=f"t{i}", level=0, doc_id="d")
             for i in range(n)]
    store.add_all(nodes)
    store.finalize_leaves()
    idx = VectorIndex(emb, [f"n{i}" for i in range(n)], store,
                      {"embedding_model": "tiny"})
    idx.save(tmp_path / "mod", packed=True)  # packed modules mmap-load
    loaded = VectorIndex.load(tmp_path / "mod")
    assert isinstance(loaded._emb, store_mod.ShardedMatrix)
    return loaded, emb


class TestEngineNeverMaterializes:
    """The real engine over a poisoned ShardedMatrix: any __array__ call
    (full f32 materialization) anywhere in a placement path fails the test."""

    def _poison(self, monkeypatch):
        def boom(self, dtype=None, copy=None):
            raise AssertionError(
                "ShardedMatrix.__array__ called: a placement path "
                "materialized the full f32 corpus"
            )

        monkeypatch.setattr(store_mod.ShardedMatrix, "__array__", boom)
        monkeypatch.setattr(
            store_mod.ShardedMatrix, "astype",
            lambda self, dt: boom(self),
        )

    @pytest.mark.parametrize(
        "engine_kw",
        [
            dict(corpus_dtype="bfloat16"),                       # mesh bf16
            dict(corpus_dtype="int8"),                           # mesh int8
            dict(corpus_dtype="float32"),                        # mesh f32
            dict(corpus_dtype="bfloat16", ivf_threshold=10),     # mesh IVF
            dict(corpus_dtype="int8", ivf_threshold=10),         # mesh int8 IVF
        ],
    )
    def test_mesh_paths_stream(self, tmp_path, monkeypatch, engine_kw):
        loaded, emb = _sharded_index(tmp_path, monkeypatch)
        ref_dtype = (
            engine_kw["corpus_dtype"]
            if engine_kw["corpus_dtype"] != "int8" else "bfloat16"
        )
        ref = MultiIndexEngine({"m": loaded}, similarity_top_k=5,
                               use_fused=False, corpus_dtype=ref_dtype)
        rng = np.random.default_rng(1)
        q = _normed(rng, 2, 16)
        want = [[(r.node_id, round(r.score, 4)) for r in rs]
                for rs in ref.retrieve_batch(q)]

        self._poison(monkeypatch)
        mesh = make_mesh()
        eng = MultiIndexEngine(
            {"m": loaded}, similarity_top_k=5, mesh=mesh, use_fused=False,
            ivf_clusters=4, ivf_nprobe=4, **engine_kw,
        )
        got = [[(r.node_id, round(r.score, 4)) for r in rs]
               for rs in eng.retrieve_batch(q)]
        # int8/IVF tiers quantize — compare ids at matching k, scores loosely
        assert [len(g) for g in got] == [len(w) for w in want]
        if engine_kw.get("corpus_dtype") != "int8" and "ivf_threshold" not in engine_kw:
            assert got == want
        else:
            for g, w in zip(got, want):
                assert {i for i, _ in g} & {i for i, _ in w}, (g, w)

    def test_single_device_paths_stream(self, tmp_path, monkeypatch):
        loaded, _ = _sharded_index(tmp_path, monkeypatch)
        self._poison(monkeypatch)
        for kw in (dict(corpus_dtype="bfloat16"),
                   dict(corpus_dtype="float32"),
                   dict(corpus_dtype="bfloat16", ivf_threshold=10)):
            eng = MultiIndexEngine({"m": loaded}, similarity_top_k=5,
                                   use_fused=False, ivf_clusters=4,
                                   ivf_nprobe=4, **kw)
            rng = np.random.default_rng(1)
            assert eng.retrieve_batch(_normed(rng, 2, 16))[0]
