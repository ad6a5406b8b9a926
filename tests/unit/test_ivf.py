"""IVF coarse-partitioned search vs exact (BASELINE config 5 tier)."""

import numpy as np
import pytest

from tensortruth_tpu.ops.ivf import build_ivf, ivf_search
from tensortruth_tpu.ops.topk import exact_topk

import jax.numpy as jnp


def _corpus(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def ivf_setup():
    rng = np.random.default_rng(0)
    n, d = 20_000, 32
    emb = _corpus(rng, n, d)
    index = build_ivf(emb, n_clusters=32, sample_size=5_000, kmeans_iters=5)
    return emb, index


def test_all_rows_packed(ivf_setup):
    emb, index = ivf_setup
    packed = index.row_map[index.row_map >= 0]
    assert len(packed) == len(set(packed.tolist()))
    # allow tiny truncation loss only
    assert len(packed) >= emb.shape[0] * 0.999


def test_self_retrieval(ivf_setup):
    emb, index = ivf_setup
    q = emb[:16]
    vals, rows = ivf_search(index, q, k=1, nprobe=4)
    assert (rows[:, 0] == np.arange(16)).mean() >= 0.95
    assert vals[:, 0] == pytest.approx(np.ones(16), abs=5e-3)  # bf16 blocks


def test_recall_vs_exact_clustered_data():
    """Mixture-of-gaussians corpus — the structure real text embeddings have."""
    rng = np.random.default_rng(1)
    n, d, n_centers = 20_000, 32, 64
    centers = _corpus(rng, n_centers, d)
    assign = rng.integers(0, n_centers, n)
    emb = centers[assign] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = build_ivf(emb, n_clusters=32, sample_size=5_000, kmeans_iters=8)

    q = emb[rng.choice(n, 16, replace=False)] + 0.05 * rng.standard_normal((16, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k = 10
    _, exact_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)
    exact_idx = np.asarray(exact_idx)
    _, ivf_rows = ivf_search(index, q, k=k, nprobe=8)
    recall = np.mean(
        [len(set(exact_idx[i]) & set(ivf_rows[i])) / k for i in range(len(q))]
    )
    assert recall >= 0.9


def test_recall_vs_exact_random_data(ivf_setup):
    """Worst case (no cluster structure): recall still climbs with nprobe."""
    emb, index = ivf_setup
    rng = np.random.default_rng(1)
    q = _corpus(rng, 8, emb.shape[1])
    k = 10
    _, exact_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)
    exact_idx = np.asarray(exact_idx)

    def recall(nprobe):
        _, rows = ivf_search(index, q, k=k, nprobe=nprobe)
        return np.mean(
            [len(set(exact_idx[i]) & set(rows[i])) / k for i in range(len(q))]
        )

    r8, r16 = recall(8), recall(16)
    assert r16 >= r8
    assert r16 >= 0.8


def test_probe_all_clusters_is_near_exact(ivf_setup):
    emb, index = ivf_setup
    rng = np.random.default_rng(2)
    q = _corpus(rng, 4, emb.shape[1])
    k = 5
    _, exact_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)
    _, rows = ivf_search(index, q, k=k, nprobe=index.n_clusters)
    recall = np.mean(
        [len(set(np.asarray(exact_idx)[i]) & set(rows[i])) / k for i in range(len(q))]
    )
    assert recall >= 0.999  # only truncation could lose anything


def test_k_exceeds_candidates():
    rng = np.random.default_rng(3)
    emb = _corpus(rng, 300, 16)
    index = build_ivf(emb, n_clusters=4, sample_size=300, kmeans_iters=3)
    vals, rows = ivf_search(index, emb[:2], k=250, nprobe=1)
    assert vals.shape == (2, 250)
    assert (rows[vals == float("-inf")] == -1).all()


def test_probe_kernel_interpret_matches_map(ivf_setup):
    """Pallas scalar-prefetch probe kernel (interpret) vs the gather path."""
    import jax

    from tensortruth_tpu.ops.ivf import _probe_scores

    emb, index = ivf_setup
    rng = np.random.default_rng(7)
    q = _corpus(rng, 3, emb.shape[1])
    valid = jnp.asarray(index.row_map >= 0)
    probe = jnp.asarray(rng.integers(0, index.n_clusters, (3, 4)), jnp.int32)

    kernel_scores = np.asarray(
        _probe_scores(probe, jnp.asarray(q, index.blocks.dtype), index.blocks,
                      valid.astype(jnp.int32), interpret=True)
    )
    # reference: plain gather math
    gathered = np.asarray(index.blocks)[np.asarray(probe)]
    gvalid = np.asarray(valid)[np.asarray(probe)]
    ref = np.einsum("bd,bprd->bpr", q.astype(np.float32),
                    gathered.astype(np.float32))
    ref = np.where(gvalid, ref, float("-inf"))
    np.testing.assert_allclose(kernel_scores, ref, atol=2e-2, rtol=2e-2)


class TestShardedIVF:
    """Cluster blocks sharded over the 8-virtual-device CPU mesh."""

    def _build(self, rng, n=4096, d=64, n_clusters=32):
        from tensortruth_tpu.ops.ivf import build_ivf

        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        return emb, build_ivf(emb, n_clusters=n_clusters, sample_size=n)

    def test_sharded_matches_or_beats_single_device_recall(self, rng):
        from tensortruth_tpu.ops.ivf import ivf_search, ivf_search_sharded, shard_ivf
        from tensortruth_tpu.ops.topk import exact_topk
        from tensortruth_tpu.parallel.mesh import make_mesh
        import jax.numpy as jnp

        emb, ivf = self._build(rng)
        mesh = make_mesh()
        sidx = shard_ivf(ivf, mesh)
        q = rng.standard_normal((8, 64)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        k, nprobe = 10, 4

        _, rows_s = ivf_search_sharded(sidx, q, k, nprobe=nprobe)
        _, rows_1 = ivf_search(ivf, q, k, nprobe=nprobe)
        _, exact = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)
        exact = np.asarray(exact)

        def recall(rows):
            return np.mean([
                len(set(rows[i].tolist()) & set(exact[i].tolist())) / k
                for i in range(len(q))
            ])

        r_sharded, r_single = recall(rows_s), recall(rows_1)
        # Every shard probes its own top-nprobe clusters — a superset of the
        # single-device probe set, so sharded recall can never be lower.
        assert r_sharded >= r_single - 1e-9
        assert r_sharded >= 0.8

    def test_sharded_never_returns_padding(self, rng):
        from tensortruth_tpu.ops.ivf import ivf_search_sharded, shard_ivf
        from tensortruth_tpu.parallel.mesh import make_mesh

        # n_clusters=12 does not divide 8 shards: forces cluster padding.
        emb, ivf = self._build(rng, n=600, d=32, n_clusters=12)
        mesh = make_mesh()
        sidx = shard_ivf(ivf, mesh)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        vals, rows = ivf_search_sharded(sidx, q, 20, nprobe=3)
        live = rows[vals > float("-inf")]
        assert live.min() >= 0 and live.max() < 600

    def test_engine_uses_sharded_ivf_on_mesh(self, rng):
        from tensortruth_tpu.index.nodes import Node
        from tensortruth_tpu.index.store import VectorIndex
        from tensortruth_tpu.parallel.mesh import make_mesh
        from tensortruth_tpu.retrieval.engine import MultiIndexEngine

        n, d = 512, 32
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        nodes = [
            Node(node_id=f"n{i}", text=f"text {i}", level=0, doc_id="d")
            for i in range(n)
        ]

        def embed_fn(texts):
            return np.stack([emb[int(t.split()[-1])] for t in texts])

        idx = VectorIndex.build(nodes, embed_fn, embedding_model="tiny")

        mesh = make_mesh()
        eng = MultiIndexEngine(
            {"m": idx}, similarity_top_k=5, mesh=mesh,
            ivf_threshold=64,  # ×8 shards = 512 ≤ n: forces the IVF tier
            ivf_clusters=16, ivf_nprobe=4, use_fused=False,
        )
        assert eng._ivf_sharded is not None and eng._ivf is None
        q = emb[7] + 0.01 * rng.standard_normal(d).astype(np.float32)
        q /= np.linalg.norm(q)
        out = eng.retrieve(q, "probe query")
        assert out and out[0].node.node_id == "n7"


class TestClusteredDataAndPadding:
    """IVF behavior on skewed/clustered data (VERDICT round-1 weak #7/#8)."""

    def _clustered(self, rng, n=6000, d=32, n_centers=12, skew=True):
        """Gaussian blobs with a power-law size skew (real text is lumpy)."""
        centers = rng.standard_normal((n_centers, d)).astype(np.float32) * 3
        if skew:
            weights = 1.0 / np.arange(1, n_centers + 1)
        else:
            weights = np.ones(n_centers)
        weights /= weights.sum()
        which = rng.choice(n_centers, n, p=weights)
        emb = centers[which] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        return emb

    def test_recall_on_clustered_data(self):
        from tensortruth_tpu.ops.ivf import build_ivf, ivf_search
        from tensortruth_tpu.ops.topk import exact_topk
        import jax.numpy as jnp

        rng = np.random.default_rng(123)
        emb = self._clustered(rng)
        ivf = build_ivf(emb, n_clusters=32, sample_size=6000)
        q = emb[rng.choice(len(emb), 16, replace=False)] + 0.01
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        k = 10
        # bf16 reference: IVF blocks are bf16, and inside a dense blob the
        # top-10 cosines sit within bf16 rounding of each other — an f32
        # reference would "fail" on precision ties, not on retrieval.
        _, exact = exact_topk(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(emb, jnp.bfloat16), k
        )
        exact = np.asarray(exact)

        def recall(nprobe):
            _, rows = ivf_search(ivf, q, k, nprobe=nprobe)
            return np.mean([
                len(set(rows[i].tolist()) & set(exact[i].tolist())) / k
                for i in range(len(q))
            ])

        # Skewed blobs split the big cluster across several k-means cells, so
        # low nprobe under-recalls — the knob must recover it monotonically.
        r4, r8, r16, r_all = recall(4), recall(8), recall(16), recall(32)
        assert r8 >= r4 and r16 >= r8, (r4, r8, r16)
        assert r16 >= 0.85, (r4, r8, r16)
        # probing everything must be near-exact: capacity-aware spill means
        # no row is ever silently dropped under the overflow cap
        assert r_all >= 0.999, r_all

    def test_padding_waste_capped_on_skewed_clusters(self):
        from tensortruth_tpu.ops.ivf import build_ivf

        rng = np.random.default_rng(7)
        emb = self._clustered(rng, n=4000, n_centers=8, skew=True)
        ivf = build_ivf(emb, n_clusters=32, sample_size=4000, max_overflow=4.0)
        mean_rows = 4000 / 32
        # Hard cap: rows_per_cluster ≤ lane-aligned 4× the balanced size.
        assert ivf.rows_per_cluster <= -(-int(np.ceil(mean_rows * 4.0)) // 128) * 128
        assert 0.0 <= ivf.padding_waste < 1.0
        # all rows present or truncation was logged; with cap 4x on this
        # skew most rows must survive via the spill round
        # capacity-aware spill: nothing dropped under the cap
        assert (ivf.row_map >= 0).sum() == 4000

    def test_rows_size_to_skew_below_cap(self):
        from tensortruth_tpu.ops.ivf import build_ivf

        rng = np.random.default_rng(11)
        emb = self._clustered(rng, n=2000, n_centers=4, skew=True)
        # biggest blob ≈ 48% of rows; rows_per_cluster must grow to fit it
        # (below the cap) so nothing is truncated.
        ivf = build_ivf(emb, n_clusters=4, sample_size=2000, max_overflow=8.0)
        assert (ivf.row_map >= 0).sum() == 2000


class TestInt8IVF:
    """int8 cluster blocks: the capacity knob for the beyond-HBM tier."""

    def _build(self, rng, n=4096, d=64):
        import jax.numpy as jnp

        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        ivf = build_ivf(emb, n_clusters=16, sample_size=n, block_dtype=jnp.int8)
        return emb, ivf

    def test_blocks_are_int8_with_scales(self):
        rng = np.random.default_rng(5)
        emb, ivf = self._build(rng)
        assert ivf.blocks.dtype == np.int8
        assert ivf.scales is not None and ivf.scales.shape == ivf.row_map.shape

    def test_int8_recall_close_to_bf16(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        emb, ivf8 = self._build(rng)
        ivf16 = build_ivf(emb, n_clusters=16, sample_size=len(emb))
        q = emb[rng.choice(len(emb), 8, replace=False)]
        k = 10
        _, rows16 = ivf_search(ivf16, q, k, nprobe=8)
        _, rows8 = ivf_search(ivf8, q, k, nprobe=8)
        overlap = np.mean([
            len(set(rows8[i].tolist()) & set(rows16[i].tolist())) / k
            for i in range(len(q))
        ])
        assert overlap >= 0.9, overlap

    def test_int8_self_retrieval(self):
        rng = np.random.default_rng(6)
        emb, ivf = self._build(rng)
        vals, rows = ivf_search(ivf, emb[:8], k=1, nprobe=4)
        assert (rows[:, 0] == np.arange(8)).mean() >= 0.9
        # int8 round-trip keeps cosine ≈ 1 within quant error
        assert vals[:, 0] == pytest.approx(np.ones(8), abs=2e-2)

    def test_int8_sharded_search(self):
        from tensortruth_tpu.ops.ivf import ivf_search_sharded, shard_ivf
        from tensortruth_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(7)
        emb, ivf = self._build(rng)
        sidx = shard_ivf(ivf, make_mesh())
        assert sidx.scales is not None
        vals, rows = ivf_search_sharded(sidx, emb[:4], k=5, nprobe=4)
        assert (rows[:, 0] == np.arange(4)).mean() >= 0.75
        live = rows[vals > float("-inf")]
        assert live.min() >= 0 and live.max() < len(emb)


def test_build_ivf_single_cluster():
    """Regression: the n_clusters clamp can yield 1 for tiny corpora; the
    top-2 assignment pass must not require two columns."""
    rng = np.random.default_rng(0)
    emb = _corpus(rng, 5, 16)
    index = build_ivf(emb, n_clusters=1, sample_size=5, kmeans_iters=2)
    assert index.n_clusters == 1
    vals, rows = ivf_search(index, emb[:3], k=2, nprobe=1)
    assert (rows[:, 0] == np.arange(3)).all()  # self-retrieval
    # and the degenerate 1-row corpus path
    tiny = build_ivf(emb[:1], n_clusters=8, sample_size=1, kmeans_iters=1)
    v1, r1 = ivf_search(tiny, emb[:1], k=1, nprobe=1)
    assert r1[0, 0] == 0


def test_nprobe_clamped_to_cluster_count(ivf_setup):
    """nprobe > n_clusters must behave as probe-all, not crash or mis-slice."""
    emb, index = ivf_setup
    import jax.numpy as jnp
    q = jnp.asarray(emb[:3])
    v_all, r_all = ivf_search(index, q, k=10, nprobe=index.n_clusters)
    v_over, r_over = ivf_search(index, q, k=10, nprobe=index.n_clusters * 5)
    np.testing.assert_array_equal(np.asarray(r_all), np.asarray(r_over))


def test_ivf_rejects_more_groups_than_clusters():
    from tensortruth_tpu.parallel.multislice import partition_ivf

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = build_ivf(emb, n_clusters=4, sample_size=200, kmeans_iters=2)
    with pytest.raises(ValueError):
        partition_ivf(index, 5)


def test_build_determinism_same_seed():
    """build_ivf with the same seed must be bit-reproducible (checkpoint
    compatibility: a rebuilt coordinator must route identically)."""
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((500, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    a = build_ivf(emb, n_clusters=8, sample_size=500, kmeans_iters=3, seed=42)
    b = build_ivf(emb, n_clusters=8, sample_size=500, kmeans_iters=3, seed=42)
    np.testing.assert_array_equal(a.row_map, b.row_map)
    np.testing.assert_array_equal(
        np.asarray(a.centroids, np.float32), np.asarray(b.centroids, np.float32)
    )


def test_build_ivf_capacity_exhaustion_raises():
    """A caller-forced overflow below the ≥1.0 capacity invariant must be
    refused loudly — the capacity-aware spill used to write uninitialized
    placement indices (scattering rows into blocks[-1]) when no cluster had
    free space left."""
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((1000, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    with pytest.raises(ValueError, match="capacity exhausted"):
        build_ivf(
            emb, n_clusters=2, sample_size=1000, kmeans_iters=2,
            overflow=0.1, max_overflow=0.1,
        )
