"""Single-process coverage of the global-mesh helpers (parallel/distributed.py).

The 2-OS-process collective run lives in
tests/integration/test_jax_distributed.py; these tests pin the pure
row-range / placement / search algebra on the in-process 8-virtual-device
mesh, where a "cluster" of one process owns every shard.
"""

import numpy as np
import pytest

from tensortruth_tpu.parallel import make_mesh
from tensortruth_tpu.parallel.distributed import (
    GlobalMeshIVF,
    GlobalMeshSearch,
    my_cluster_range,
    my_row_range,
    place_global_corpus,
    place_global_ivf,
)


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_my_row_range_tile_alignment():
    mesh = make_mesh()
    start, stop, n_pad = my_row_range(mesh, 1000, tile_n=64)
    # 8 shards, ceil(125/64)*64 = 128 rows/shard
    assert (start, stop, n_pad) == (0, 1024, 1024)
    # one process owns everything, so the range covers the padded matrix
    start, stop, n_pad = my_row_range(mesh, 1024, tile_n=64)
    assert (start, stop, n_pad) == (0, 1024, 1024)


def test_my_row_range_no_tile_padding():
    mesh = make_mesh()
    start, stop, n_pad = my_row_range(mesh, 800, tile_n=0)
    assert (start, stop, n_pad) == (0, 800, 800)


def test_place_global_corpus_pads_and_validates(rng):
    mesh = make_mesh()
    n, d = 1000, 16
    rows = _normed(rng, n, d)
    emb = place_global_corpus(rows, mesh=mesh, n_total=n, tile_n=64)
    assert emb.shape == (1024, d)
    host = np.asarray(emb)
    np.testing.assert_allclose(host[:n], rows, rtol=1e-6)
    assert (host[n:] == 0).all()

    with pytest.raises(ValueError, match="expected 1000 local rows"):
        place_global_corpus(rows[:-1], mesh=mesh, n_total=n, tile_n=64)


def test_global_mesh_search_matches_numpy(rng):
    mesh = make_mesh()
    n, d, k, b = 777, 32, 9, 4
    corpus = _normed(rng, n, d)
    q = _normed(rng, b, d)
    engine = GlobalMeshSearch(corpus, n_total=n, mesh=mesh, tile_n=64)
    scores, ids = engine.search(q, k)

    ref = q @ corpus.T
    ref_ids = np.argsort(-ref, axis=1)[:, :k]
    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(
        scores, np.take_along_axis(ref, ref_ids, axis=1), atol=1e-5
    )


def test_global_mesh_search_int8_tier(rng):
    mesh = make_mesh()
    n, d, k, b = 512, 64, 10, 4
    corpus = _normed(rng, n, d)
    q = _normed(rng, b, d)
    engine = GlobalMeshSearch(corpus, n_total=n, mesh=mesh, tile_n=64,
                              dtype="int8")
    assert engine.scales is not None and engine.scales.shape == (512,)
    _, ids = engine.search(q, k)
    ref_ids = np.argsort(-(q @ corpus.T), axis=1)[:, :k]
    overlap = np.mean([
        len(set(ids[i].tolist()) & set(ref_ids[i].tolist())) / k
        for i in range(b)
    ])
    assert overlap >= 0.8, overlap


def test_my_cluster_range_pads_to_shard_count():
    mesh = make_mesh()
    start, stop, nc_pad = my_cluster_range(mesh, 10)
    assert (start, stop, nc_pad) == (0, 16, 16)
    start, stop, nc_pad = my_cluster_range(mesh, 16)
    assert (start, stop, nc_pad) == (0, 16, 16)


def test_global_mesh_ivf_exhaustive_probe_matches_numpy(rng):
    import jax.numpy as jnp

    from tensortruth_tpu.ops.ivf import build_ivf

    mesh = make_mesh()
    n, d, k, b, ncl = 500, 32, 7, 3, 16
    corpus = _normed(rng, n, d)
    q = _normed(rng, b, d)
    idx = build_ivf(corpus, n_clusters=ncl, sample_size=n, kmeans_iters=4,
                    seed=3, block_dtype=jnp.float32)
    sidx = place_global_ivf(
        mesh=mesh, n_clusters=ncl, n_actual=n,
        local_centroids=np.asarray(idx.centroids),
        local_blocks=np.asarray(idx.blocks),
        local_valid=(idx.row_map >= 0).astype(np.int32),
        row_map=idx.row_map,
    )
    scores, ids = GlobalMeshIVF(sidx).search(q, k, nprobe=ncl)

    ref = q @ corpus.T
    ref_ids = np.argsort(-ref, axis=1)[:, :k]
    np.testing.assert_array_equal(ids, ref_ids)

    with pytest.raises(ValueError, match="expected 16 local clusters"):
        place_global_ivf(
            mesh=mesh, n_clusters=ncl, n_actual=n,
            local_centroids=np.asarray(idx.centroids)[:-1],
            local_blocks=np.asarray(idx.blocks)[:-1],
            local_valid=(idx.row_map >= 0).astype(np.int32)[:-1],
        )


def test_global_mesh_search_requires_batch_on_non_serving_host(rng):
    mesh = make_mesh()
    corpus = _normed(rng, 64, 16)
    engine = GlobalMeshSearch(corpus, n_total=64, mesh=mesh, tile_n=0)
    with pytest.raises(ValueError, match="batch="):
        engine.search(None, 5)
