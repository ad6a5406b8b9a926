"""Sharded top-k over the 8-virtual-device CPU mesh vs single-device exact.

Mirrors the reference's MultiIndexRetriever merge tests
(reference tests/unit/test_rag_engine.py) at the device level: fan-out must
return exactly what a single full-matrix search returns.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tensortruth_tpu.ops.topk import exact_topk
from tensortruth_tpu.parallel import make_mesh, shard_corpus, sharded_topk


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("n,k", [(64, 5), (1000, 10), (999, 7)])
def test_sharded_matches_exact(rng, n, k):
    d = 32
    emb = _normed(rng, n, d)
    q = _normed(rng, 4, d)
    mesh = make_mesh()
    assert mesh.shape["shards"] == 8

    emb_dev, n_actual = shard_corpus(emb, mesh)
    assert n_actual == n
    vals, idx = sharded_topk(
        jnp.asarray(q), emb_dev, k=k, mesh=mesh, n_actual=n_actual
    )
    ref_vals, ref_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)

    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_padded_rows_never_returned(rng):
    # n not divisible by 8: last shard has zero-padded rows.
    n, d, k = 13, 16, 13
    emb = _normed(rng, n, d)
    q = _normed(rng, 2, d)
    mesh = make_mesh()
    emb_dev, n_actual = shard_corpus(emb, mesh)
    vals, idx = sharded_topk(
        jnp.asarray(q), emb_dev, k=k, mesh=mesh, n_actual=n_actual
    )
    idx = np.asarray(idx)
    valid = idx[np.asarray(vals) > float("-inf")]
    assert valid.max() < n
    # All n real rows present when k == n.
    assert set(valid[: len(valid)].ravel().tolist()) <= set(range(n))


def test_k_larger_than_corpus(rng):
    n, d, k = 6, 16, 10
    emb = _normed(rng, n, d)
    q = _normed(rng, 1, d)
    mesh = make_mesh()
    emb_dev, n_actual = shard_corpus(emb, mesh)
    vals, idx = sharded_topk(
        jnp.asarray(q), emb_dev, k=k, mesh=mesh, n_actual=n_actual
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert vals.shape == (1, k) and idx.shape == (1, k)
    assert (idx[0, :n] >= 0).all()
    assert set(idx[0, :n].tolist()) == set(range(n))
    assert (idx[0, n:] == -1).all()


def test_q_sharded_2d_mesh(rng):
    """DP-sharded queries x corpus shards (the dryrun_multichip layout)."""
    from tensortruth_tpu.parallel.mesh import make_mesh

    n, d, k, b = 256, 16, 5, 4
    emb = _normed(rng, n, d)
    q = _normed(rng, b, d)
    mesh = make_mesh(n_shards=4, n_data=2)
    emb_dev, n_actual = shard_corpus(emb, mesh)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    q_dev = jax.device_put(q, NamedSharding(mesh, P("data")))
    vals, idx = sharded_topk(
        q_dev, emb_dev, k=k, mesh=mesh, n_actual=n_actual, q_sharded=True
    )
    ref_vals, ref_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_negative_cosine_rows_survive_shard_padding(rng):
    """Exactness regression: zero-padded rows (score 0) on the last shard must
    not displace true negative-cosine rows from the local top-k. Construct a
    corpus where the global top-k reaches into negative similarities."""
    d = 16
    q = _normed(rng, 1, d)
    # 13 rows, all anti-aligned with q to varying degrees: every similarity
    # is negative, so any padded zero row would outrank all of them locally.
    base = _normed(rng, 13, d)
    emb = base - 2 * (base @ q.T) * np.repeat(q, 13, axis=0) * (base @ q.T > 0)
    emb = emb - np.abs(emb @ q.T) * q  # kill positive component
    emb -= 0.05 * q  # push everything negative
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    sims = (emb @ q.T).ravel()
    assert (sims < 0).all(), "test setup: all sims must be negative"

    mesh = make_mesh()
    k = 13
    for tile_n in (None, 128):  # exact path and fused-padded layout
        emb_dev, n_actual = shard_corpus(emb.astype(np.float32), mesh, tile_n=tile_n)
        vals, idx = sharded_topk(
            jnp.asarray(q, jnp.float32), emb_dev, k=k, mesh=mesh, n_actual=n_actual
        )
        idx = np.asarray(idx)[0]
        vals = np.asarray(vals)[0]
        order = np.argsort(-sims)
        np.testing.assert_array_equal(idx, order)
        np.testing.assert_allclose(vals, sims[order], rtol=1e-5)


def test_fused_dynamic_n_valid_masks_tail(rng):
    """fused_topk with a traced n_valid must match exact over the valid prefix."""
    from tensortruth_tpu.ops.topk import fused_topk

    d, n, n_valid, k = 32, 512, 300, 10
    emb = _normed(rng, n, d)
    q = _normed(rng, 3, d)
    vals, idx = fused_topk(
        jnp.asarray(q), jnp.asarray(emb), k, tile_n=128,
        n_valid=jnp.int32(n_valid),
    )
    ref_vals, ref_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb[:n_valid]), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_sharded_int8_matches_dequantized_exact(rng):
    """int8 flat tier on a mesh (shard_corpus_int8 + scales): results must
    match single-device exact search over the dequantized corpus."""
    from tensortruth_tpu.ops.topk import quantize_corpus
    from tensortruth_tpu.parallel.sharded_topk import shard_corpus_int8

    n, d, k = 999, 32, 10
    emb = _normed(rng, n, d)
    q = _normed(rng, 4, d)
    mesh = make_mesh()

    emb_dev, scales_dev, n_actual = shard_corpus_int8(emb, mesh)
    assert n_actual == n
    vals, idx = sharded_topk(
        jnp.asarray(q), emb_dev, k=k, mesh=mesh, n_actual=n_actual,
        scales=scales_dev,
    )

    emb_q, scales = quantize_corpus(emb)
    deq = emb_q.astype(np.float32) * scales[:, None]
    ref_vals, ref_idx = exact_topk(jnp.asarray(q), jnp.asarray(deq), k)
    # int8 error vs the true corpus is ~1e-2; vs the dequantized corpus the
    # sharded path must agree to bf16 compute noise.
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), atol=2e-2)


def test_sharded_int8_padded_rows_never_returned(rng):
    from tensortruth_tpu.parallel.sharded_topk import shard_corpus_int8

    n, d, k = 13, 16, 13
    emb = _normed(rng, n, d)
    q = _normed(rng, 2, d)
    mesh = make_mesh()
    emb_dev, scales_dev, n_actual = shard_corpus_int8(emb, mesh)
    vals, idx = sharded_topk(
        jnp.asarray(q), emb_dev, k=k, mesh=mesh, n_actual=n_actual,
        scales=scales_dev,
    )
    idx = np.asarray(idx)
    valid = idx[np.asarray(vals) > float("-inf")]
    assert valid.max() < n
