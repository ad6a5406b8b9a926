import jax.numpy as jnp
import numpy as np
import pytest

from tensortruth_tpu.ops.topk import exact_topk, fused_topk, topk_search


def _normed(rng, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _numpy_topk(q, e, k):
    s = q @ e.T
    idx = np.argsort(-s, axis=1)[:, :k]
    vals = np.take_along_axis(s, idx, axis=1)
    return vals, idx


def test_exact_topk_matches_numpy(rng):
    q = _normed(rng, (5, 64))
    e = _normed(rng, (200, 64))
    vals, idx = exact_topk(jnp.asarray(q), jnp.asarray(e), 7)
    ref_vals, ref_idx = _numpy_topk(q, e, 7)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def _numpy_bucketed_model(q, e, k, m, tile_n):
    """Numpy model of the fused kernel's strided-bucket reduction."""
    b = q.shape[0]
    n = e.shape[0]
    c = tile_n // m
    n_pad = -(-n // tile_n) * tile_n
    s = q @ e.T
    s = np.pad(s, ((0, 0), (0, n_pad - n)), constant_values=-np.inf)
    cand_vals, cand_idx = [], []
    for t in range(n_pad // tile_n):
        best_v = np.full((b, c), -np.inf, dtype=np.float32)
        best_i = np.zeros((b, c), dtype=np.int64)
        for i in range(m):
            start = t * tile_n + i * c
            seg = s[:, start : start + c]
            gidx = np.arange(start, start + c)[None, :].repeat(b, 0)
            take = seg > best_v  # strict >: ties keep the earlier segment
            best_v = np.where(take, seg, best_v)
            best_i = np.where(take, gidx, best_i)
        cand_vals.append(best_v)
        cand_idx.append(best_i)
    cv = np.concatenate(cand_vals, axis=1)
    ci = np.concatenate(cand_idx, axis=1)
    order = np.argsort(-cv, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(cv, order, 1), np.take_along_axis(ci, order, 1)


@pytest.mark.parametrize("n,b,m,tile_n", [
    (4096, 4, 8, 1024),     # aligned
    (5000, 3, 8, 1024),     # ragged N (padding path)
    (2048, 1, 16, 2048),    # single query, single tile
    (1024, 20, 4, 512),     # b > sublane pad
])
def test_fused_topk_matches_bucketed_model(rng, n, b, m, tile_n):
    """Kernel == numpy model of the algorithm, element-exact."""
    d = 128
    k = 10
    q = _normed(rng, (b, d))
    e = _normed(rng, (n, d))
    f_vals, f_idx = fused_topk(jnp.asarray(q), jnp.asarray(e), k, m=m, tile_n=tile_n)
    m_vals, m_idx = _numpy_bucketed_model(q, e, k, m, tile_n)
    np.testing.assert_allclose(np.asarray(f_vals), m_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(f_idx), m_idx)


def test_fused_topk_recall_vs_exact(rng):
    """Algorithmic recall@10 of the bucketed reduction at realistic scale."""
    d = 64
    n, b, k = 65536, 16, 10
    q = _normed(rng, (b, d))
    e = _normed(rng, (n, d))
    f_vals, f_idx = fused_topk(jnp.asarray(q), jnp.asarray(e), k, m=16, tile_n=2048)
    _, ref_idx = _numpy_topk(q, e, k)
    hits = sum(
        len(set(np.asarray(f_idx)[i]) & set(ref_idx[i])) for i in range(b)
    )
    recall = hits / (b * k)
    # Expected loss ~ sum_{r<k}(r-1)*(m-1)/n ≈ 0.01 per query at this scale.
    assert recall >= 0.98, recall


def test_fused_topk_bucket_one_is_exact(rng):
    q = _normed(rng, (4, 64))
    e = _normed(rng, (1536, 64))
    f_vals, f_idx = fused_topk(jnp.asarray(q), jnp.asarray(e), 50, m=1, tile_n=256)
    ref_vals, ref_idx = _numpy_topk(q, e, 50)
    np.testing.assert_array_equal(np.asarray(f_idx), ref_idx)


def test_fused_topk_adversarial_duplicates(rng):
    # Many identical max-score rows: indices must stay within valid range and
    # scores must match the true top-k multiset.
    d = 64
    base = _normed(rng, (1, d))
    e = np.repeat(base, 600, axis=0)  # 600 identical rows
    e2 = _normed(rng, (424, d))
    emb = np.concatenate([e, e2])
    q = base
    vals, idx = fused_topk(jnp.asarray(q), jnp.asarray(emb), 20, m=8, tile_n=1024)
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx >= 0).all() and (idx < 1024).all()
    assert len(set(idx[0].tolist())) == 20  # no duplicate indices
    np.testing.assert_allclose(vals[0], 1.0, atol=1e-5)


def test_topk_k_larger_than_n(rng):
    q = _normed(rng, (2, 32))
    e = _normed(rng, (6, 32))
    vals, idx = topk_search(jnp.asarray(q), jnp.asarray(e), 10)
    assert vals.shape == (2, 10)
    assert np.asarray(idx)[:, 6:].tolist() == [[-1] * 4] * 2
    assert np.all(np.isneginf(np.asarray(vals)[:, 6:]))


def test_topk_search_dispatch(rng):
    q = _normed(rng, (2, 32))
    e = _normed(rng, (8192, 32))
    v1, i1 = topk_search(jnp.asarray(q), jnp.asarray(e), 5)           # fused
    v2, i2 = topk_search(jnp.asarray(q), jnp.asarray(e), 5, exact=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fused_topk_bf16_inputs(rng):
    q = jnp.asarray(_normed(rng, (4, 128)), dtype=jnp.bfloat16)
    e = jnp.asarray(_normed(rng, (2048, 128)), dtype=jnp.bfloat16)
    vals, idx = fused_topk(q, e, 10, m=8, tile_n=1024)
    assert vals.dtype == jnp.float32
    ref_vals, _ = _numpy_topk(
        np.asarray(q, dtype=np.float32), np.asarray(e, dtype=np.float32), 10
    )
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=2e-2, atol=2e-2)


def test_fused_topk_int8_matches_exact(rng):
    from tensortruth_tpu.ops.topk import exact_topk, fused_topk_int8, quantize_corpus

    n, d, b, k = 6000, 64, 4, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    emb_q, scales = quantize_corpus(emb)
    assert emb_q.dtype == np.int8
    # reconstruction error small
    recon = emb_q.astype(np.float32) * scales[:, None]
    assert np.abs(recon - emb).max() < 0.01

    vals, idx = fused_topk_int8(
        jnp.asarray(q), jnp.asarray(emb_q), jnp.asarray(scales), k,
        m=4, tile_n=512, c_out=1024,
    )
    ref_vals, ref_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)
    idx, ref_idx = np.asarray(idx), np.asarray(ref_idx)
    # quantization may swap near-ties: require >=90% overlap and score match
    overlap = np.mean([len(set(idx[i]) & set(ref_idx[i])) / k for i in range(b)])
    assert overlap >= 0.9
    np.testing.assert_allclose(
        np.asarray(vals)[:, 0], np.asarray(ref_vals)[:, 0], atol=5e-3
    )


def test_fused_topk_int8_padded_rows(rng):
    from tensortruth_tpu.ops.topk import fused_topk_int8, quantize_corpus

    n, d = 700, 32  # not a tile multiple
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_q, scales = quantize_corpus(emb)
    vals, idx = fused_topk_int8(
        jnp.asarray(emb[:2]), jnp.asarray(emb_q), jnp.asarray(scales), 5,
        m=4, tile_n=512, c_out=512,
    )
    idx = np.asarray(idx)
    assert idx.max() < n
    assert idx[0, 0] == 0 and idx[1, 0] == 1  # self-retrieval survives quant


def test_fused_topk_property_grid(rng):
    """Fused kernel (interpret) equals exact across a shape grid."""
    from tensortruth_tpu.ops.topk import exact_topk, fused_topk

    for n, b, k, m, tile_n in [
        (1024, 1, 1, 2, 256),
        (1500, 3, 7, 4, 512),
        (4096, 17, 20, 2, 256),
    ]:
        emb = rng.standard_normal((n, 32)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = rng.standard_normal((b, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        ev, ei = exact_topk(jnp.asarray(q), jnp.asarray(emb), k)
        fv, fi = fused_topk(jnp.asarray(q), jnp.asarray(emb), k, m=m, tile_n=tile_n,
                            c_out=4096)
        ev, fv = np.asarray(ev), np.asarray(fv)
        ei, fi = np.asarray(ei), np.asarray(fi)
        # c_out >= n/m here → zero collision loss → exact match
        np.testing.assert_array_equal(ei, fi, err_msg=f"shape {(n,b,k,m,tile_n)}")
        np.testing.assert_allclose(ev, fv, rtol=1e-5)
