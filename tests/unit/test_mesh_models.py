"""DP encoder/reranker forwards on the 8-virtual-device CPU mesh.

VERDICT round 1 item 2: the rerank stage is ~91% of e2e time and scales by
data parallelism over the mesh — these tests prove the mesh path is
numerically identical to single-device before any hardware scaling claim.
"""

import numpy as np
import pytest

from tensortruth_tpu.models.embedder import Embedder
from tensortruth_tpu.models.reranker import Reranker
from tensortruth_tpu.models.xlmr import XLMRConfig
from tensortruth_tpu.parallel.mesh import make_mesh
from tensortruth_tpu.tokenization import load_tokenizer

TINY = XLMRConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position=130,
)
TINY_RR = XLMRConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position=130, num_labels=1,
)


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer()


def test_dp_embedder_matches_single_device(tok):
    import jax.numpy as jnp

    mesh = make_mesh(n_shards=4, n_data=2)
    single = Embedder.random_init(TINY, tok, seed=7, dtype=jnp.float32, max_length=128)
    dp = Embedder.random_init(
        TINY, tok, seed=7, dtype=jnp.float32, max_length=128, mesh=mesh
    )
    texts = [f"sharded retrieval question number {i}" for i in range(11)]
    a = single.encode(texts)
    b = dp.encode(texts)
    assert b.shape == a.shape
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_dp_reranker_matches_single_device(tok):
    import jax.numpy as jnp

    mesh = make_mesh(n_shards=8, n_data=1)
    single = Reranker.random_init(TINY_RR, tok, seed=3, dtype=jnp.float32, max_length=128)
    dp = Reranker.random_init(
        TINY_RR, tok, seed=3, dtype=jnp.float32, max_length=128, mesh=mesh
    )
    query = "what is mesh sharding"
    docs = [f"document text {i} about collectives and meshes" for i in range(13)]
    a = single.score(query, docs)
    b = dp.score(query, docs)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    pairs = [(f"q{i}", f"doc body {i}") for i in range(9)]
    a = single.score_pairs(pairs)
    b = dp.score_pairs(pairs)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_dp_batch_padding_is_device_multiple(tok):
    import jax.numpy as jnp

    mesh = make_mesh(n_shards=4, n_data=2)
    dp = Reranker.random_init(
        TINY_RR, tok, seed=0, dtype=jnp.float32, max_length=128, mesh=mesh,
        batch_buckets=(4, 12),  # 12 is NOT a multiple of 8 — must round up
    )
    scores = dp.score("q", [f"d{i}" for i in range(10)])
    assert scores.shape == (10,)
