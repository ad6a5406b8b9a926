"""Fused embed→top-k pipeline vs the two-stage path (tiny models, CPU)."""

import numpy as np

from tensortruth_tpu.index.chunker import hierarchical_chunk
from tensortruth_tpu.index.store import VectorIndex
from tensortruth_tpu.models.embedder import Embedder
from tensortruth_tpu.models.xlmr import XLMRConfig
from tensortruth_tpu.pipeline import QueryPipeline
from tensortruth_tpu.retrieval.engine import MultiIndexEngine
from tensortruth_tpu.tokenization import load_tokenizer

TINY = XLMRConfig(
    vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, max_position=130,
)


def _setup(sample_text):
    tok = load_tokenizer()
    embedder = Embedder.random_init(TINY, tok, max_length=64)
    nodes = hierarchical_chunk(
        sample_text, tok, "doc", module="m", chunk_sizes=[128, 32], chunk_overlap=8
    )
    index = VectorIndex.build(nodes, lambda texts: embedder.encode(texts))
    engine = MultiIndexEngine({"m": index}, similarity_top_k=5, use_fused=False)
    return embedder, engine


def test_fused_matches_two_stage(sample_text):
    embedder, engine = _setup(sample_text)
    pipeline = QueryPipeline(embedder, engine)
    assert pipeline.applicable()

    query = "Paragraph 3 about topic 3"
    fused = pipeline.retrieve_batch([query])[0]

    q_emb = embedder.encode([query], is_query=True)[0]
    two_stage = engine.retrieve_batch(q_emb[None, :])[0]

    assert [r.node_id for r in fused] == [r.node_id for r in two_stage]
    np.testing.assert_allclose(
        [r.score for r in fused], [r.score for r in two_stage], rtol=1e-3, atol=1e-3
    )


def test_retrieve_one_caches(sample_text):
    embedder, engine = _setup(sample_text)
    pipeline = QueryPipeline(embedder, engine)
    r1 = pipeline.retrieve_one("hello query")
    r2 = pipeline.retrieve_one("hello query")
    assert r1 is r2
    engine.clear_cache()
    assert pipeline.retrieve_one("hello query") is not r1


def test_not_applicable_with_mesh(sample_text):
    from tensortruth_tpu.parallel import make_mesh

    embedder, _ = _setup(sample_text)
    tok = load_tokenizer()
    nodes = hierarchical_chunk(sample_text, tok, "doc", chunk_sizes=[128, 32], chunk_overlap=8)
    index = VectorIndex.build(nodes, lambda t: embedder.encode(t))
    engine = MultiIndexEngine({"m": index}, mesh=make_mesh(), use_fused=False)
    assert not QueryPipeline(embedder, engine).applicable()
