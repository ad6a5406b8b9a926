"""Headline benchmark: end-to-end query throughput at the 1M-chunk tier.

Measures the full online query pipeline on one TPU chip (BASELINE.json
configs 3+4 workload): BGE-M3-architecture query encoding → fused Pallas
matmul+top-k over a 1M×1024 bf16 corpus → BGE-reranker-v2-m3-architecture
cross-encoder scoring of the top candidates. Weights are random-init at the
real architecture scale (no HF cache in this environment); timing is
identical to pretrained weights.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "qps", "vs_baseline": N}

``vs_baseline`` compares against the measured reference-equivalent pipeline
(torch CPU bge-m3-scale encoder + exact top-k + cross-encoder rerank — the
reference's own stack runs torch on CPU/consumer GPU; this host's torch is
CPU-only). The baseline QPS is measured once and recorded in BASELINE.md;
see REFERENCE_BASELINE_QPS below.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax

# Persistent compilation cache: remote AOT compiles over the axon tunnel cost
# minutes; cache hits cost ~nothing across runs/rounds.
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# Measured on this host (see BASELINE.md "Measured reference baseline"):
# torch-2.9 CPU reference-equivalent pipeline, same shapes as below
# (scripts/measure_reference_baseline.py, 2026-08-16; rerank stage scaled
# linearly to RERANK_TOP=10 pairs/query → 22.5s embed + 1.4s topk + 454.0s
# rerank per 32-query batch).
REFERENCE_BASELINE_QPS = 0.067

BATCH = 32          # queries per dispatch (server-side batching tier)
SEQ_Q = 128         # query token length bucket
N_CHUNKS = 1_000_000
DIM = 1024
TOP_K = 100         # dense candidates (two-stage: top-100 → rerank)
# Pairs per query through the cross-encoder = the engine's adaptive
# similarity_top_k = max(5, 2*top_n) = 10 (engine.py; reference
# rag_engine.py:590-593) — every retrieved candidate is scored, the top 5
# survive.
RERANK_TOP = 10
SEQ_PAIR = 256      # (query, chunk) pair length bucket


def _sync(out):
    """Force a real device→host round-trip: on the remote axon platform
    ``block_until_ready`` returns before execution completes."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.lax.slice_in_dim(leaf.reshape(-1), 0, 1))
    return out


def _time(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _sync(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    n_chunks = N_CHUNKS if on_tpu else 20_000  # CPU fallback for smoke runs

    from tensortruth_tpu.models.xlmr import (
        BGE_M3_CONFIG,
        BGE_RERANKER_V2_M3_CONFIG,
        cls_embed,
        init_params,
        rerank_logits,
    )
    from tensortruth_tpu.ops.topk import exact_topk, fused_topk, pad_corpus_for_fused
    from tensortruth_tpu.pipeline import embed_topk

    key = jax.random.PRNGKey(0)
    emb_params = init_params(BGE_M3_CONFIG, key, dtype=jnp.bfloat16)
    rr_params = init_params(BGE_RERANKER_V2_M3_CONFIG, key, dtype=jnp.bfloat16)

    # Synthetic normalized corpus, bf16 in HBM (1M × 1024 ≈ 2 GB),
    # pre-padded to the kernel tile multiple (no in-jit corpus copies).
    corpus = jax.random.normal(key, (n_chunks, DIM), dtype=jnp.bfloat16)
    corpus = (corpus / jnp.linalg.norm(corpus.astype(jnp.float32), axis=1, keepdims=True).astype(jnp.bfloat16))
    pad_rows = (-n_chunks) % 2048
    if pad_rows and on_tpu:
        corpus = jnp.pad(corpus, ((0, pad_rows), (0, 0)))
    corpus = jax.block_until_ready(corpus)

    ids = jnp.ones((BATCH, SEQ_Q), jnp.int32)
    mask = jnp.ones((BATCH, SEQ_Q), jnp.int32)
    embed_fn = jax.jit(partial(cls_embed, cfg=BGE_M3_CONFIG))

    pair_ids = jnp.ones((BATCH * RERANK_TOP, SEQ_PAIR), jnp.int32)
    pair_mask = jnp.ones((BATCH * RERANK_TOP, SEQ_PAIR), jnp.int32)
    rerank_fn = jax.jit(partial(rerank_logits, cfg=BGE_RERANKER_V2_M3_CONFIG))

    if on_tpu:
        topk_fn = jax.jit(
            lambda q, e: fused_topk(
                q.astype(jnp.bfloat16), e, TOP_K, n_actual=n_chunks
            )
        )
    else:
        topk_fn = jax.jit(lambda q, e: exact_topk(q, e, min(TOP_K, n_chunks)))

    t_embed, q = _time(embed_fn, emb_params, ids, mask)
    t_topk, _ = _time(topk_fn, q, corpus)
    t_rerank, _ = _time(rerank_fn, rr_params, pair_ids, pair_mask)

    # Fused single-dispatch embed→top-k (pipeline.py): halves dispatch RTTs.
    fused_step = lambda p, i, m, e: embed_topk(
        p, i, m, e, cfg=BGE_M3_CONFIG, k=TOP_K,
        n_actual=n_chunks, use_fused=on_tpu,
    )
    t_fused, _ = _time(fused_step, emb_params, ids, mask, corpus)

    total = min(t_fused, t_embed + t_topk) + t_rerank
    qps = BATCH / total

    # Steady-state pipelined throughput: dispatch R query batches
    # back-to-back without per-batch syncs. TPU executions serialize in
    # dispatch order, so host-side work and the per-dispatch tunnel RTT
    # (~30 ms here) overlap device compute — the serving tier
    # (services/batcher.py + async score_pairs) runs exactly this way.
    # Syncing the last rerank output implies every prior step completed.
    rounds = 4
    for _ in range(1):  # queue warm (already compiled above)
        fused_step(emb_params, ids, mask, corpus)
        _sync(rerank_fn(rr_params, pair_ids, pair_mask))
    t0 = time.perf_counter()
    last = None
    for _ in range(rounds):
        fused_step(emb_params, ids, mask, corpus)
        last = rerank_fn(rr_params, pair_ids, pair_mask)
    _sync(last)
    t_pipe = (time.perf_counter() - t0) / rounds
    qps_pipe = BATCH / t_pipe
    qps = max(qps, qps_pipe)

    stages = {
        "embed_ms": round(t_embed * 1e3, 2),
        "topk_ms": round(t_topk * 1e3, 2),
        "embed_topk_fused_ms": round(t_fused * 1e3, 2),
        "rerank_ms": round(t_rerank * 1e3, 2),
        "pipelined_ms_per_batch": round(t_pipe * 1e3, 2),
        "backend": jax.default_backend(),
        "n_chunks": n_chunks,
    }
    print(
        json.dumps(
            {
                "metric": "query_throughput_1M_retrieve_rerank",
                "value": round(qps, 2),
                "unit": "qps",
                "vs_baseline": round(qps / REFERENCE_BASELINE_QPS, 1),
                "detail": stages,
            }
        )
    )


if __name__ == "__main__":
    main()
