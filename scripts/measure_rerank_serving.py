"""Serving-path rerank throughput: Reranker.score_pairs on the bench workload
(320 pairs × 256 tokens, real BGE-reranker-v2-m3 architecture, random-init
weights — timing-identical to pretrained).

Compares the production path (bucketed batches, async dispatch, convert
after last) against a per-batch-blocking variant to quantify what the async
dispatch discipline buys over the remote tunnel. Run on the real chip:

    python scripts/measure_rerank_serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.reranker import Reranker, _bucket
from tensortruth_tpu.models.xlmr import BGE_RERANKER_V2_M3_CONFIG
from tensortruth_tpu.tokenization.tokenizer import SimpleTokenizer

N_PAIRS = 320
PAIR_TOKENS = 256  # bench.py SEQ_PAIR


def blocking_score_pairs(rr, pairs):
    """The pre-optimization path: np.asarray after every device batch."""
    ids, mask = rr.tokenizer.encode_batch(
        [q for q, _ in pairs], rr.max_length, pair=[d for _, d in pairs]
    )
    lengths = mask.sum(axis=1)
    order = np.argsort(-lengths, kind="stable")
    max_batch = rr.batch_buckets[-1]
    out = np.empty((len(pairs),), dtype=np.float32)
    for start in range(0, len(pairs), max_batch):
        sel = order[start : start + max_batch]
        seq = _bucket(int(lengths[sel].max()), rr.seq_buckets)
        bsz = _bucket(len(sel), rr.batch_buckets)
        ids_p = np.full((bsz, seq), rr.tokenizer.pad_id, dtype=np.int32)
        mask_p = np.zeros((bsz, seq), dtype=np.int32)
        ids_p[: len(sel)] = ids[sel, :seq]
        mask_p[: len(sel)] = mask[sel, :seq]
        logits = rr._fwd(rr.params, jnp.asarray(ids_p), jnp.asarray(mask_p))
        out[sel] = np.asarray(jax.nn.sigmoid(logits[: len(sel)]), dtype=np.float32)
    return out


def time_fn(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        fn(*args)
    t0 = time.perf_counter()
    for _ in range(iters):
        fn(*args)
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    tok = SimpleTokenizer(vocab_size=BGE_RERANKER_V2_M3_CONFIG.vocab_size)
    rr = Reranker.random_init(BGE_RERANKER_V2_M3_CONFIG, tok)
    # Honest workload shape: 32 unique queries × 10 unique candidate docs
    # (the engine's adaptive top-k), ~128-token texts → full 256-token pairs.
    queries = [f"query {i} " + "retrieval " * 124 for i in range(N_PAIRS // 10)]
    pairs = [
        (queries[i // 10], f"doc {i} " + "corpus chunk " * 62)
        for i in range(N_PAIRS)
    ]

    t_async = time_fn(lambda: rr.score_pairs(pairs))
    t_block = time_fn(lambda: blocking_score_pairs(rr, pairs))
    print(f"score_pairs async   : {t_async * 1e3:8.1f} ms / {N_PAIRS} pairs")
    print(f"score_pairs blocking: {t_block * 1e3:8.1f} ms / {N_PAIRS} pairs")
    print(f"speedup: {t_block / t_async:.2f}x")
    print(f"batch buckets: {rr.batch_buckets}, seq buckets: {rr.seq_buckets}")


if __name__ == "__main__":
    main()
