"""Probe: do finer rerank seq buckets (160/224/288) beat the 64-stride set?

The serving headline is cross-encoder-bound, and the realistic pair-length
mix (scripts/measure_pair_lengths.py) lands on buckets that waste padding:
~275-token pairs pad to 320 (+16%), ~147-token pairs pad to 192 (+31%).
Inserting 32-stride buckets between 128 and 320 cuts the padded token-rows
~12% on the measured mix — IF the MXU/XLA cost at a non-64-multiple seq
(e.g. 288) scales with S and does not round up internally.

Two measurements on the real chip:
  1. single-forward cost at B=64 across S ∈ {160,192,224,256,288,320} —
     does ms/token-row stay flat at the odd lengths?
  2. production ``score_pairs`` on the bench.py realistic mix with the
     current bucket set vs the finer set.

Run:  python scripts/probe_seq_buckets.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.reranker import Reranker
from tensortruth_tpu.models.xlmr import (
    BGE_RERANKER_V2_M3_CONFIG,
    init_params,
    rerank_logits,
)
from tensortruth_tpu.tokenization.tokenizer import SimpleTokenizer

BATCH = 32
RERANK_TOP = 10
N_PAIRS = BATCH * RERANK_TOP
# bench.py realistic mix: word counts per 10 chunks → ~275/147/250-token pairs
_CHUNK_WORDS = [242, 242, 242, 242, 242, 242, 118, 118, 118, 215]
_POOL_SIZE = 4096

CURRENT = (64, 128, 192, 256, 320, 512, 1024, 2048)
FINER = (64, 128, 160, 192, 224, 256, 288, 320, 512, 1024, 2048)


def sync(x):
    np.asarray(jax.lax.slice_in_dim(jax.tree_util.tree_leaves(x)[0].reshape(-1), 0, 1))
    return x


def time_fn(fn, iters=3, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def build_pairs(tok):
    words = "retrieval engine shard merge index token kernel matmul embed chunk".split()
    pool = [
        " ".join(
            f"c{j}" if i == 0 else words[(i + j) % len(words)]
            for i in range(_CHUNK_WORDS[j % len(_CHUNK_WORDS)])
        )
        for j in range(_POOL_SIZE)
    ]
    queries = [f"how does component {i} interact with the sharded engine" for i in range(BATCH)]
    rng = np.random.default_rng(0)
    picks = rng.integers(0, _POOL_SIZE, size=N_PAIRS)
    return [(queries[i // RERANK_TOP], pool[picks[i]]) for i in range(N_PAIRS)]


def token_rows(rr, pairs):
    ids, mask = rr.tokenizer.encode_batch(
        [q for q, _ in pairs], rr.max_length, pair=[d for _, d in pairs]
    )
    lengths = mask.sum(axis=1)
    from tensortruth_tpu.models.reranker import _bucket

    return int(sum(_bucket(int(n), rr.seq_buckets) for n in lengths)), lengths


def main():
    print("backend:", jax.default_backend())
    cfg = BGE_RERANKER_V2_M3_CONFIG
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    fwd = jax.jit(partial(rerank_logits, cfg=cfg))

    # --- 1. per-seq forward cost at B=64 ---------------------------------
    print("\nforward cost at B=64 (3-iter mean):")
    print(f"{'S':>5} {'ms':>8} {'us/token-row':>14}")
    for S in (160, 192, 224, 256, 288, 320):
        ids = jnp.ones((64, S), jnp.int32)
        mask = jnp.ones((64, S), jnp.int32)
        t = time_fn(lambda: sync(fwd(params, ids, mask)))
        print(f"{S:>5} {t * 1e3:>8.2f} {t * 1e6 / (64 * S):>14.3f}")

    # --- 2. production score_pairs on the realistic mix ------------------
    pairs = build_pairs(tok)
    for name, buckets in (("current", CURRENT), ("finer", FINER)):
        rr = Reranker.random_init(cfg, tok, seq_buckets=buckets)
        rows, lengths = token_rows(rr, pairs)
        t = time_fn(lambda: rr.score_pairs(pairs))
        print(
            f"\n{name:8} buckets: {t * 1e3:8.1f} ms / {N_PAIRS} pairs"
            f"  (padded token-rows {rows}, real {int(lengths.sum())})"
        )


if __name__ == "__main__":
    main()
