"""Quality-gated rerank CASCADE experiment (VERDICT r3 item 4).

The cross-encoder rerank is ~100% of serving batch time and every
shape-level lever (int8 MXU, fused QKV, blocked attention at S=256, finer
buckets, bigger batches) was measured and rejected in r2/r3. The one
structurally different lever left: a two-stage cascade —

  1. PRESCREEN every (query, chunk) pair at a short prefix bucket
     (``--prefix`` tokens, default 64): cheap because cost is ~linear in
     token rows (BASELINE.md batch sweep: 1.86 ms/pair at S=320).
  2. FULL-SCORE only the per-query top ``--keep`` survivors (default 5
     of 10) on the production no-clip ladder.
  3. Final ordering: survivors by full score, eliminated pairs below them
     by prescreen score (the engine only surfaces top_n=3..5, all of which
     must come from survivors for the cascade to be lossless).

Measured exactly like the truncation study (scripts/
measure_truncation_delta.py): per-query Kendall tau + top-3/top-5 overlap
vs full scoring, PLUS top-3 retention (is the true top-3 a subset of the
survivors? — the only thing that matters for the served result). Timing
uses the bench.py honest steady-state serving loop (fused embed→top-k
overlapped, two-phase double-buffered rerank) so the cascade's extra
mid-batch host sync (prescreen scores must land before survivor selection)
is charged honestly.

Caveat (same as the truncation study): random-init weights at full
architecture scale — ordering stability measures architecture-level score
perturbation, NOT a trained model's semantic robustness. A trained
cross-encoder attends to the clipped evidence, so the quality deltas
reported here are a LOWER bound on the real damage.

Run (TPU, ~4 min): python scripts/measure_rerank_cascade.py [--prefix 64]
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.reranker import Reranker
from tensortruth_tpu.models.xlmr import (
    BGE_M3_CONFIG,
    BGE_RERANKER_V2_M3_CONFIG,
    XLMRConfig,
    init_params,
)
from tensortruth_tpu.pipeline import embed_topk
from tensortruth_tpu.tokenization import load_tokenizer

BATCH = 32
RERANK_TOP = 10
TOP_K = 100
DIM = 1024
_CHUNK_WORDS = [242, 242, 242, 242, 242, 242, 118, 118, 118, 215]
_POOL_SIZE = 4096


def kendall_tau(a: np.ndarray, b: np.ndarray) -> float:
    n = len(a)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = np.sign(a[i] - a[j]) * np.sign(b[i] - b[j])
            conc += s > 0
            disc += s < 0
    denom = n * (n - 1) / 2
    return float((conc - disc) / denom) if denom else 1.0


def main() -> None:
    prefix = 64
    if "--prefix" in sys.argv:
        prefix = int(sys.argv[sys.argv.index("--prefix") + 1])
    keep = 5
    if "--keep" in sys.argv:
        keep = int(sys.argv[sys.argv.index("--keep") + 1])

    on_tpu = jax.default_backend() == "tpu"
    n_chunks = 1_000_000 if on_tpu else 20_000
    emb_cfg, rr_cfg, dim = BGE_M3_CONFIG, BGE_RERANKER_V2_M3_CONFIG, DIM
    if os.environ.get("BENCH_TINY"):
        tiny = dict(vocab_size=512, hidden_size=128, num_layers=2, num_heads=2,
                    intermediate_size=256, max_position=2052)
        emb_cfg = XLMRConfig(**tiny)
        rr_cfg = XLMRConfig(num_labels=1, **tiny)
        n_chunks, dim = 4_096, 128

    key = jax.random.PRNGKey(0)
    emb_params = init_params(emb_cfg, key, dtype=jnp.bfloat16)
    rr_params = init_params(rr_cfg, key, dtype=jnp.bfloat16)
    tok = load_tokenizer()

    corpus = jax.random.normal(key, (n_chunks, dim), dtype=jnp.bfloat16)
    corpus = corpus / jnp.linalg.norm(
        corpus.astype(jnp.float32), axis=1, keepdims=True
    ).astype(jnp.bfloat16)
    pad_rows = (-n_chunks) % 2048
    if pad_rows and on_tpu:
        corpus = jnp.pad(corpus, ((0, pad_rows), (0, 0)))
    corpus = jax.block_until_ready(corpus)

    ids = jnp.ones((BATCH, 128), jnp.int32)
    mask = jnp.ones((BATCH, 128), jnp.int32)
    fused_step = lambda p, i, m, e: embed_topk(  # noqa: E731
        p, i, m, e, cfg=emb_cfg, k=min(TOP_K, n_chunks),
        n_actual=n_chunks, use_fused=on_tpu,
    )

    full = Reranker(rr_params, rr_cfg, tok)
    pre = Reranker(rr_params, rr_cfg, tok, max_length=prefix,
                   seq_buckets=(prefix,))

    words = "retrieval engine shard merge index token kernel matmul embed chunk".split()
    pool = [
        " ".join(
            f"c{j}" if i == 0 else words[(i + j) % len(words)]
            for i in range(_CHUNK_WORDS[j % len(_CHUNK_WORDS)])
        )
        for j in range(_POOL_SIZE)
    ]
    queries = [
        f"how does component {i} interact with the sharded engine"
        for i in range(BATCH)
    ]

    def build_pairs(idx_host: np.ndarray) -> list[tuple[str, str]]:
        return [
            (queries[i], pool[int(idx_host[i, j]) % len(pool)])
            for i in range(BATCH)
            for j in range(RERANK_TOP)
        ]

    # ---- quality: cascade ordering vs full ordering (same weights) -------
    rng = np.random.default_rng(0)
    taus, top3_ov, top5_ov, top3_ret = [], [], [], []
    for qi in range(BATCH):
        rows = rng.choice(len(pool), RERANK_TOP, replace=False)
        pairs = [(queries[qi], pool[r]) for r in rows]
        s_full = full.score_pairs(pairs)
        s_pre = pre.score_pairs(pairs)
        survivors = np.argsort(-s_pre, kind="stable")[:keep]
        eliminated = np.argsort(-s_pre, kind="stable")[keep:]
        s_casc = np.empty(RERANK_TOP, np.float32)
        surv_scores = full.score_pairs([pairs[i] for i in survivors])
        s_casc[survivors] = surv_scores
        # eliminated pairs rank strictly below every survivor: map their
        # prescreen scores under the survivor minimum (order-preserving)
        floor = surv_scores.min()
        s_casc[eliminated] = floor - 1e-3 * (
            1.0 + np.argsort(np.argsort(-s_pre[eliminated]))
        )
        taus.append(kendall_tau(s_full, s_casc))
        t3f = set(np.argsort(-s_full)[:3].tolist())
        t5f = set(np.argsort(-s_full)[:5].tolist())
        top3_ov.append(len(t3f & set(np.argsort(-s_casc)[:3].tolist())) / 3)
        top5_ov.append(len(t5f & set(np.argsort(-s_casc)[:5].tolist())) / 5)
        top3_ret.append(len(t3f & set(survivors.tolist())) / 3)

    # ---- timing: honest steady-state serving loop, both ways --------------
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.lax.slice_in_dim(leaf.reshape(-1), 0, 1))
        return out

    def serve_loop(rerank_batch, rounds=4):
        """bench.py two-phase loop; rerank_batch(pairs) -> finish()."""
        inflight = fused_step(emb_params, ids, mask, corpus)
        idx = np.asarray(inflight[1])[:, :RERANK_TOP]
        rerank_batch(build_pairs(idx))()  # warm every bucket
        t0 = time.perf_counter()
        inflight = fused_step(emb_params, ids, mask, corpus)
        finish_prev = None
        for _ in range(rounds):
            nxt = fused_step(emb_params, ids, mask, corpus)
            idx = np.asarray(inflight[1])[:, :RERANK_TOP]
            finish = rerank_batch(build_pairs(idx))
            if finish_prev is not None:
                finish_prev()
            finish_prev = finish
            inflight = nxt
        out = finish_prev()
        sync(inflight)
        dt = (time.perf_counter() - t0) / rounds
        assert out.shape == (BATCH * RERANK_TOP,)
        return dt

    def full_batch(pairs):
        return full.score_pairs_async(pairs)

    def cascade_batch(pairs):
        # prescreen ALL pairs at the prefix bucket, sync, full-score the
        # per-query top-`keep`. The prescreen sync is an exposed mid-batch
        # host round-trip — charged here exactly as serving would pay it.
        s_pre = pre.score_pairs_async(pairs)().reshape(BATCH, RERANK_TOP)
        surv = np.argsort(-s_pre, axis=1, kind="stable")[:, :keep]
        flat = (surv + np.arange(BATCH)[:, None] * RERANK_TOP).ravel()
        finish_surv = full.score_pairs_async([pairs[i] for i in flat])

        def finish():
            out = np.zeros((BATCH * RERANK_TOP,), np.float32)
            out[flat] = finish_surv()
            return out

        return finish

    t_full = serve_loop(full_batch)
    t_casc = serve_loop(cascade_batch)

    print(json.dumps({
        "metric": "rerank_cascade",
        "prefix_tokens": prefix,
        "keep_per_query": keep,
        "serve_full_ms": round(t_full * 1e3, 1),
        "serve_cascade_ms": round(t_casc * 1e3, 1),
        "speedup_pct": round((1 - t_casc / t_full) * 100, 1),
        "kendall_tau_mean": round(float(np.mean(taus)), 4),
        "kendall_tau_min": round(float(np.min(taus)), 4),
        "top3_overlap_mean": round(float(np.mean(top3_ov)), 4),
        "top5_overlap_mean": round(float(np.mean(top5_ov)), 4),
        "top3_retention_mean": round(float(np.mean(top3_ret)), 4),
        "n_queries": BATCH,
        "weights": "random-init full-architecture (quality deltas are a lower bound)",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
