"""Measure the effect of a 256-token rerank cap on score ORDERING.

VERDICT r2 weak #6 asked what clipping (query, chunk) pairs at 256 tokens
does to rerank ordering, given real leaf chunks are 256 tokens PLUS query
and separators (~275 total). The serving path does NOT truncate (Reranker
max_length=2048 with a bucket ladder through 320; test_model_runtime.py
asserts it), so this measures the delta that a 256 cap WOULD introduce —
i.e. what the pre-r3 fixed-256 bench was silently doing.

Caveat: no pretrained BGE weights exist in this environment, so the model
is random-init at full architecture scale. Random weights produce weakly
discriminative scores (the sigmoid head sees near-identical CLS vectors),
so ordering stability here measures architecture-level score perturbation,
NOT the trained model's semantic robustness — a trained cross-encoder
attends to clipped evidence and would shift more. Re-run with real weights
where available; the hard guarantee is that the SERVING path never clips
(Reranker max_length=2048, enforced by
test_score_pairs_never_truncates_below_max_length). Prints one JSON line with per-query Kendall tau and top-5
overlap between full-length and clipped scoring.

Run (TPU, ~2 min): python scripts/measure_truncation_delta.py
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.reranker import Reranker
from tensortruth_tpu.models.xlmr import BGE_RERANKER_V2_M3_CONFIG, init_params
from tensortruth_tpu.tokenization import load_tokenizer

N_QUERIES = 32
DOCS_PER_QUERY = 10


def kendall_tau(a: np.ndarray, b: np.ndarray) -> float:
    """Kendall rank correlation between two score vectors (same items)."""
    n = len(a)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = np.sign(a[i] - a[j]) * np.sign(b[i] - b[j])
            conc += s > 0
            disc += s < 0
    denom = n * (n - 1) / 2
    return float((conc - disc) / denom) if denom else 1.0


def main():
    cfg = BGE_RERANKER_V2_M3_CONFIG
    if os.environ.get("BENCH_TINY"):
        from tensortruth_tpu.models.xlmr import XLMRConfig

        cfg = XLMRConfig(vocab_size=512, hidden_size=128, num_layers=2,
                         num_heads=2, intermediate_size=256,
                         max_position=2052, num_labels=1)
    tok = load_tokenizer()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    full = Reranker(params, cfg, tok)          # production ladder, no clip
    clipped = Reranker(params, cfg, tok, max_length=256,
                       seq_buckets=(64, 128, 192, 256))

    words = ("retrieval engine shard merge index token kernel matmul embed "
             "chunk gather scatter fuse stream cache").split()
    rng = np.random.default_rng(0)
    taus, overlaps, deltas = [], [], []
    for qi in range(N_QUERIES):
        query = f"how does component {qi} of the engine merge sharded results"
        docs = []
        for d in range(DOCS_PER_QUERY):
            # 280-360 words → pairs of ~300-375 tokens, so a 256 cap drops a
            # real 15-30% tail (the first draft used ~255-token pairs, which
            # a 256 cap never clipped — tau was trivially 1.0)
            n_words = 280 + 8 * d
            docs.append(" ".join(rng.choice(words, n_words)))
        pairs = [(query, d) for d in docs]
        s_full = full.score_pairs(pairs)
        s_clip = clipped.score_pairs(pairs)
        taus.append(kendall_tau(s_full, s_clip))
        deltas.append(float(np.abs(s_full - s_clip).max()))
        top5_f = set(np.argsort(-s_full)[:5].tolist())
        top5_c = set(np.argsort(-s_clip)[:5].tolist())
        overlaps.append(len(top5_f & top5_c) / 5)
    print(json.dumps({
        "metric": "rerank_256_truncation_delta",
        "kendall_tau_mean": round(float(np.mean(taus)), 4),
        "kendall_tau_min": round(float(np.min(taus)), 4),
        "top5_overlap_mean": round(float(np.mean(overlaps)), 4),
        "max_abs_score_delta": round(float(np.max(deltas)), 5),
        "n_queries": N_QUERIES,
        "weights": "random-init full-architecture (no pretrained in env)",
    }))


if __name__ == "__main__":
    main()
