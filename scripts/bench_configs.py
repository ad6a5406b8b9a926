"""Run all five BASELINE.json benchmark configs and print one JSON line each.

1. single arXiv-paper index (~2k chunks), flat cosine top-k
2. ~50k-chunk API-doc index with hierarchical auto-merging retrieval
3. two-stage: top-100 dense + cross-encoder rerank  (= bench.py headline)
4. 1M chunks, fused Pallas top-k (single chip here; the mesh merge path is
   validated on the 8-virtual-device CPU mesh in tests/unit/test_sharded_topk.py
   and by the driver's dryrun_multichip)
5. multi-million-chunk IVF tier (2M here — 10M×1024 needs the multi-slice
   mesh; int8 tier doubles single-chip capacity, see BASELINE.md)

Retrieval tiers (1/2/4/5) use synthetic normalized embeddings — they measure
the search engine, not the encoder; config 3's encoder+rerank cost is
measured by bench.py on the same chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, D, K = 32, 1024, 10


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    if hasattr(leaf, "reshape"):  # device array → force real round-trip
        np.asarray(leaf.reshape(-1)[:1])
    return x


def _time(fn, iters=5):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _corpus(rng, n, d=D, dtype=np.float32):
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(dtype)


def emit(config, n, ms, extra=None):
    print(
        json.dumps(
            {
                "config": config,
                "n_chunks": n,
                "ms_per_batch": round(ms * 1e3, 2),
                "qps": round(B / ms, 1),
                **(extra or {}),
            }
        ),
        flush=True,
    )


def config1():
    from tensortruth_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(1)
    emb = jnp.asarray(_corpus(rng, 2048), jnp.bfloat16)
    q = jnp.asarray(_corpus(rng, B), jnp.bfloat16)
    ms = _time(lambda: exact_topk(q, emb, K))
    emit("1:arxiv-2k-flat", 2048, ms)


def config2():
    """50k chunks through the FULL MultiIndexEngine path incl. host
    auto-merge + balancing (two modules)."""
    from tensortruth_tpu.index.nodes import HierarchyStore, Node
    from tensortruth_tpu.index.store import VectorIndex
    from tensortruth_tpu.retrieval.engine import MultiIndexEngine

    rng = np.random.default_rng(2)

    def make_index(n_parents, module):
        store_nodes = []
        leaf_ids = []
        for p in range(n_parents):
            parent = Node(node_id=f"{module}p{p}", text="P" * 200, level=0, doc_id=module)
            kids = [
                Node(node_id=f"{module}p{p}c{c}", text="x" * 100, level=1,
                     doc_id=module, parent_id=parent.node_id, module=module)
                for c in range(4)
            ]
            parent.child_ids = [k.node_id for k in kids]
            store_nodes.append(parent)
            store_nodes.extend(kids)
            leaf_ids.extend(k.node_id for k in kids)
        store = HierarchyStore()
        store.add_all(store_nodes)
        store.finalize_leaves()
        emb = _corpus(rng, len(leaf_ids))
        return VectorIndex(emb, leaf_ids, store, {"index_version": "1.0"})

    indexes = {
        "api_a": make_index(6250, "a"),  # 25k leaves
        "api_b": make_index(6250, "b"),  # 25k leaves
    }
    engine = MultiIndexEngine(indexes, similarity_top_k=10)
    q = _corpus(rng, B)
    ms = _time(lambda: engine.retrieve_batch(q), iters=3)
    emit("2:apidocs-50k-automerge", 50_000, ms, {"modules": 2})


def config4():
    from tensortruth_tpu.ops.topk import fused_topk, pad_corpus_for_fused

    rng = np.random.default_rng(4)
    emb_np, n_actual = pad_corpus_for_fused(
        _corpus(rng, 1_000_000, dtype=np.float32).astype(jnp.bfloat16)
    )
    emb = jnp.asarray(emb_np)
    q = jnp.asarray(_corpus(rng, B), jnp.bfloat16)
    # Host-timed (incl ~30ms tunnel RTT); device-only is 4.1 ms — BASELINE.md.
    ms = _time(lambda: fused_topk(q, emb, 100, n_actual=n_actual))
    emit("4:1M-fused-topk", 1_000_000, ms, {"k": 100})


def config5():
    from tensortruth_tpu.ops.ivf import build_ivf, ivf_search

    rng = np.random.default_rng(5)
    n = 2_000_000
    emb = _corpus(rng, n, dtype=np.float32)
    t0 = time.perf_counter()
    index = build_ivf(emb, n_clusters=512, sample_size=100_000, kmeans_iters=8)
    build_s = time.perf_counter() - t0
    # IVF is the low-latency / beyond-HBM tier: at large batch x nprobe the
    # probed fraction exceeds a full scan (B*nprobe*rpc/N), so measure the
    # latency-serving operating point (B=4) alongside the bulk batch.
    q4 = _corpus(rng, 4)
    ms4 = _time(lambda: ivf_search(index, q4, K, nprobe=8), iters=3)
    print(json.dumps({"config": "5:2M-ivf-b4-nprobe8", "n_chunks": n,
                      "ms_per_batch": round(ms4 * 1e3, 2),
                      "qps": round(4 / ms4, 1),
                      "build_s": round(build_s, 1)}), flush=True)
    q = _corpus(rng, B)
    ms = _time(lambda: ivf_search(index, q, K, nprobe=16), iters=3)
    emit("5:2M-ivf-b32-nprobe16", n, ms, {"build_s": round(build_s, 1), "n_clusters": 512})


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "4", "5"]
    for c in which:
        {"1": config1, "2": config2, "4": config4, "5": config5}[c]()
