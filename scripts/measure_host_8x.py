"""Host-side cost of feeding 8 chips' DP rerank from ONE batcher
(VERDICT r3 item 7: the ~500 QPS v5e-8 projection assumed the host could
tokenize + pair-build + hydrate at 8x pair volume inside the device budget —
this measures that term instead of assuming it).

Serving shape at v5e-8: a 256-query batch (8 x the single-chip 32) retrieves
top-10 candidates each -> 2560 (query, chunk) pairs through the DP
cross-encoder. Device time for those pairs is ~480 ms (8-way DP of the
measured 481 ms single-chip rerank -> same wall time for 8x pairs). With the
two-phase double-buffering (services/batcher.py) host work overlaps device
compute, so the projection holds iff

    host_ms(hydrate + pair build + tokenize + bucket/pad) < device_ms.

Everything measured here is the REAL host path:
  * hydration — PackedVectorIndex.node_of_row().text off the mmap store
    built by this script (leaf bodies at the measured pair-length mix,
    scripts/measure_pair_lengths.py: ~65% ≈ 275 tok, ~30% ≈ 147, 5% ≈ 250);
  * tokenize/bucket/pad — the production Reranker.score_pairs_async host
    stages, with the device forward stubbed out (CPU can't run the 568M
    model; its cost is the separately-measured device term).

Runs on CPU: python scripts/measure_host_8x.py [--rows 250000]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

OUT = Path("/tmp/host8x_store")
DIM = 64  # embeddings irrelevant here; hydration reads texts only
CHUNK_WORDS = [242, 242, 242, 242, 242, 242, 118, 118, 118, 215]
DEVICE_BUDGET_MS = 480.0  # measured single-chip 320-pair rerank ≈ 8-chip 2560


def build_store(n_rows: int) -> None:
    from tensortruth_tpu.index.nodes import HierarchyStore, Node
    from tensortruth_tpu.index.packed import pack_index

    OUT.mkdir(parents=True, exist_ok=True)
    words = "retrieval engine shard merge index token kernel matmul embed chunk".split()
    store = HierarchyStore()
    kids_per = 8
    leaf = 0
    while leaf < n_rows:
        p = leaf // kids_per
        pid = f"p{p:09d}"
        kid_ids = []
        for _ in range(min(kids_per, n_rows - leaf)):
            n_words = CHUNK_WORDS[leaf % len(CHUNK_WORDS)]
            body = " ".join(
                f"c{leaf}" if i == 0 else words[(i + leaf) % len(words)]
                for i in range(n_words)
            )
            nid = f"l{leaf:09d}"
            store.add(Node(node_id=nid, level=1, doc_id=f"d{p % 997}",
                           module="m", parent_id=pid, text=body))
            kid_ids.append(nid)
            leaf += 1
        store.add(Node(node_id=pid, level=0, doc_id=f"d{p % 997}", module="m",
                       text="parent " * 40, child_ids=kid_ids))
    store.finalize_leaves()
    pack_index(OUT, store, list(store.leaf_ids), np.ones(n_rows, bool))
    np.save(OUT / "embeddings.npy", np.zeros((n_rows, DIM), np.float32))
    (OUT / "index_metadata.json").write_text(json.dumps({
        "embedding_model": "host8x", "index_version": "1.0"}))


def measure(n_rows: int) -> None:
    from tensortruth_tpu.index.store import VectorIndex
    from tensortruth_tpu.models.reranker import Reranker
    from tensortruth_tpu.models.xlmr import XLMRConfig
    from tensortruth_tpu.tokenization import load_tokenizer

    idx = VectorIndex.load(OUT)
    tok = load_tokenizer()
    tiny = XLMRConfig(vocab_size=512, hidden_size=64, num_layers=1, num_heads=1,
                      intermediate_size=128, max_position=2052, num_labels=1)
    rr = Reranker.random_init(tiny, tok)
    # Stub the device forward: host stages (tokenize/sort/bucket/pad) run for
    # real; the forward's cost is the separately measured DEVICE term.
    rr._fwd = lambda p, ids, mask: jnp.zeros((ids.shape[0],), jnp.float32)

    report = {"n_rows": n_rows, "tokenizer": type(tok).__name__}
    rng = np.random.default_rng(0)
    for n_q in (32, 256):
        queries = [
            f"how does component {i} interact with the sharded engine"
            for i in range(n_q)
        ]
        n_pairs = n_q * 10

        def one_batch():
            # fresh DISTINCT rows per batch — no memoization honesty hole
            rows = rng.choice(n_rows, n_pairs, replace=False)
            t0 = time.perf_counter()
            texts = [idx.node_of_row(int(r)).text for r in rows]
            t1 = time.perf_counter()
            pairs = [(queries[i // 10], texts[i]) for i in range(n_pairs)]
            t2 = time.perf_counter()
            finish = rr.score_pairs_async(pairs)
            finish()
            t3 = time.perf_counter()
            return (t1 - t0, t2 - t1, t3 - t2)

        one_batch()  # warm (page cache, id cache, jit of the stub concat)
        iters = 10
        sums = np.zeros(3)
        for _ in range(iters):
            sums += one_batch()
        hyd, pair, tokpad = (s / iters * 1e3 for s in sums)
        total = hyd + pair + tokpad
        report[f"b{n_q}"] = {
            "pairs": n_pairs,
            "hydrate_ms": round(hyd, 1),
            "pair_build_ms": round(pair, 1),
            "tokenize_bucket_pad_ms": round(tokpad, 1),
            "host_total_ms": round(total, 1),
        }
        if n_q == 256:
            report["device_budget_ms"] = DEVICE_BUDGET_MS
            report["host_fits_budget"] = bool(total < DEVICE_BUDGET_MS)
            report["projected_v5e8_qps"] = round(
                n_q / (max(total, DEVICE_BUDGET_MS) / 1e3), 1
            )

    # -- worker-pool sweep (r4 verdict item 5): the REAL feeding path ------
    # HostFeeder.hydrate_and_tokenize runs hydrate -> pair-build -> tokenize
    # end-to-end inside each worker, then score_tokenized_async does
    # bucket/pad + (stubbed) dispatch. Host total per worker count is what
    # the BASELINE.md host-feeding table records; run this on the serving
    # host to size rag.host_feed_workers (this VM exposes one core, so the
    # local sweep validates structure/overhead, not multi-core speedup).
    from tensortruth_tpu.services.feeder import HostFeeder

    n_q, per_q = 256, 10
    n_pairs = n_q * per_q
    queries = [f"how does component {i} interact with the engine" for i in range(n_q)]
    sweep = {}
    for workers in (1, 2, 4, 8):
        feeder = HostFeeder(workers)
        rows = rng.choice(n_rows, n_pairs, replace=False)

        def one(rows):
            t0 = time.perf_counter()
            ids, mask = feeder.hydrate_and_tokenize(
                rr.tokenizer,
                query_of=lambda i: queries[i // per_q],
                hydrate=lambda i: idx.node_of_row(int(rows[i])).text,
                n_pairs=n_pairs, max_length=rr.max_length,
            )
            t1 = time.perf_counter()
            rr.score_tokenized_async(ids, mask)()
            t2 = time.perf_counter()
            return (t1 - t0) * 1e3, (t2 - t1) * 1e3

        one(rows)  # warm
        iters = 5
        feed = pad = 0.0
        for _ in range(iters):
            rows = rng.choice(n_rows, n_pairs, replace=False)
            f_ms, p_ms = one(rows)
            feed += f_ms
            pad += p_ms
        feeder.close()
        sweep[f"w{workers}"] = {
            "hydrate_pair_tokenize_ms": round(feed / iters, 1),
            "bucket_pad_ms": round(pad / iters, 1),
            "host_total_ms": round((feed + pad) / iters, 1),
        }
    report["worker_sweep_b256"] = sweep
    report["host_cores"] = os.cpu_count()
    print(json.dumps(report))


if __name__ == "__main__":
    n = 250_000
    if "--rows" in sys.argv:
        n = int(sys.argv[sys.argv.index("--rows") + 1])
    if not (OUT / "packed" / "manifest.json").exists() or "--rebuild" in sys.argv:
        build_store(n)
    measure(n)
