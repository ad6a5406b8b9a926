"""10M-chunk tier END-TO-END from disk artifacts (BASELINE config 5).

scripts/bench_10m_int8.py measured the device side from synthetic in-memory
arrays; this script proves the full serving path at the same scale:

  on-disk index (40 GB f32 shards + packed hierarchy)
    → VectorIndex.load            (mmap, ~ms)
    → MultiIndexEngine restack    (streaming shard→int8 quantize→HBM)
    → query batches               (fused int8 scan, k=100)
    → node hydration              (packed-store text lookup for every hit)

and reports ANONYMOUS peak memory (the algorithm's true footprint — mmap
page cache is file-backed and reclaimable, so plain RSS would overstate it
on a big-RAM host).

Usage:
  python scripts/bench_10m_artifacts.py --build [n_rows]   # CPU, writes /tmp/tier10m
  python scripts/bench_10m_artifacts.py --serve            # TPU process
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path("/tmp/tier10m")
DIM = 1024
SHARD = 250_000


def anon_mb() -> float:
    for line in Path("/proc/self/smaps_rollup").read_text().splitlines():
        if line.startswith("Anonymous:"):
            return int(line.split()[1]) / 1024
    return -1.0


def build(n_rows: int) -> None:
    from tensortruth_tpu.index.nodes import HierarchyStore, Node
    from tensortruth_tpu.index.packed import pack_index

    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    shards = []
    t0 = time.perf_counter()
    for i in range(0, n_rows, SHARD):
        rows = min(SHARD, n_rows - i)
        m = rng.standard_normal((rows, DIM)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        fname = f"embeddings.shard{i // SHARD:04d}.npy"
        np.save(OUT / fname, m)
        shards.append({"file": fname, "rows": rows})
        if (i // SHARD) % 8 == 0:
            print(f"  shard {i // SHARD + 1}/{-(-n_rows // SHARD)}", file=sys.stderr)
    (OUT / "embeddings.manifest.json").write_text(
        json.dumps({"n_rows": n_rows, "dim": DIM, "dtype": "float32", "shards": shards})
    )
    t_emb = time.perf_counter() - t0
    print(f"embeddings written: {t_emb:.0f}s", file=sys.stderr)

    t0 = time.perf_counter()
    store = HierarchyStore()
    kids_per = 8
    leaf_i = 0
    body = "retrieval corpus chunk text body " * 18  # ~600 chars/leaf
    while leaf_i < n_rows:
        p = leaf_i // kids_per
        pid = f"p{p:010d}"
        kid_ids = []
        for j in range(min(kids_per, n_rows - leaf_i)):
            nid = f"l{leaf_i:010d}"
            store.add(Node(node_id=nid, level=1, doc_id=f"doc{p % 9973}", module="m",
                           parent_id=pid, text=f"leaf {leaf_i} {body}"))
            kid_ids.append(nid)
            leaf_i += 1
        store.add(Node(node_id=pid, level=0, doc_id=f"doc{p % 9973}", module="m",
                       text="parent section " * 60, child_ids=kid_ids))
        if p % 200_000 == 0:
            print(f"  nodes {len(store):,}", file=sys.stderr)
    store.finalize_leaves()
    print(f"hierarchy in memory: {time.perf_counter() - t0:.0f}s "
          f"({len(store):,} nodes)", file=sys.stderr)
    t0 = time.perf_counter()
    pack_index(OUT, store, list(store.leaf_ids), np.ones(n_rows, bool))
    print(f"packed: {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    (OUT / "index_metadata.json").write_text(json.dumps({
        "embedding_model": "bench-synthetic", "index_version": "1.0",
        "chunk_sizes": [2048, 256], "chunk_overlap": 64,
        "chunking_strategy": "hierarchical",
    }))
    total_gb = sum(f.stat().st_size for f in OUT.rglob("*") if f.is_file()) / 1e9
    print(json.dumps({"built_rows": n_rows, "disk_gb": round(total_gb, 1)}))


def serve() -> None:
    import jax

    from tensortruth_tpu.index.store import VectorIndex
    from tensortruth_tpu.retrieval.engine import MultiIndexEngine

    report = {"backend": jax.default_backend()}
    t0 = time.perf_counter()
    idx = VectorIndex.load(OUT)
    report["load_s"] = round(time.perf_counter() - t0, 3)
    report["anon_mb_after_load"] = round(anon_mb(), 0)

    t0 = time.perf_counter()
    engine = MultiIndexEngine(
        {"m": idx},
        similarity_top_k=100,
        corpus_dtype="int8",
        use_fused=True,
        ivf_threshold=20_000_000,  # keep the flat full-recall tier
    )
    report["restack_s"] = round(time.perf_counter() - t0, 1)
    report["anon_mb_after_restack"] = round(anon_mb(), 0)
    report["n_chunks"] = engine.n_chunks

    rng = np.random.default_rng(1)
    q = rng.standard_normal((32, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    engine.retrieve_batch(q)  # compile + warm
    t0 = time.perf_counter()
    n_iter = 10
    for _ in range(n_iter):
        results = engine.retrieve_batch(q)
    report["ms_per_batch_b32"] = round((time.perf_counter() - t0) / n_iter * 1e3, 1)

    # hydration check: every hit's text comes off the packed mmap
    t0 = time.perf_counter()
    n_hits = sum(len(r) for r in results)
    assert all(n.node.text.startswith("leaf ") for r in results for n in r)
    report["hydrate_all_hits_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    report["hits_hydrated"] = n_hits
    report["anon_mb_final"] = round(anon_mb(), 0)
    print(json.dumps(report))


if __name__ == "__main__":
    if "--build" in sys.argv:
        i = sys.argv.index("--build")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 10_000_000
        build(n)
    elif "--serve" in sys.argv:
        serve()
    else:
        print(__doc__)
