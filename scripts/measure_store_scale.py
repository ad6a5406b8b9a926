"""Measure hierarchy-store load time + host RSS at capacity-tier node counts.

Compares the JSONL HierarchyStore against the packed mmap store
(index/packed.py) on a synthetic hierarchy shaped like real module builds
(parents with ~8 children, 256-token-ish leaf texts), then measures the
serving-path cost that actually matters: hydrate a top-k of leaves + walk
their parents (the automerge access pattern).

Run: python scripts/measure_store_scale.py [n_leaves]
"""

import json
import resource
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_and_save(n_leaves: int, out: Path) -> None:
    import numpy as np

    from tensortruth_tpu.index.nodes import HierarchyStore, Node
    from tensortruth_tpu.index.packed import pack_index

    store = HierarchyStore()
    kids_per = 8
    n_parents = -(-n_leaves // kids_per)
    leaf_i = 0
    for p in range(n_parents):
        pid = f"p{p:010d}"
        kid_ids = []
        for j in range(min(kids_per, n_leaves - leaf_i)):
            nid = f"l{leaf_i:010d}"
            store.add(
                Node(
                    node_id=nid, level=1, doc_id=f"doc{p % 997}", module="m",
                    parent_id=pid, start=j * 1000, end=j * 1000 + 999,
                    text=(f"leaf {leaf_i} " + "token " * 120),  # ~256-token leaf
                )
            )
            kid_ids.append(nid)
            leaf_i += 1
        store.add(
            Node(node_id=pid, level=0, doc_id=f"doc{p % 997}", module="m",
                 text="parent " * 400, child_ids=kid_ids)
        )
    store.finalize_leaves()
    t0 = time.perf_counter()
    store.save(out / "hierarchy.jsonl")
    t_jsonl = time.perf_counter() - t0
    t0 = time.perf_counter()
    pack_index(out, store, list(store.leaf_ids), np.ones(n_leaves, bool))
    t_pack = time.perf_counter() - t0
    sizes = {
        "jsonl_mb": (out / "hierarchy.jsonl").stat().st_size / 1e6,
        "packed_mb": sum(f.stat().st_size for f in (out / "packed").iterdir()) / 1e6,
    }
    print(json.dumps({"save_jsonl_s": round(t_jsonl, 2),
                      "save_packed_s": round(t_pack, 2),
                      **{k: round(v, 1) for k, v in sizes.items()}}))


def measure_load(kind: str, out: Path, k: int = 100) -> None:
    """Runs in a fresh process: load, hydrate k spread leaves + parents."""
    import random

    def rss_mb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    rss_before = rss_mb()
    t0 = time.perf_counter()
    if kind == "jsonl":
        from tensortruth_tpu.index.nodes import HierarchyStore

        store = HierarchyStore.load(out / "hierarchy.jsonl")
    else:
        from tensortruth_tpu.index.packed import PackedHierarchyStore

        store = PackedHierarchyStore(out)
    t_load = time.perf_counter() - t0
    rss_loaded = rss_mb()

    n = len(store) * 8 // 9  # leaves
    random.seed(0)
    rows = random.sample(range(n), k)
    t0 = time.perf_counter()
    total = 0
    for r in rows:
        node = store.leaf_by_row(r)
        total += len(node.text)
        p = store.parent(node.node_id)
        total += len(p.child_ids)
    t_hydrate = (time.perf_counter() - t0) * 1e3
    print(json.dumps({
        "kind": kind, "load_s": round(t_load, 3),
        "hydrate_topk_ms": round(t_hydrate, 2),
        "rss_before_mb": round(rss_before, 1),
        "rss_after_load_mb": round(rss_loaded, 1),
        "rss_after_hydrate_mb": round(rss_mb(), 1),
        "checksum": total,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--load":
        measure_load(sys.argv[2], Path(sys.argv[3]))
        sys.exit(0)
    n_leaves = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out = Path("/tmp/store_scale")
    out.mkdir(parents=True, exist_ok=True)
    print(f"building {n_leaves:,}-leaf hierarchy …", file=sys.stderr)
    build_and_save(n_leaves, out)
    for kind in ("jsonl", "packed"):
        subprocess.run(
            [sys.executable, __file__, "--load", kind, str(out)], check=True
        )
