"""Measure the multi-slice host-merge cost at serving batch sizes.

VERDICT r2 #8: the per-query Python merge was quadratic pain at B=256+.
The r3 merge is one vectorized segment-wise top-k over a (B, G*k) slab
(parallel/multislice.py); this script times JUST the coordinator's host
work (route + scatter bookkeeping + merge) with group searches stubbed to
precomputed arrays, isolating the overhead that rides on every 10M-tier
batch regardless of device speed.

Run: JAX_PLATFORMS=cpu python scripts/measure_multislice_merge.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tensortruth_tpu.ops.ivf import build_ivf
    from tensortruth_tpu.parallel.multislice import MultiSliceIVF

    rng = np.random.default_rng(0)
    n, d, groups = 20_000, 128, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = build_ivf(emb, n_clusters=64, sample_size=n, kmeans_iters=4)
    ms = MultiSliceIVF(index, n_groups=groups)

    # Stub every group search with an instant precomputed answer so the
    # timing isolates host-side routing + merge.
    k = 100
    for g in ms.groups:
        def fake(q, k_, nprobe, _g=g):
            b = q.shape[0]
            vals = rng.standard_normal((b, k_)).astype(np.float32)
            rows = rng.integers(0, n, (b, k_)).astype(np.int64)
            return np.sort(vals)[:, ::-1], rows
        g.search = fake

    out = {}
    for b in (32, 256, 1024):
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        ms.search(q, k=k, nprobe=16)  # warm
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            ms.search(q, k=k, nprobe=16)
        ms_t = (time.perf_counter() - t0) / iters * 1e3
        out[f"B={b}"] = round(ms_t, 3)
    print(json.dumps({
        "metric": "multislice_host_route_and_merge_ms",
        "groups": groups, "k": k, "nprobe": 16,
        "per_batch_ms": out,
    }))


if __name__ == "__main__":
    main()
