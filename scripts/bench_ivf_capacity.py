"""Beyond-HBM capacity tier: max-that-fits int8 IVF on one chip.

BASELINE.json config 5 at real capacity: N rows of 1024-d at int8 cluster
blocks (1 byte/dim + f32 per-row scale). bf16 flat-scan capacity on a 16GB
v5e is ~6-7M rows; int8 IVF roughly doubles it. Measures probe latency at
B=32 across nprobe and probe-recall@10 vs the (near-exact) all-cluster
ground truth on held-out near-duplicate queries.
"""

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

from tensortruth_tpu.ops.ivf import build_ivf, ivf_search

N = int(os.environ.get("IVF_BENCH_N", 8_000_000))
D = 1024
N_CLUSTERS = 4096
BATCH = 32
K = 100


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    print(f"generating {N}x{D} corpus on device (host RNG is ~8M samples/s)...", flush=True)
    emb = np.empty((N, D), np.float16)
    step = 1_000_000
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen(k):
        chunk = jax.random.normal(k, (step, D), jnp.float32)
        chunk = chunk / jnp.linalg.norm(chunk, axis=1, keepdims=True)
        return chunk.astype(jnp.float16)

    for s in range(0, N, step):
        chunk = np.asarray(gen(jax.random.fold_in(key, s)))
        emb[s : s + step] = chunk[: min(step, N - s)]
        print(f"  {s + step:>9d} rows", flush=True)

    t0 = time.time()
    ivf = build_ivf(
        emb, n_clusters=N_CLUSTERS, sample_size=100_000,
        overflow=1.2, block_dtype=jnp.int8,
    )
    jax.block_until_ready(ivf.blocks)
    gb = ivf.blocks.size / 2**30
    print(
        f"built int8 IVF in {time.time()-t0:.0f}s: {ivf.n_clusters} clusters x "
        f"{ivf.rows_per_cluster} rows, blocks {gb:.1f} GB on device, "
        f"padding waste {100*ivf.padding_waste:.1f}%", flush=True,
    )

    # near-duplicate queries (harder than random)
    qrows = rng.choice(N, BATCH, replace=False)
    q = emb[qrows].astype(np.float32)
    q += 0.05 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # ground truth on host (f32 chunked matmul, 8 queries to bound time)
    gt_n = 8
    print("computing host ground truth...", flush=True)
    scores = np.empty((gt_n, N), np.float32)
    for s in range(0, N, step):
        scores[:, s : s + step] = q[:gt_n] @ emb[s : s + step].astype(np.float32).T
    gt = np.argsort(-scores, axis=1)[:, :10]

    for nprobe in (8, 16, 32):
        vals, rows = ivf_search(ivf, q, K, nprobe=nprobe)  # warm/compile
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            vals, rows = ivf_search(ivf, q, K, nprobe=nprobe)
        dt = (time.perf_counter() - t0) / iters * 1e3
        recall = np.mean([
            len(set(rows[i][:10].tolist()) & set(gt[i].tolist())) / 10
            for i in range(gt_n)
        ])
        print(
            f"nprobe={nprobe:3d}: {dt:7.1f} ms/batch({BATCH}) "
            f"{BATCH/(dt/1e3):7.0f} QPS  recall@10={recall:.3f}", flush=True,
        )


if __name__ == "__main__":
    main()
