"""Measure the 10M-chunk tier on ONE v5e chip via the int8 flat scan.

BASELINE.json config 5 names 10M chunks as the multi-slice tier; int8
corpus quantization (ops/topk.py fused_topk_int8) halves HBM so a
10M×1024 corpus (10.24 GB int8 + 40 MB scales) fits a single v5e-1's
16 GB — full-recall exact scan, no IVF approximation, no second slice.
This measures that directly: B=32 queries, top-100, ms/batch and the
implied HBM bandwidth utilisation.

Synthetic int8 rows (uniform in [-127,127], unit scales) — the scan is
memory-bandwidth-bound, so timing is independent of row content. Host
RAM stays ~10 GB by generating int8 directly (a f32 10M×1024 source
would need 40 GB > this host's RAM).

Run (TPU, ~5 min incl. transfer): python scripts/bench_10m_int8.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.ops.topk import fused_topk_int8

N, D, B, K = 10_000_000, 1024, 32, 100
TILE = 2048


def main():
    rng = np.random.default_rng(0)
    n_pad = -(-N // TILE) * TILE
    t0 = time.perf_counter()
    emb_q = rng.integers(-127, 128, size=(n_pad, D), dtype=np.int8)
    gen_s = time.perf_counter() - t0
    scales = np.full(n_pad, 1.0 / 127.0, np.float32)

    t0 = time.perf_counter()
    emb_dev = jax.device_put(emb_q)
    scales_dev = jax.device_put(scales)
    jax.block_until_ready(emb_dev)
    put_s = time.perf_counter() - t0
    del emb_q

    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_dev = jnp.asarray(q, jnp.bfloat16)

    def run():
        return fused_topk_int8(q_dev, emb_dev, scales_dev, K, n_actual=N)

    vals, idx = run()
    np.asarray(vals[:1, :1])  # sync (compile + first run)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        vals, idx = run()
    np.asarray(vals[:1, :1])
    ms = (time.perf_counter() - t0) / iters * 1e3

    idx_h = np.asarray(idx)
    assert idx_h.max() < N and (idx_h >= 0).all()
    hbm_gb = n_pad * D / 1e9  # int8 bytes read per batch
    bw = hbm_gb / (ms / 1e3)
    print(json.dumps({
        "metric": "flat_scan_10M_int8_single_chip",
        "n_chunks": N, "batch": B, "k": K,
        "ms_per_batch": round(ms, 1),
        "scan_gb": round(hbm_gb, 2),
        "effective_gb_s": round(bw, 0),
        "host_gen_s": round(gen_s, 1),
        "h2d_s": round(put_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
