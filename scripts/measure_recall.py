"""Measure fused-kernel recall vs exact top-k on device at the 1M tier.

Validates the accumulator-collision bound documented in ops/topk.py
(expected top-k loss ≈ k(k-1)/(2·c_out)). Prints one JSON line; numbers are
recorded in BASELINE.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.ops.topk import exact_topk, fused_topk

N, D, B = 1_000_000, 1024, 32


def main():
    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (N, D), dtype=jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(7), (B, D), dtype=jnp.bfloat16)

    results = {}
    for k in (10, 100):
        ev, ei = exact_topk(q, corpus, k)
        fv, fi = fused_topk(q, corpus, k, m=16, tile_n=2048, c_out=8192)
        ei, fi = np.asarray(ei), np.asarray(fi)
        recall = float(
            np.mean([len(set(ei[b]) & set(fi[b])) / k for b in range(B)])
        )
        expected_loss = k * (k - 1) / (2 * 8192)
        results[f"recall@{k}"] = round(recall, 5)
        results[f"predicted@{k}"] = round(1 - expected_loss / k, 5)
    print(json.dumps({"n": N, "c_out": 8192, **results}))


if __name__ == "__main__":
    main()
