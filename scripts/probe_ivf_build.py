"""Stage-level timing of build_ivf at the config-5 shape (2M x 1024, 512
clusters) — diagnoses the r3 664 s build (VERDICT r3 item 3) and records the
post-streaming-refactor build cost per stage.

Run on the real TPU:  python scripts/probe_ivf_build.py [n_rows]
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

from tensortruth_tpu.ops import ivf as ivf_mod

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
D, NC, SAMPLE, ITERS = 1024, 512, 100_000, 8

t = {}


def stage(name):
    def deco(fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name}: {t[name]}s", file=sys.stderr, flush=True)
        return out

    return deco


rng = np.random.default_rng(5)


@stage("corpus_gen_host")
def emb():
    # f32 generation (no f64 intermediate): the corpus is probe input, not a
    # measured build stage — first run cost 557 s via standard_normal-f64
    x = rng.standard_normal((N, D), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


@stage("sample_gather")
def sample():
    rows = np.sort(np.random.default_rng(0).choice(N, SAMPLE, replace=False))
    return ivf_mod._sample_rows(lambda: iter([emb]), N, D, rows)


@stage("kmeans_fit_device")
def centroids():
    return np.asarray(
        ivf_mod._kmeans_fit(jnp.asarray(sample), jnp.asarray([0]), NC, ITERS)
    )


@stage("assign_top2_device")
def assign_second():
    return ivf_mod._assign_top2(lambda: iter([emb]), N, centroids)


@stage("place_rows_host")
def placed():
    a, s = assign_second
    counts = np.bincount(a, minlength=NC)
    rpc = max(int(np.ceil(N / NC * 1.5)), int(np.percentile(counts, 95)))
    rpc = -(-min(rpc, int(np.ceil(N / NC * 4.0))) // 128) * 128
    return ivf_mod._place_rows(a, s, NC, rpc), rpc


@stage("full_build")
def index():
    return ivf_mod.build_ivf(
        emb, n_clusters=NC, sample_size=SAMPLE, kmeans_iters=ITERS, seed=0
    )


print(json.dumps({
    "n_rows": N, "n_clusters": NC, "backend": jax.default_backend(),
    "stages_s": t,
    "rows_per_cluster": index.rows_per_cluster,
    "padding_waste": round(index.padding_waste, 3),
}))
