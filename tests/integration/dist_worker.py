"""Worker for test_jax_distributed.py — one process of the global mesh.

Usage: python dist_worker.py <coordinator> <num_processes> <process_id>
       <result_json_path>

Each process seeds the SAME rng, so process 0 can brute-force the full
corpus for the parity check while every process only PLACES its own block
(the deployment contract: hosts load disjoint shard files).
"""

import json
import os
import sys

COORD, NPROC, PID, OUT = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tensortruth_tpu.parallel.distributed import (  # noqa: E402
    GlobalMeshIVF,
    GlobalMeshSearch,
    global_mesh,
    init_process,
    my_cluster_range,
    my_row_range,
    place_global_ivf,
)

N, D, K, B = 1000, 64, 10, 5
TILE = 64  # small shapes: don't pad each shard to 2048 rows

init_process(COORD, NPROC, PID)
assert jax.device_count() == 4 * NPROC, jax.device_count()
mesh = global_mesh()

rng = np.random.default_rng(7)
corpus = rng.standard_normal((N, D)).astype(np.float32)
corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)

start, stop, n_pad = my_row_range(mesh, N, tile_n=TILE)
local = corpus[start:min(stop, N)]

engine = GlobalMeshSearch(local, n_total=N, mesh=mesh, tile_n=TILE)

qrng = np.random.default_rng(11)
q = qrng.standard_normal((B, D)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)

if PID == 0:
    scores, ids = engine.search(q, K)
else:
    # non-serving hosts run the same collective with a dummy batch
    scores, ids = engine.search(None, K, batch=B)

report = {"pid": PID, "start": start, "stop": stop, "n_pad": n_pad}
# exact parity vs numpy brute force (f32 corpus, exact path — identical ids)
ref = q @ corpus.T
ref_ids = np.argsort(-ref, axis=1)[:, :K]
ref_scores = np.take_along_axis(ref, ref_ids, axis=1)
report["ids_match"] = bool((ids == ref_ids).all())
report["scores_max_err"] = float(np.abs(scores - ref_scores).max())

# --- serving host OTHER than process 0 -------------------------------
# The broadcast must source from whichever process holds the real batch
# (GlobalMeshSearch.search sets is_source=q is not None); with the
# process-0 default, a non-0 serving host would silently search host 0's
# zero dummy batch. q2 is derived deterministically on every host, but
# only the LAST process passes it — everyone else broadcasts-in.
q2 = qrng.standard_normal((B, D)).astype(np.float32)
q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
if PID == NPROC - 1:
    s2, i2 = engine.search(q2, K)
else:
    s2, i2 = engine.search(None, K, batch=B)
ref2 = q2 @ corpus.T
ref2_ids = np.argsort(-ref2, axis=1)[:, :K]
report["alt_source_ids_match"] = bool((i2 == ref2_ids).all())

# --- int8 flat tier on the same global mesh -------------------------
# Quantization is row-local, so each host quantizes only its block; int8
# ids should overlap f32 heavily and MUST be identical on both hosts
# (same program, replicated outputs).
engine8 = GlobalMeshSearch(local, n_total=N, mesh=mesh, tile_n=TILE,
                           dtype="int8")
if PID == 0:
    s8, i8 = engine8.search(q, K)
else:
    s8, i8 = engine8.search(None, K, batch=B)
overlap = np.mean([
    len(set(i8[b_].tolist()) & set(ref_ids[b_].tolist())) / K
    for b_ in range(B)
])
report["int8_overlap_vs_f32"] = float(overlap)
report["int8_ids_sha"] = __import__("hashlib").sha1(
    np.ascontiguousarray(i8).tobytes()
).hexdigest()

# --- IVF tier on the same global mesh -------------------------------
# Both processes deterministically build the SAME index (same data, same
# seed, local jit), then each places only ITS cluster range — the
# per-range artifact contract of save_ivf_part. nprobe = n_clusters makes
# the probe exhaustive, so results must equal brute force exactly.
import jax.numpy as jnp  # noqa: E402

from tensortruth_tpu.ops.ivf import build_ivf  # noqa: E402

NCL = 16
idx = build_ivf(
    corpus, n_clusters=NCL, sample_size=N, kmeans_iters=4, seed=3,
    block_dtype=jnp.float32,
)
c0, c1, nc_pad = my_cluster_range(mesh, NCL)
blocks_h = np.asarray(idx.blocks)
cent_h = np.asarray(idx.centroids)
valid_h = (idx.row_map >= 0).astype(np.int32)
lo, hi = min(c0, NCL), min(c1, NCL)
sidx = place_global_ivf(
    mesh=mesh, n_clusters=NCL, n_actual=N,
    local_centroids=cent_h[lo:hi],
    local_blocks=blocks_h[lo:hi],
    local_valid=valid_h[lo:hi],
    row_map=idx.row_map,
)
ivf_engine = GlobalMeshIVF(sidx)
if PID == 0:
    iv, ir = ivf_engine.search(q, K, nprobe=NCL)
else:
    iv, ir = ivf_engine.search(None, K, nprobe=NCL, batch=B)
report["ivf_cluster_range"] = [c0, c1, nc_pad]
report["ivf_ids_match"] = bool((ir == ref_ids).all())
report["ivf_scores_max_err"] = float(np.abs(iv - ref_scores).max())

report["ok"] = (
    report["ids_match"]
    and report["alt_source_ids_match"]
    and report["scores_max_err"] < 1e-5
    and report["ivf_ids_match"]
    and report["ivf_scores_max_err"] < 1e-4
    and report["int8_overlap_vs_f32"] >= 0.8
)

with open(OUT, "w") as f:
    json.dump(report, f)
print(f"[p{PID}] {report}", flush=True)
sys.exit(0 if report["ok"] else 1)
