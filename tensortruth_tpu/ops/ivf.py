"""IVF coarse partitioning for the 10M-chunk tier (BASELINE.json config 5).

At 10M × 1024 the corpus (20 GB bf16) exceeds one chip's HBM and a full
scan wastes bandwidth; the reference has no analog (Chroma HNSW caps out
far earlier). Design, XLA-friendly throughout (static shapes, no
data-dependent control flow):

* **Build (device k-means):** mini-batch Lloyd's on a row sample, then one
  full assignment pass. Clusters are laid out **cluster-major** into a
  padded (n_clusters, rows_per_cluster, D) tensor — every cluster padded
  to the same row budget so probing is a static-shape gather. A row_map
  carries padded positions → original row ids (-1 for padding).
* **Query:** (B, n_clusters) centroid scores on the MXU → top-nprobe
  cluster ids → gather those cluster blocks → one batched
  (B, nprobe·rows_per_cluster) score+top-k. Total FLOPs drop by
  ~n_clusters/nprobe vs a full scan.
* **Sharding:** cluster blocks round-robin over the ``shards`` mesh axis;
  each device probes its local clusters and the candidate merge reuses
  parallel/sharded_topk's all-gather pattern (multi-slice DCN tier:
  cluster groups per slice, host routes queries by centroid).

Recall: with nprobe/n_clusters = 8/128 on ~uniform data, measured
recall@10 ≥ 0.95 vs exact (test_ivf.py asserts ≥ 0.9 on random data —
clustered real text embeddings do better).
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)

NEG_INF = float("-inf")
PROBE_TILE = 1024  # rows of one cluster block scored per grid step


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _probe_kernel(*refs, quantized: bool = False):
    """Score one (query, probe, row-tile) cell: (1, D) @ (TILE, D)^T.

    ``probe_ref`` is scalar-prefetched, so Mosaic issues the DMA for the
    right cluster block before the step runs — no XLA gather materializes.
    ``quantized``: the block tile is int8 with a (1, TILE) per-row scale
    input — HBM traffic halves vs bf16 (the beyond-HBM capacity tier).
    """
    if quantized:
        probe_ref, q_ref, block_ref, scale_ref, valid_ref, out_ref = refs
    else:
        probe_ref, q_ref, block_ref, valid_ref, out_ref = refs
        scale_ref = None
    e = block_ref[0]  # (TILE, D)
    if scale_ref is not None:
        e = e.astype(q_ref.dtype)  # int8 → compute dtype in VMEM
    s = jax.lax.dot_general(
        q_ref[0],  # (1, D)
        e,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, TILE)
    if scale_ref is not None:
        s = s * scale_ref[0].astype(jnp.float32)
    out_ref[0, 0] = jnp.where(valid_ref[0] > 0, s, NEG_INF)  # (1, TILE)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _probe_scores(
    probe: jax.Array,  # (B, nprobe) int32 cluster ids
    q: jax.Array,  # (B, D)
    blocks: jax.Array,  # (n_clusters, rpc, D)
    valid: jax.Array,  # (n_clusters, rpc) int32
    scales: jax.Array | None = None,  # (n_clusters, rpc) f32 for int8 blocks
    interpret: bool | None = None,
) -> jax.Array:
    """(B, nprobe, rpc) scores via scalar-prefetch DMA of probed blocks."""
    if interpret is None:
        interpret = not _is_tpu()
    b, nprobe = probe.shape
    n_clusters, rpc, d = blocks.shape
    tile = next((t for t in (PROBE_TILE, 512, 256, 128) if rpc % t == 0), rpc)
    n_tiles = rpc // tile

    quantized = scales is not None
    # Mosaic block rule: the last two block dims must divide (8, 128) or
    # equal the array dims — hence the explicit singleton axes below.
    q_dtype = jnp.bfloat16 if quantized else blocks.dtype
    q3 = q.astype(q_dtype)[:, None, :]  # (B, 1, D)
    valid3 = valid[:, None, :]  # (n_clusters, 1, rpc)
    in_specs = [
        pl.BlockSpec((1, 1, d), lambda bi, pi, ti, probe: (bi, 0, 0)),
        pl.BlockSpec(
            (1, tile, d), lambda bi, pi, ti, probe: (probe[bi, pi], ti, 0)
        ),
    ]
    inputs = [probe, q3, blocks]
    if quantized:
        scales3 = scales[:, None, :]  # (n_clusters, 1, rpc)
        in_specs.append(
            pl.BlockSpec((1, 1, tile), lambda bi, pi, ti, probe: (probe[bi, pi], 0, ti))
        )
        inputs.append(scales3)
    in_specs.append(
        pl.BlockSpec((1, 1, tile), lambda bi, pi, ti, probe: (probe[bi, pi], 0, ti))
    )
    inputs.append(valid3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, 1, tile), lambda bi, pi, ti, probe: (bi, pi, 0, ti)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_probe_kernel, quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nprobe, 1, rpc), jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out[:, :, 0, :]


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans_fit(sample: jax.Array, seed: jax.Array, n_clusters: int, iters: int = 10):
    """Spherical k-means on normalized rows (cosine = dot)."""
    n = sample.shape[0]
    key = jax.random.PRNGKey(seed[0] if hasattr(seed, "shape") else 0)
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=False)
    centroids = sample[init_idx]

    def step(centroids, _):
        scores = sample @ centroids.T  # (n, k)
        assign = jnp.argmax(scores, axis=1)
        one_hot = jax.nn.one_hot(assign, n_clusters, dtype=sample.dtype)  # (n, k)
        sums = one_hot.T @ sample  # (k, D)
        counts = one_hot.sum(axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        return new / jnp.maximum(norm, 1e-9), None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


@dataclass
class IVFIndex:
    """Cluster-major packed corpus + centroids (host handles)."""

    centroids: jax.Array  # (n_clusters, D)
    blocks: jax.Array  # (n_clusters, rows_per_cluster, D)
    row_map: np.ndarray  # (n_clusters, rows_per_cluster) -> original row or -1
    n_actual: int
    scales: jax.Array | None = None  # (n_clusters, rpc) f32 when blocks are int8

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def rows_per_cluster(self) -> int:
        return self.blocks.shape[1]

    @property
    def padding_waste(self) -> float:
        """Fraction of block slots that are padding (HBM overhead of the
        static cluster-major layout)."""
        total = self.row_map.size
        return 1.0 - (self.row_map >= 0).sum() / total if total else 0.0


def build_ivf(
    emb: np.ndarray,
    n_clusters: int = 128,
    sample_size: int = 100_000,
    kmeans_iters: int = 10,
    seed: int = 0,
    overflow: float = 1.5,
    block_dtype=jnp.bfloat16,
    max_overflow: float = 4.0,
) -> IVFIndex:
    """Fit centroids on a sample, assign all rows, pack cluster-major.

    ``overflow`` pads rows_per_cluster to overflow × N/n_clusters; rows of
    over-full clusters spill into their next-best cluster (bounded by one
    spill round, then truncation with a warning). ``max_overflow`` hard-caps
    rows_per_cluster at max_overflow × N/n_clusters so skewed real-text
    clusters cannot multiply HBM: the padded layout's memory is
    n_clusters × rows_per_cluster × D regardless of occupancy. Padding waste
    is computed on the built index (``IVFIndex.padding_waste``) and logged.
    """
    n, d = emb.shape
    rng = np.random.default_rng(seed)
    sample = emb[rng.choice(n, min(sample_size, n), replace=False)].astype(np.float32)
    n_clusters = max(1, min(n_clusters, len(sample)))  # k-means needs k ≤ n
    centroids = np.asarray(
        _kmeans_fit(jnp.asarray(sample), jnp.asarray([seed]), n_clusters, kmeans_iters)
    )

    # Full assignment pass (chunked; on-device matmul at the multi-million
    # tier — the host path would take hours at 10M×1024 on one CPU core).
    assign = np.empty(n, np.int32)
    second = np.empty(n, np.int32)
    step = 262_144
    if n_clusters == 1:
        # top-2 selection below needs ≥2 columns; with one cluster every
        # row (and its spill target) is cluster 0
        assign[:] = 0
        second[:] = 0
    elif _is_tpu() and n * d > 2**28:
        @jax.jit
        def _top2(chunk, cent):
            s = jax.lax.dot_general(
                chunk, cent, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            _, idx = jax.lax.top_k(s, 2)
            return idx

        cent_dev = jnp.asarray(centroids, jnp.bfloat16)
        for s in range(0, n, step):
            idx2 = np.asarray(
                _top2(jnp.asarray(emb[s : s + step], jnp.bfloat16), cent_dev)
            )
            assign[s : s + step] = idx2[:, 0]
            second[s : s + step] = idx2[:, 1]
    else:
        for s in range(0, n, step):
            scores = emb[s : s + step].astype(np.float32) @ centroids.T
            part = np.argpartition(-scores, 1, axis=1)[:, :2]
            best_is_first = (
                scores[np.arange(len(part)), part[:, 0]]
                >= scores[np.arange(len(part)), part[:, 1]]
            )
            assign[s : s + step] = np.where(best_is_first, part[:, 0], part[:, 1])
            second[s : s + step] = np.where(best_is_first, part[:, 1], part[:, 0])

    mean_rows = n / n_clusters
    rows_per_cluster = int(np.ceil(mean_rows * overflow))
    # Size to the 95th-percentile cluster (up to the hard cap): every probe
    # pays nprobe × rows_per_cluster of HBM traffic, so sizing to the MAX
    # cluster made the whole scan ~28% slower for the benefit of the few
    # largest clusters (measured, BASELINE.md config 5). The tail spills to
    # second-best / capacity-aware slots instead — total capacity
    # n_clusters × rows_per_cluster ≥ n by construction, so no row is ever
    # dropped; spilled rows surface when their spill cluster is probed.
    counts = np.bincount(assign, minlength=n_clusters)
    rows_per_cluster = max(rows_per_cluster, int(np.percentile(counts, 95)))
    rows_per_cluster = min(rows_per_cluster, int(np.ceil(mean_rows * max_overflow)))
    # Lane-align for the MXU.
    rows_per_cluster = -(-rows_per_cluster // 128) * 128
    blocks = np.zeros((n_clusters, rows_per_cluster, d), emb.dtype)
    row_map = np.full((n_clusters, rows_per_cluster), -1, np.int64)

    def pack(rows: np.ndarray, cluster_of: np.ndarray, fill: np.ndarray):
        """Vectorized cluster-major packing; returns overflow row indices.

        Within-cluster slot = fill[c] + rank of the row among this call's
        rows for c (stable order). O(N log N), no Python per-row loop —
        10M rows pack in seconds.
        """
        order = np.argsort(cluster_of, kind="stable")
        rows_s, clus_s = rows[order], cluster_of[order]
        # rank within each cluster run
        boundary = np.r_[True, clus_s[1:] != clus_s[:-1]]
        run_start = np.maximum.accumulate(np.where(boundary, np.arange(len(clus_s)), 0))
        rank = np.arange(len(clus_s)) - run_start
        slot = fill[clus_s] + rank
        ok = slot < rows_per_cluster
        blocks[clus_s[ok], slot[ok]] = emb[rows_s[ok]]
        row_map[clus_s[ok], slot[ok]] = rows_s[ok]
        np.add.at(fill, clus_s[ok], 1)  # counts, capped by ok mask
        return rows_s[~ok]

    fill = np.zeros(n_clusters, np.int64)
    overflow_rows = pack(np.arange(n, dtype=np.int64), assign, fill)
    if len(overflow_rows):  # one spill round into second-best clusters
        leftover = pack(overflow_rows, second[overflow_rows], fill)
        if len(leftover):
            # Capacity-aware placement: each remaining row goes to its
            # best-scoring cluster that still has space. Under the
            # max_overflow cap no row is ever dropped (total capacity
            # n_clusters × rows_per_cluster ≥ n by construction); rows of a
            # giant blob land in nearby cells and higher nprobe recovers
            # them — a recall knob instead of silent data loss.
            logger.warning(
                "IVF spilling %d rows capacity-aware (skewed clusters; "
                "overflow=%.1f cap=%.1f)", len(leftover), overflow, max_overflow,
            )
            scores = emb[leftover] @ centroids.T  # (L, k)
            order = np.argsort(-scores, axis=1)
            free = rows_per_cluster - fill
            for row, prefs in zip(leftover, order):
                for c in prefs:
                    if free[c] > 0:
                        blocks[c, rows_per_cluster - free[c]] = emb[row]
                        row_map[c, rows_per_cluster - free[c]] = row
                        free[c] -= 1
                        break
    scales = None
    if block_dtype == jnp.int8:
        # Per-row symmetric quantization (ops/topk.py quantize_corpus
        # discipline): halves HBM per chunk again vs bf16 — the capacity
        # knob for the beyond-HBM tier. Padding rows get scale 1 (harmless:
        # their scores are masked by ``valid``).
        s = np.abs(blocks).max(axis=2) / 127.0  # (nc, rpc)
        s = np.where(s > 0, s, 1.0).astype(np.float32)
        blocks = np.clip(np.rint(blocks / s[:, :, None]), -127, 127).astype(np.int8)
        scales = jnp.asarray(s)
        blocks_dev = jnp.asarray(blocks)
        bytes_per = 1
    else:
        blocks_dev = jnp.asarray(blocks, dtype=block_dtype)
        bytes_per = 2
    index = IVFIndex(
        centroids=jnp.asarray(centroids),
        blocks=blocks_dev,
        row_map=row_map,
        n_actual=n,
        scales=scales,
    )
    logger.info(
        "IVF built: %d clusters × %d rows/cluster, %.1f%% padding waste "
        "(%.2f GB blocks at %s)",
        n_clusters, rows_per_cluster, 100 * index.padding_waste,
        blocks.size * bytes_per / 2**30, block_dtype,
    )
    return index


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_device(
    q: jax.Array,
    centroids: jax.Array,
    blocks: jax.Array,
    valid: jax.Array,
    k: int,
    nprobe: int,
    scales: jax.Array | None = None,
):
    """Device part: probe top-nprobe clusters per query, exact top-k inside.

    Returns (scores (B,k), padded positions (B,k) encoded as
    cluster*rows_per_cluster+slot). ``scales`` present = int8 blocks.
    """
    b = q.shape[0]
    n_clusters, rpc, d = blocks.shape
    cscores = jax.lax.dot_general(
        q, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    _, probe = jax.lax.top_k(cscores, nprobe)  # (B, nprobe)

    if _is_tpu():
        # Scalar-prefetch Pallas kernel: probed blocks DMA straight from
        # HBM to VMEM per (query, probe, tile) — no XLA gather ever
        # materializes a (B, ·, rpc, D) tensor.
        scores = _probe_scores(probe, q, blocks, valid.astype(jnp.int32), scales)
    else:
        # CPU/interpret fallback: one probe column at a time bounds peak
        # memory to a single (B, rpc, D) gather.
        compute_dtype = jnp.float32 if scales is not None else blocks.dtype

        def one_probe(p_col):
            gathered = blocks[p_col].astype(compute_dtype)  # (B, rpc, D)
            gvalid = valid[p_col]  # (B, rpc)
            s = jnp.einsum(
                "bd,brd->br", q.astype(compute_dtype), gathered,
                preferred_element_type=jnp.float32,
            )
            if scales is not None:
                s = s * scales[p_col]
            return jnp.where(gvalid, s, NEG_INF)

        scores = jax.lax.map(one_probe, probe.T).transpose(1, 0, 2)
    flat = scores.reshape(b, nprobe * rpc)
    pos = (probe[:, :, None] * rpc + jax.lax.broadcasted_iota(jnp.int32, (1, 1, rpc), 2)
           ).reshape(b, nprobe * rpc)
    k_eff = min(k, nprobe * rpc)
    top_v, top_i = jax.lax.top_k(flat, k_eff)
    return top_v, jnp.take_along_axis(pos, top_i, axis=1)


@dataclass
class ShardedIVF:
    """IVF with cluster blocks sharded over the mesh ``shards`` axis.

    Each device holds n_clusters/P cluster blocks in its HBM — the corpus
    capacity scales linearly with the shard count (the 10M+ tier,
    SURVEY.md §2.14). Every shard probes the top-``nprobe`` of its OWN
    clusters: any globally-top-nprobe cluster is by definition within the
    top-nprobe of its own shard, so the union covers a superset of the
    single-device probe set (recall ≥ single-device at equal per-device
    work); candidates merge over ICI exactly like parallel/sharded_topk.
    Multi-slice DCN story: slice groups own cluster ranges and the host
    routes query batches by centroid scores (docs/SCALING.md).
    """

    centroids: jax.Array  # (nc_pad, D) sharded over shards axis (dim 0)
    blocks: jax.Array  # (nc_pad, rpc, D) sharded over shards axis
    valid: jax.Array  # (nc_pad, rpc) int32, sharded; 0 = padding slot
    row_map: np.ndarray  # (nc_pad, rpc) host: padded pos -> original row, -1
    n_actual: int
    n_clusters_actual: int
    mesh: object
    scales: jax.Array | None = None  # (nc_pad, rpc) f32, sharded (int8 blocks)

    @property
    def rows_per_cluster(self) -> int:
        return self.blocks.shape[1]


def shard_ivf(index: IVFIndex, mesh) -> ShardedIVF:
    """Place an IVFIndex cluster-sharded on the mesh (pads clusters to P)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensortruth_tpu.parallel.mesh import SHARD_AXIS

    p = mesh.shape[SHARD_AXIS]
    nc = index.n_clusters
    rpc = index.rows_per_cluster
    nc_pad = -(-nc // p) * p
    blocks = np.asarray(index.blocks)
    centroids = np.asarray(index.centroids)
    row_map = index.row_map
    scales = np.asarray(index.scales) if index.scales is not None else None
    if nc_pad != nc:
        blocks = np.concatenate(
            [blocks, np.zeros((nc_pad - nc, rpc, blocks.shape[2]), blocks.dtype)]
        )
        centroids = np.concatenate(
            [centroids, np.zeros((nc_pad - nc, centroids.shape[1]), centroids.dtype)]
        )
        row_map = np.concatenate(
            [row_map, np.full((nc_pad - nc, rpc), -1, row_map.dtype)]
        )
        if scales is not None:
            scales = np.concatenate(
                [scales, np.ones((nc_pad - nc, rpc), scales.dtype)]
            )
    shard3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
    shard2 = NamedSharding(mesh, P(SHARD_AXIS, None))
    cent_dtype = jnp.bfloat16 if scales is not None else index.blocks.dtype
    return ShardedIVF(
        centroids=jax.device_put(jnp.asarray(centroids, cent_dtype), shard2),
        blocks=jax.device_put(jnp.asarray(blocks), shard3),
        valid=jax.device_put(jnp.asarray(row_map >= 0, jnp.int32), shard2),
        row_map=row_map,
        n_actual=index.n_actual,
        n_clusters_actual=nc,
        mesh=mesh,
        scales=jax.device_put(jnp.asarray(scales), shard2) if scales is not None else None,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "mesh", "n_clusters_actual")
)
def _ivf_search_sharded_device(
    q: jax.Array,
    centroids: jax.Array,
    blocks: jax.Array,
    valid: jax.Array,
    *,
    k: int,
    nprobe: int,
    mesh,
    n_clusters_actual: int,
    scales: jax.Array | None = None,
):
    """shard_map: per-shard local probe + top-k, candidates merged over ICI."""
    from jax.sharding import PartitionSpec as P
    from tensortruth_tpu.parallel.mesh import SHARD_AXIS

    p = mesh.shape[SHARD_AXIS]
    nc_pad, rpc, d = blocks.shape
    cpl = nc_pad // p  # clusters per shard
    np_l = min(nprobe, cpl)
    quantized = scales is not None

    def shard_fn(q_l, cent_l, blocks_l, valid_l, scales_l=None):
        shard = jax.lax.axis_index(SHARD_AXIS)
        cluster0 = shard * cpl
        cscores = jax.lax.dot_general(
            q_l, cent_l, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, cpl)
        cid = cluster0 + jax.lax.broadcasted_iota(jnp.int32, cscores.shape, 1)
        cscores = jnp.where(cid < n_clusters_actual, cscores, NEG_INF)
        _, probe = jax.lax.top_k(cscores, np_l)  # (B, np_l) local cluster ids

        if _is_tpu():
            scores = _probe_scores(probe, q_l, blocks_l, valid_l, scales_l)
        else:
            compute_dtype = jnp.float32 if quantized else blocks_l.dtype

            def one_probe(p_col):
                gathered = blocks_l[p_col].astype(compute_dtype)  # (B, rpc, D)
                gvalid = valid_l[p_col]
                s = jnp.einsum(
                    "bd,brd->br", q_l.astype(compute_dtype), gathered,
                    preferred_element_type=jnp.float32,
                )
                if quantized:
                    s = s * scales_l[p_col]
                return jnp.where(gvalid > 0, s, NEG_INF)

            scores = jax.lax.map(one_probe, probe.T).transpose(1, 0, 2)
        b = q_l.shape[0]
        flat = scores.reshape(b, np_l * rpc)
        pos = (
            (cluster0 + probe)[:, :, None] * rpc
            + jax.lax.broadcasted_iota(jnp.int32, (1, 1, rpc), 2)
        ).reshape(b, np_l * rpc)
        k_loc = min(k, np_l * rpc)
        top_v, top_i = jax.lax.top_k(flat, k_loc)
        top_p = jnp.take_along_axis(pos, top_i, axis=1)
        all_v = jax.lax.all_gather(top_v, SHARD_AXIS)  # (P, B, k_loc)
        all_p = jax.lax.all_gather(top_p, SHARD_AXIS)
        cand_v = all_v.transpose(1, 0, 2).reshape(b, p * k_loc)
        cand_p = all_p.transpose(1, 0, 2).reshape(b, p * k_loc)
        k_out = min(k, p * k_loc)
        out_v, oi = jax.lax.top_k(cand_v, k_out)
        out_p = jnp.take_along_axis(cand_p, oi, axis=1)
        if k_out < k:
            out_v = jnp.pad(out_v, ((0, 0), (0, k - k_out)), constant_values=NEG_INF)
            out_p = jnp.pad(out_p, ((0, 0), (0, k - k_out)), constant_values=-1)
        return out_v, out_p

    in_specs = [P(), P(SHARD_AXIS, None), P(SHARD_AXIS, None, None), P(SHARD_AXIS, None)]
    args = [q, centroids, blocks, valid]
    if quantized:
        in_specs.append(P(SHARD_AXIS, None))
        args.append(scales)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()),
        check_vma=False,  # post-all_gather reduction is replicated (as in sharded_topk)
    )
    return fn(*args)


def ivf_search_sharded(
    sidx: ShardedIVF, q: np.ndarray | jax.Array, k: int, nprobe: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Host wrapper for the sharded tier: same returns as ivf_search."""
    q_dtype = jnp.bfloat16 if sidx.scales is not None else sidx.blocks.dtype
    vals, pos = _ivf_search_sharded_device(
        jnp.asarray(q, dtype=q_dtype),
        sidx.centroids,
        sidx.blocks,
        sidx.valid,
        k=k,
        nprobe=nprobe,
        mesh=sidx.mesh,
        n_clusters_actual=sidx.n_clusters_actual,
        scales=sidx.scales,
    )
    vals, pos = np.asarray(vals), np.asarray(pos)
    rows = np.where(pos >= 0, sidx.row_map.reshape(-1)[pos], -1)
    rows = np.where(vals > NEG_INF, rows, -1)
    return vals, rows


def ivf_search(
    index: IVFIndex, q: np.ndarray | jax.Array, k: int, nprobe: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Host wrapper: (scores (B,k) f32, original row ids (B,k) i64, -1 pads)."""
    valid = jnp.asarray(index.row_map >= 0)
    # int8 blocks keep the query (and centroid scoring) in bf16.
    q_dtype = jnp.bfloat16 if index.scales is not None else index.blocks.dtype
    vals, pos = _ivf_search_device(
        jnp.asarray(q, dtype=q_dtype),
        index.centroids.astype(q_dtype),
        index.blocks,
        valid,
        k,
        min(nprobe, index.n_clusters),
        scales=index.scales,
    )
    vals, pos = np.asarray(vals), np.asarray(pos)
    rows = index.row_map.reshape(-1)[pos]
    rows = np.where(vals > NEG_INF, rows, -1)
    if vals.shape[1] < k:
        pad = k - vals.shape[1]
        vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
        rows = np.pad(rows, ((0, 0), (0, pad)), constant_values=-1)
    return vals, rows
