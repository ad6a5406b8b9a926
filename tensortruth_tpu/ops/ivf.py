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


@jax.jit
def _top2(chunk: jax.Array, cent: jax.Array) -> jax.Array:
    """Per-row best and second-best centroid (device matmul + top-2)."""
    s = jax.lax.dot_general(
        chunk, cent, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _, idx = jax.lax.top_k(s, 2)
    return idx


def _sample_rows(pieces_fn, n: int, d: int, rows: np.ndarray) -> np.ndarray:
    """Gather sorted global ``rows`` from row-contiguous pieces (one pass)."""
    out = np.empty((len(rows), d), np.float32)
    base = 0
    for piece in pieces_fn():
        piece = np.asarray(piece)
        lo = np.searchsorted(rows, base)
        hi = np.searchsorted(rows, base + piece.shape[0])
        if hi > lo:
            out[lo:hi] = piece[rows[lo:hi] - base]
        base += piece.shape[0]
    if base != n:
        raise RuntimeError(f"pieces supplied {base} rows, expected {n}")
    return out


def _assign_top2(pieces_fn, n: int, centroids: np.ndarray, step: int = 262_144):
    """Streaming assignment pass: (assign, second) int32 arrays of size n.

    Every chunk scores on the DEVICE (one (step, D) @ (D, K) matmul + top-2)
    — on a v5e this is MXU work measured in milliseconds per chunk, vs the
    minutes-per-pass a one-core host matmul costs at the 2M+ tier
    (VERDICT r3: the 664 s config-5 k-means contamination).

    The pass is H2D-bandwidth-bound, so chunks are cast to bf16 ON THE HOST
    before device_put (half the bytes on the wire — assignment only needs
    argmax top-2, and the corpus is served in bf16 anyway) and the tiny
    (step, 2) index result of chunk i is converted only after chunk i+1 has
    been dispatched, so the host cast + transfer of i+1 rides under the
    device compute of i.
    """
    assign = np.empty(n, np.int32)
    second = np.empty(n, np.int32)
    if _is_tpu():
        import ml_dtypes

        host_dtype, dev_dtype = ml_dtypes.bfloat16, jnp.bfloat16
    else:
        host_dtype, dev_dtype = np.float32, jnp.float32
    cent_dev = jnp.asarray(np.asarray(centroids, host_dtype))
    assert cent_dev.dtype == dev_dtype

    def chunks():
        base = 0
        for piece in pieces_fn():
            piece = np.asarray(piece)
            for s in range(0, piece.shape[0], step):
                chunk = piece[s : s + step]
                yield base + s, chunk
            base += piece.shape[0]

    pending = None  # (offset, length, in-flight device result)
    for off, chunk in chunks():
        idx2 = _top2(jnp.asarray(np.asarray(chunk, host_dtype)), cent_dev)
        if pending is not None:
            poff, plen, pidx = pending
            host = np.asarray(pidx)
            assign[poff : poff + plen] = host[:, 0]
            second[poff : poff + plen] = host[:, 1]
        pending = (off, chunk.shape[0], idx2)
    if pending is not None:
        poff, plen, pidx = pending
        host = np.asarray(pidx)
        assign[poff : poff + plen] = host[:, 0]
        second[poff : poff + plen] = host[:, 1]
    return assign, second


def _place_rows(
    assign: np.ndarray, second: np.ndarray, n_clusters: int, rows_per_cluster: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pure-integer slot assignment: (cluster, slot) per row, plus leftovers.

    Round 1 packs every row into its best cluster (stable order); overflow
    spills to the second-best; rows that overflow BOTH are returned for the
    capacity-aware round (they need vectors, which the fill pass collects).
    Returns (cluster (n,) i32 with -1 = leftover, slot (n,) i32,
    fill (n_clusters,) i64, leftover row indices sorted ascending).
    """
    n = len(assign)
    cluster = np.full(n, -1, np.int32)
    slot = np.zeros(n, np.int32)
    fill = np.zeros(n_clusters, np.int64)

    def pack(rows: np.ndarray, cluster_of: np.ndarray) -> np.ndarray:
        order = np.argsort(cluster_of, kind="stable")
        rows_s, clus_s = rows[order], cluster_of[order]
        boundary = np.r_[True, clus_s[1:] != clus_s[:-1]]
        run_start = np.maximum.accumulate(
            np.where(boundary, np.arange(len(clus_s)), 0)
        )
        rank = np.arange(len(clus_s)) - run_start
        slots = fill[clus_s] + rank
        ok = slots < rows_per_cluster
        cluster[rows_s[ok]] = clus_s[ok]
        slot[rows_s[ok]] = slots[ok]
        np.add.at(fill, clus_s[ok], 1)
        return rows_s[~ok]

    overflow_rows = pack(np.arange(n, dtype=np.int64), assign)
    leftover = np.array([], np.int64)
    if len(overflow_rows):  # one spill round into second-best clusters
        leftover = np.sort(pack(overflow_rows, second[overflow_rows]))
    return cluster, slot, fill, leftover


def _np_block_dtype(block_dtype):
    import ml_dtypes

    if block_dtype == jnp.int8:
        return np.int8
    if block_dtype == jnp.float32:
        return np.float32
    return ml_dtypes.bfloat16


def build_ivf(
    emb,
    n_clusters: int = 128,
    sample_size: int = 100_000,
    kmeans_iters: int = 10,
    seed: int = 0,
    overflow: float = 1.5,
    block_dtype=jnp.bfloat16,
    max_overflow: float = 4.0,
    n_rows: int | None = None,
    dim: int | None = None,
    device_blocks: bool = True,
) -> IVFIndex:
    """Fit centroids on a sample, assign all rows, pack cluster-major.

    ``emb`` is either an (N, D) float array or a ZERO-ARG CALLABLE returning
    an iterator of row-contiguous f32 pieces (``VectorIndex.
    iter_matrix_pieces`` over mmap shards) — the streaming path never
    materializes the f32 corpus on the host: pieces are read three times
    (sample, device assignment, block fill) and the only O(N) host
    allocations are the packed blocks IN THEIR STORAGE DTYPE (bf16 halves,
    int8 quarters the old f32 staging array) plus two int32 assignment
    vectors. Pass ``n_rows``/``dim`` with the callable form.

    ``overflow`` pads rows_per_cluster to overflow × N/n_clusters; rows of
    over-full clusters spill into their next-best cluster, then a bounded
    capacity-aware round. ``max_overflow`` hard-caps rows_per_cluster at
    max_overflow × N/n_clusters so skewed real-text clusters cannot multiply
    HBM: the padded layout's memory is n_clusters × rows_per_cluster × D
    regardless of occupancy. Padding waste is computed on the built index
    (``IVFIndex.padding_waste``) and logged.

    ``device_blocks=False`` keeps blocks/scales as host numpy — the mesh
    path hands them straight to ``shard_ivf`` and a single-device staging
    copy (which may not even fit one chip's HBM at the beyond-HBM tier)
    never happens.
    """
    if callable(emb):
        pieces_fn = emb
        if n_rows is None or dim is None:
            raise ValueError("streaming build_ivf needs n_rows and dim")
        n, d = n_rows, dim
    else:
        arr = np.asarray(emb)
        n, d = arr.shape

        def pieces_fn():
            return iter([arr])

    rng = np.random.default_rng(seed)
    n_sample = min(sample_size, n)
    sample_rows = np.sort(rng.choice(n, n_sample, replace=False))
    sample = _sample_rows(pieces_fn, n, d, sample_rows)
    n_clusters = max(1, min(n_clusters, n_sample))  # k-means needs k ≤ n
    centroids = np.asarray(
        _kmeans_fit(jnp.asarray(sample), jnp.asarray([seed]), n_clusters, kmeans_iters)
    )
    del sample

    if n_clusters == 1:
        # top-2 selection needs ≥2 columns; with one cluster every row
        # (and its spill target) is cluster 0
        assign = np.zeros(n, np.int32)
        second = np.zeros(n, np.int32)
    else:
        assign, second = _assign_top2(pieces_fn, n, centroids)

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

    cluster, slot, fill, leftover = _place_rows(
        assign, second, n_clusters, rows_per_cluster
    )
    del assign, second

    quantized = block_dtype == jnp.int8
    blocks = np.zeros((n_clusters, rows_per_cluster, d), _np_block_dtype(block_dtype))
    row_map = np.full((n_clusters, rows_per_cluster), -1, np.int64)
    # Padding rows get scale 1 (harmless: their scores are masked by valid).
    scales_np = np.ones((n_clusters, rows_per_cluster), np.float32) if quantized else None
    leftover_vecs = np.empty((len(leftover), d), np.float32)

    def write_rows(c: np.ndarray, s: np.ndarray, vecs: np.ndarray, gids: np.ndarray):
        """Convert (and for int8 quantize per-row) then write into blocks."""
        if quantized:
            sc = np.abs(vecs).max(axis=1) / 127.0
            sc = np.maximum(sc, 1e-12).astype(np.float32)
            blocks[c, s] = np.clip(np.rint(vecs / sc[:, None]), -127, 127).astype(np.int8)
            scales_np[c, s] = sc
        else:
            blocks[c, s] = vecs
        row_map[c, s] = gids

    if len(leftover):
        # Capacity-aware placement: each remaining row goes to its
        # best-scoring cluster that still has space. Under the max_overflow
        # cap no row is ever dropped (total capacity n_clusters ×
        # rows_per_cluster ≥ n by construction); rows of a giant blob land
        # in nearby cells and higher nprobe recovers them — a recall knob
        # instead of silent data loss.
        logger.warning(
            "IVF spilling %d rows capacity-aware (skewed clusters; "
            "overflow=%.1f cap=%.1f)", len(leftover), overflow, max_overflow,
        )
    base = 0
    for piece in pieces_fn():  # fill pass
        piece = np.asarray(piece, np.float32)
        gids = np.arange(base, base + piece.shape[0], dtype=np.int64)
        c = cluster[base : base + piece.shape[0]]
        placed = c >= 0
        write_rows(c[placed], slot[base : base + piece.shape[0]][placed],
                   piece[placed], gids[placed])
        lo = np.searchsorted(leftover, base)
        hi = np.searchsorted(leftover, base + piece.shape[0])
        if hi > lo:
            leftover_vecs[lo:hi] = piece[leftover[lo:hi] - base]
        base += piece.shape[0]
    del cluster, slot

    if len(leftover):
        scores = leftover_vecs @ centroids.T  # (L, k)
        prefs = np.argsort(-scores, axis=1)
        free = rows_per_cluster - fill
        lc = np.full(len(leftover), -1, np.int64)
        ls = np.full(len(leftover), -1, np.int64)
        for i, row_prefs in enumerate(prefs):
            for c in row_prefs:
                if free[c] > 0:
                    lc[i] = c
                    ls[i] = rows_per_cluster - free[c]
                    free[c] -= 1
                    break
        if (lc < 0).any():
            # Only reachable with a caller-forced overflow below the
            # ≥1.0 capacity invariant; writing the -1s would scatter rows
            # into blocks[-1] (a corrupt index), so refuse loudly.
            raise ValueError(
                f"IVF capacity exhausted: {int((lc < 0).sum())} of "
                f"{len(leftover)} spilled rows found no cluster with free "
                f"space (n_clusters * rows_per_cluster < n_rows; raise "
                f"overflow/max_overflow)"
            )
        write_rows(lc, ls, leftover_vecs, leftover)

    bytes_per = 1 if quantized else (4 if block_dtype == jnp.float32 else 2)
    if device_blocks:
        blocks_out = jnp.asarray(blocks) if quantized else jnp.asarray(
            blocks, dtype=block_dtype
        )
        scales_out = jnp.asarray(scales_np) if quantized else None
    else:
        blocks_out, scales_out = blocks, scales_np
    index = IVFIndex(
        centroids=jnp.asarray(centroids),
        blocks=blocks_out,
        row_map=row_map,
        n_actual=n,
        scales=scales_out,
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
