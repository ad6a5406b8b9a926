"""Multi-slice IVF: host-routed cluster groups for the 10M+ tier.

One v5e slice's HBM bounds the corpus a single mesh can hold (~8M bf16 /
16M int8 chunks at 1024-d on 8 chips after model weights). Beyond that,
the corpus splits by IVF cluster ranges across **slice groups** — each an
ICI-connected mesh holding its clusters via ops/ivf.ShardedIVF — and the
coordinator host routes each query batch to the groups that own its probed
clusters (SURVEY.md §2.14: "DCN only for multi-slice 10M-chunk tier with
IVF coarse routing host-side"; docs/SCALING.md).

Per query batch:

1. **Route (host):** score queries against the full centroid table — a
   (B, n_clusters) matmul, microseconds at B=32 × nc≤4096 — and take the
   global top-``nprobe`` clusters per query.
2. **Scatter (DCN boundary):** for each group owning ≥1 probed cluster,
   send the querying rows with ``nprobe_g`` = max probed-clusters-owned
   per query. Groups owning none are skipped entirely — at 4 groups and
   nprobe 16 a typical batch touches 2-3 groups.
3. **Probe (per group, ICI-parallel):** each group runs its sharded probe
   (ops/ivf.ivf_search_sharded) over its own clusters. A group's local
   top-``nprobe_g`` by definition contains every globally-probed cluster
   it owns (the centroid scores are identical), so routing loses nothing.
4. **Gather + merge (host):** per-group (scores, global row ids) merge by
   score into the final top-k — the same merge contract as
   parallel/sharded_topk, one level up.

Steps 2/4 ride a pluggable transport (parallel/transport.py): groups run
in-process by default (``LocalTransport``), or in separate worker
processes over a socket RPC (``SocketTransport`` + slice_worker.py) —
``attach_transport`` swaps a group to the remote path and drops the local
index so the data can only flow across the process boundary. Routing,
probing, and merge are identical either way.

Reference analog: none — the reference (rag_engine.py:368-527) fans out
threads over per-module Chroma indexes on one host. This is the TPU-native
scale-out story replacing it above one slice's capacity.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from tensortruth_tpu.ops.ivf import IVFIndex, ShardedIVF, ivf_search, ivf_search_sharded, shard_ivf

logger = logging.getLogger(__name__)


def partition_ivf(index: IVFIndex, n_groups: int) -> list[IVFIndex]:
    """Split an IVFIndex into ``n_groups`` contiguous cluster-range parts.

    The cluster-major packed layout makes this a pure slice: each part
    keeps its (clusters, rows_per_cluster, D) blocks and the ORIGINAL
    global row ids in row_map, so merged results need no id translation.
    Ranges are balanced by occupied rows (not cluster count) so skewed
    clusters don't concentrate HBM on one slice.
    """
    if n_groups < 1:
        raise ValueError("n_groups must be >= 1")
    nc = index.n_clusters
    if n_groups > nc:
        raise ValueError(f"n_groups={n_groups} exceeds n_clusters={nc}")
    occupancy = (index.row_map >= 0).sum(axis=1)  # rows per cluster
    target = occupancy.sum() / n_groups
    bounds = [0]
    acc = 0.0
    for c in range(nc):
        acc += float(occupancy[c])
        # close the current range once it reaches its fair share, keeping
        # enough clusters for the remaining groups
        if acc >= target * len(bounds) and nc - (c + 1) >= n_groups - len(bounds):
            bounds.append(c + 1)
            if len(bounds) == n_groups:
                break
    while len(bounds) < n_groups:
        bounds.append(min(nc - (n_groups - len(bounds)), bounds[-1] + 1))
    bounds.append(nc)

    # Slice device arrays directly — never round-trip the multi-GB block
    # tensor through the host; the cluster-major layout makes each part a
    # contiguous row range.
    parts = []
    for g in range(n_groups):
        lo, hi = bounds[g], bounds[g + 1]
        parts.append(
            IVFIndex(
                centroids=index.centroids[lo:hi],
                blocks=index.blocks[lo:hi],
                row_map=index.row_map[lo:hi],
                n_actual=index.n_actual,
                scales=index.scales[lo:hi] if index.scales is not None else None,
            )
        )
    logger.info(
        "partitioned IVF %d clusters into %d groups: %s rows each",
        nc, n_groups,
        [int((p.row_map >= 0).sum()) for p in parts],
    )
    return parts


@dataclass
class SliceGroup:
    """One slice group: a contiguous cluster range on its own mesh.

    ``search(q, k, nprobe)`` is the DCN RPC surface — in production it
    executes on the group's own process group; here it calls the local
    sharded (or single-device) probe directly.
    """

    group_id: int
    cluster_lo: int  # global id of this group's first cluster
    index: IVFIndex | ShardedIVF

    @property
    def n_clusters(self) -> int:
        if isinstance(self.index, ShardedIVF):
            return self.index.n_clusters_actual
        return self.index.n_clusters

    def search(self, q: np.ndarray, k: int, nprobe: int):
        nprobe = min(nprobe, self.n_clusters)
        if isinstance(self.index, ShardedIVF):
            return ivf_search_sharded(self.index, q, k=k, nprobe=nprobe)
        return ivf_search(self.index, q, k=k, nprobe=nprobe)


class MultiSliceIVF:
    """Host coordinator: full centroid table + routed slice groups."""

    def __init__(self, index: IVFIndex, n_groups: int, meshes=None):
        """``meshes``: optional per-group mesh list; a group with a mesh
        holds its clusters sharded (ShardedIVF), otherwise single-device.
        """
        self.centroids = np.asarray(index.centroids, np.float32)  # (nc, D)
        self.n_actual = index.n_actual
        parts = partition_ivf(index, n_groups)
        self.groups: list[SliceGroup] = []
        lo = 0
        for g, part in enumerate(parts):
            mesh = meshes[g] if meshes else None
            idx = shard_ivf(part, mesh) if mesh is not None else part
            self.groups.append(SliceGroup(group_id=g, cluster_lo=lo, index=idx))
            lo += part.n_clusters
        # cluster id -> owning group
        self._owner = np.concatenate(
            [np.full(p.n_clusters, g, np.int32) for g, p in enumerate(parts)]
        )
        # per-group cluster counts, kept for logging after attach_transport
        # drops the local index (groups[g].index becomes None)
        self._group_sizes = [p.n_clusters for p in parts]
        self.last_failed_groups: list[int] = []
        from tensortruth_tpu.parallel.transport import LocalTransport

        self.transports = [LocalTransport(g) for g in self.groups]

    def attach_transport(self, group_id: int, transport) -> None:
        """Route ``group_id`` through ``transport`` (e.g. a SocketTransport
        to a slice-worker process) and DROP the local index copy, so the
        group's data can only be reached across the transport boundary."""
        self.transports[group_id] = transport
        self.groups[group_id].index = None

    def save_part(self, group_id: int, path) -> None:
        """Persist one group's partition for a worker process."""
        from tensortruth_tpu.parallel.transport import save_ivf_part

        idx = self.groups[group_id].index
        if isinstance(idx, ShardedIVF):
            raise ValueError("save_part operates on unsharded group indexes")
        save_ivf_part(idx, path)

    def close(self) -> None:
        for t in self.transports:
            t.close()

    def search(
        self, q: np.ndarray, k: int, nprobe: int = 8
    ) -> tuple[np.ndarray, np.ndarray]:
        """Route → per-group probe → merge. Returns (scores, rows) (B, k)."""
        q = np.asarray(q, np.float32)
        b = q.shape[0]
        nprobe = min(nprobe, len(self._owner))
        cscores = q @ self.centroids.T  # (B, nc) host routing matmul
        probe = np.argpartition(-cscores, nprobe - 1, axis=1)[:, :nprobe]  # (B, nprobe)
        probe_groups = self._owner[probe]  # (B, nprobe)

        out_v = np.full((b, k), -np.inf, np.float32)
        out_r = np.full((b, k), -1, np.int64)
        merged_v: list[np.ndarray] = []
        merged_r: list[np.ndarray] = []
        merged_q: list[np.ndarray] = []
        touched = 0
        failed: list[tuple[int, Exception]] = []
        for grp in self.groups:
            hits = probe_groups == grp.group_id  # (B, nprobe)
            rows_mask = hits.any(axis=1)
            if not rows_mask.any():
                continue  # group owns no probed cluster for this batch
            touched += 1
            nprobe_g = int(hits.sum(axis=1).max())
            qsub = q[rows_mask]
            # DCN boundary: local call or socket RPC to the group's worker.
            # Per-group failure isolation (the reference isolates failing
            # retrievers the same way, rag_engine.py:453-455): a dead group
            # degrades recall for its clusters — loudly — instead of
            # failing the whole batch. Only if EVERY touched group fails
            # is the batch unanswerable.
            try:
                vals, rows = self.transports[grp.group_id].search(
                    qsub, k=k, nprobe=nprobe_g
                )
            except Exception as e:
                logger.error(
                    "slice group %d failed (%s) — batch continues without "
                    "its %d clusters",
                    grp.group_id, e, self._group_sizes[grp.group_id],
                )
                failed.append((grp.group_id, e))
                continue
            merged_v.append(np.asarray(vals, np.float32))
            merged_r.append(np.asarray(rows, np.int64))
            merged_q.append(np.flatnonzero(rows_mask))
        self.last_failed_groups = [g for g, _ in failed]
        if failed and not merged_v and touched:
            raise RuntimeError(
                f"all {touched} probed slice groups failed: "
                + "; ".join(f"group {g}: {e}" for g, e in failed)
            )
        logger.debug("multislice batch touched %d/%d groups", touched, len(self.groups))

        # Host merge, fully vectorized (no per-query Python — O(B·G·k) numpy
        # at serving batch sizes): scatter each group's k candidates into a
        # (B, G·k) slab, then ONE segment-wise top-k over the slab. A corpus
        # row lives in exactly one cluster (one group), so the only repeated
        # id is the -1 pad — masked to -inf so it sorts last.
        g_t = len(merged_v)
        if g_t:
            slab_v = np.full((b, g_t * k), -np.inf, np.float32)
            slab_r = np.full((b, g_t * k), -1, np.int64)
            for gi, (vals, rows, qidx) in enumerate(
                zip(merged_v, merged_r, merged_q)
            ):
                slab_v[qidx, gi * k : (gi + 1) * k] = np.where(
                    rows >= 0, vals, -np.inf
                )
                slab_r[qidx, gi * k : (gi + 1) * k] = rows
            if g_t > 1:
                part = np.argpartition(-slab_v, k - 1, axis=1)[:, :k]
            else:
                part = np.broadcast_to(np.arange(k), (b, k))
            pv = np.take_along_axis(slab_v, part, axis=1)
            order = np.argsort(-pv, axis=1, kind="stable")
            sel = np.take_along_axis(part, order, axis=1)
            out_v = np.take_along_axis(slab_v, sel, axis=1)
            out_r = np.take_along_axis(slab_r, sel, axis=1)
            out_r[~np.isfinite(out_v)] = -1  # -inf slots are padding
        return out_v, out_r
