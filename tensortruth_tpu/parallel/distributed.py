"""Multi-process global-mesh retrieval: one jax program spanning slices.

The production shape of the multi-slice tier (SURVEY.md §2.14). The
coordinator-RPC transport (parallel/transport.py + slice_worker.py) routes
IVF cluster ranges to worker processes over hand-rolled sockets; it exists
because a single chip can't demonstrate anything else. On a real multi-slice
TPU pod the idiomatic deployment is the opposite: every host launches the
SAME program, ``jax.distributed.initialize`` forms one global runtime, the
corpus is row-sharded over a mesh spanning ALL slices, and the partial
top-k merge is a ``jax.lax.all_gather`` that XLA lowers onto ICI within a
slice and DCN across slices — no application-level sockets on the query
path at all, and the per-query DCN payload is the tiny (P·k) candidate set,
never raw scores.

This module is that path. It reuses ``sharded_topk`` unchanged (the kernel
and merge are mesh-agnostic); what it adds is the multi-process choreography:

* ``init_process``          — join the global runtime (DCN rendezvous).
* ``global_mesh``           — a mesh over ALL processes' devices.
* ``my_row_range``          — which global corpus rows this process owns.
* ``place_global_corpus``   — assemble the global row-sharded array from
                              per-process local blocks (each host loads only
                              its own shard files; nothing is gathered).
* ``GlobalMeshSearch``      — collective search: host 0 holds the real
                              query batch, ``broadcast_one_to_all`` ships it,
                              every process executes the same jit program,
                              identical (scores, global ids) come back on
                              every host.

Verified for real in ``tests/integration/test_jax_distributed.py``: two OS
processes × 4 virtual CPU devices form one 8-device mesh over Gloo TCP
collectives (the CPU stand-in for DCN) and the merged top-k matches a
single-process numpy brute force exactly.

Reference analog: none — the reference is single-process (SURVEY.md §2.14).
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensortruth_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from tensortruth_tpu.parallel.sharded_topk import sharded_topk

logger = logging.getLogger(__name__)


def init_process(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the global jax runtime (call once, before any jax computation).

    On TPU pods ``jax.distributed.initialize()`` needs no arguments (the
    pod metadata server supplies them) — pass them explicitly only for
    CPU/GPU clusters and tests. Backend note for CPU: virtual device count
    (``--xla_force_host_platform_device_count``) must already be in
    XLA_FLAGS before jax touches the backend, and cross-process collectives
    ride Gloo TCP (``jax_cpu_collectives_implementation`` defaults to gloo).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "joined global runtime: process %d/%d, %d local / %d global devices",
        process_id, num_processes,
        jax.local_device_count(), jax.device_count(),
    )


def global_mesh(n_data: int = 1) -> Mesh:
    """Mesh over ALL processes' devices (jax.devices() is global after
    ``init_process``). Device order groups by process, so the ``shards``
    axis gives each process a contiguous block of corpus rows."""
    return make_mesh(n_data=n_data, devices=jax.devices())


def _per_shard_rows(n_total: int, p: int, tile_n: int) -> int:
    per_shard = -(-n_total // p)
    if tile_n:
        per_shard = -(-per_shard // tile_n) * tile_n
    return per_shard


def my_row_range(
    mesh: Mesh, n_total: int, tile_n: int = 2048
) -> tuple[int, int, int]:
    """(start, stop, n_pad): the global corpus rows THIS process must load.

    The global padded matrix has ``n_pad = per_shard * P`` rows; this
    process's addressable devices own a contiguous row block (mesh device
    order groups by process). ``stop`` may exceed ``n_total`` — the pad
    tail is zero-filled by ``place_global_corpus``.
    """
    p = mesh.shape[SHARD_AXIS]
    per_shard = _per_shard_rows(n_total, p, tile_n)
    n_pad = per_shard * p
    sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
    dim_probe = 1  # row ranges don't depend on the column count
    idx_map = sharding.addressable_devices_indices_map((n_pad, dim_probe))
    starts = [s[0].start or 0 for s in idx_map.values()]
    stops = [s[0].stop if s[0].stop is not None else n_pad for s in idx_map.values()]
    return min(starts), max(stops), n_pad


def place_global_corpus(
    local_rows: np.ndarray,
    *,
    mesh: Mesh,
    n_total: int,
    dtype: str = "float32",
    tile_n: int = 2048,
) -> jax.Array:
    """Assemble the global row-sharded (n_pad, D) matrix.

    ``local_rows`` is exactly the ``[start, min(stop, n_total))`` block from
    ``my_row_range`` — the rows this host loaded from its own shard files.
    Zero-pads the tail process's block to the padded range. Every process
    calls this collectively; no host ever holds more than its own block.
    """
    start, stop, n_pad = my_row_range(mesh, n_total, tile_n)
    want = min(stop, n_total) - min(start, n_total)
    if local_rows.shape[0] != want:
        raise ValueError(
            f"process owns global rows [{start}, {stop}) of {n_total}: "
            f"expected {want} local rows, got {local_rows.shape[0]}"
        )
    dim = local_rows.shape[1]
    block = np.zeros((stop - start, dim), dtype=dtype)
    block[:want] = local_rows
    sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
    return jax.make_array_from_process_local_data(sharding, block, (n_pad, dim))


def place_global_corpus_int8(
    local_rows: np.ndarray,
    *,
    mesh: Mesh,
    n_total: int,
    tile_n: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """int8 variant: (emb_q (n_pad, D) int8, scales (n_pad,) f32), both
    row-sharded. Per-row symmetric scales (quantize_corpus discipline) are
    row-local, so each host quantizes its own block exactly — identical to
    the single-process ``shard_corpus_int8`` placement."""
    from tensortruth_tpu.ops.topk import quantize_corpus

    start, stop, n_pad = my_row_range(mesh, n_total, tile_n)
    want = min(stop, n_total) - min(start, n_total)
    if local_rows.shape[0] != want:
        raise ValueError(
            f"process owns global rows [{start}, {stop}) of {n_total}: "
            f"expected {want} local rows, got {local_rows.shape[0]}"
        )
    dim = local_rows.shape[1]
    block = np.zeros((stop - start, dim), np.float32)
    block[:want] = local_rows
    q, s = quantize_corpus(block)
    s[want:] = 0.0  # padding rows
    shard2 = NamedSharding(mesh, P(SHARD_AXIS, None))
    shard1 = NamedSharding(mesh, P(SHARD_AXIS))
    g = jax.make_array_from_process_local_data
    return g(shard2, q, (n_pad, dim)), g(shard1, s, (n_pad,))


def my_cluster_range(mesh: Mesh, n_clusters: int) -> tuple[int, int, int]:
    """(start, stop, nc_pad): the IVF clusters THIS process must load.

    Clusters pad to a multiple of the shard count; like ``my_row_range``
    the tail process's range may extend past ``n_clusters`` (zero-filled
    by ``place_global_ivf``).
    """
    p = mesh.shape[SHARD_AXIS]
    nc_pad = -(-n_clusters // p) * p
    sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
    idx_map = sharding.addressable_devices_indices_map((nc_pad, 1))
    starts = [s[0].start or 0 for s in idx_map.values()]
    stops = [s[0].stop if s[0].stop is not None else nc_pad for s in idx_map.values()]
    return min(starts), max(stops), nc_pad


def place_global_ivf(
    *,
    mesh: Mesh,
    n_clusters: int,
    n_actual: int,
    local_centroids: np.ndarray,
    local_blocks: np.ndarray,
    local_valid: np.ndarray,
    local_scales: np.ndarray | None = None,
    row_map: np.ndarray | None = None,
):
    """Assemble a cluster-sharded ``ShardedIVF`` across processes.

    Each host passes ONLY its ``my_cluster_range`` slice of the
    cluster-major arrays (its own partition files — the same per-range
    artifacts the coordinator-RPC tier persists via ``save_ivf_part``).
    ``row_map`` is host-side metadata for mapping candidate positions back
    to global rows: pass the full (n_clusters, rpc) table on hosts that
    hydrate results (int32, tens of MB even at 10M rows), None elsewhere
    (those hosts get -1 rows from ``ivf_search_sharded``).
    """
    from tensortruth_tpu.ops.ivf import ShardedIVF

    start, stop, nc_pad = my_cluster_range(mesh, n_clusters)
    want = min(stop, n_clusters) - min(start, n_clusters)
    if local_blocks.shape[0] != want:
        raise ValueError(
            f"process owns clusters [{start}, {stop}) of {n_clusters}: "
            f"expected {want} local clusters, got {local_blocks.shape[0]}"
        )
    rpc, dim = local_blocks.shape[1], local_blocks.shape[2]
    my_nc = stop - start

    cent = np.zeros((my_nc, dim), local_centroids.dtype)
    cent[:want] = local_centroids
    blocks = np.zeros((my_nc, rpc, dim), local_blocks.dtype)
    blocks[:want] = local_blocks
    valid = np.zeros((my_nc, rpc), np.int32)
    valid[:want] = local_valid

    shard2 = NamedSharding(mesh, P(SHARD_AXIS, None))
    shard3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
    g = jax.make_array_from_process_local_data
    scales_g = None
    if local_scales is not None:
        scales = np.ones((my_nc, rpc), np.float32)
        scales[:want] = local_scales
        scales_g = g(shard2, scales, (nc_pad, rpc))

    if row_map is not None:
        rm = np.full((nc_pad, rpc), -1, np.int32)
        rm[:n_clusters] = row_map
    else:
        rm = np.full((nc_pad, rpc), -1, np.int32)
    return ShardedIVF(
        centroids=g(shard2, cent, (nc_pad, dim)),
        blocks=g(shard3, blocks, (nc_pad, rpc, dim)),
        valid=g(shard2, valid, (nc_pad, rpc)),
        row_map=rm,
        n_actual=n_actual,
        n_clusters_actual=n_clusters,
        mesh=mesh,
        scales=scales_g,
    )


class GlobalMeshIVF:
    """Collective IVF search over the multi-process global mesh.

    The beyond-HBM tier in ONE program: cluster blocks shard over all
    slices' devices, every shard probes the top-nprobe of its own clusters
    (a superset of the global probe set — see ``ShardedIVF``), and the
    candidate merge all_gather rides ICI/DCN. Same SPMD discipline as
    ``GlobalMeshSearch``: the serving host passes the real batch, everyone
    else passes None + ``batch=``.
    """

    def __init__(self, sharded_ivf):
        self.sidx = sharded_ivf
        self.dim = sharded_ivf.blocks.shape[2]

    def search(
        self,
        q: np.ndarray | None,
        k: int,
        nprobe: int = 8,
        batch: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        from jax.experimental import multihost_utils

        from tensortruth_tpu.ops.ivf import ivf_search_sharded

        # is_source follows WHO HOLDS the real batch — the serving host may
        # be any process, not just process 0 (broadcast_one_to_all defaults
        # to process 0; with that default a non-0 serving host would have
        # its real queries silently replaced by host 0's zero dummy batch).
        is_source = q is not None
        if q is None:
            if batch is None:
                raise ValueError("non-serving processes must pass batch=")
            q = np.zeros((batch, self.dim), np.float32)
        q_global = multihost_utils.broadcast_one_to_all(
            np.asarray(q, np.float32), is_source=is_source
        )
        return ivf_search_sharded(self.sidx, q_global, k, nprobe=nprobe)


class GlobalMeshSearch:
    """Collective dense top-k over the multi-process global mesh.

    Every process constructs this with ITS local corpus block and then
    calls ``search`` in lockstep (the serving host passes the real query
    batch; others pass None). SPMD discipline — all processes execute the
    same program with the same global shapes — is exactly what a multi-host
    jit deployment requires; the host-side serving loop on process 0 is the
    only place requests enter.
    """

    def __init__(
        self,
        local_rows: np.ndarray,
        *,
        n_total: int,
        mesh: Mesh | None = None,
        dtype: str = "float32",
        use_fused: bool = False,
        tile_n: int = 2048,
    ):
        self.mesh = mesh if mesh is not None else global_mesh()
        self.n_total = n_total
        self.use_fused = use_fused
        self.tile_n = tile_n
        self.scales = None
        if dtype == "int8":
            self.emb, self.scales = place_global_corpus_int8(
                local_rows, mesh=self.mesh, n_total=n_total, tile_n=tile_n
            )
        else:
            self.emb = place_global_corpus(
                local_rows, mesh=self.mesh, n_total=n_total, dtype=dtype,
                tile_n=tile_n,
            )
        self.dim = self.emb.shape[1]

    def search(
        self, q: np.ndarray | None, k: int, batch: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(scores (B, k) f32, global ids (B, k) i32) on EVERY process.

        ``q`` is the (B, D) normalized query batch on the serving host and
        None elsewhere; ``batch`` (the static B every process must agree
        on) is required on non-serving processes. One broadcast ships the
        batch over DCN; the merge all_gather is the only other cross-host
        traffic.
        """
        from jax.experimental import multihost_utils

        # see GlobalMeshIVF.search: source the broadcast from whichever
        # process holds the real batch, not unconditionally process 0.
        is_source = q is not None
        if q is None:
            if batch is None:
                raise ValueError("non-serving processes must pass batch=")
            q = np.zeros((batch, self.dim), np.float32)
        q = np.asarray(q, np.float32)
        q_global = multihost_utils.broadcast_one_to_all(q, is_source=is_source)
        vals, idx = sharded_topk(
            q_global, self.emb, k=k, mesh=self.mesh, n_actual=self.n_total,
            use_fused=self.use_fused, tile_n=self.tile_n, scales=self.scales,
        )
        # outputs are replicated; pulling them local is a no-copy view of
        # the addressable replica
        return np.asarray(vals), np.asarray(idx)
