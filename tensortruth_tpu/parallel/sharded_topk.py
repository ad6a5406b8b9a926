"""Sharded dense retrieval: per-device partial top-k + ICI merge.

This is the TPU-native replacement for the reference's thread-pool fan-out +
host merge (reference rag_engine.py:420-461) and the scaling mechanism for
the 1M-chunk tier (BASELINE.json config 4, SURVEY.md §2.14):

* The (N, D) corpus matrix is row-sharded over the ``shards`` mesh axis —
  each device holds an (N/P, D) slice in HBM.
* Queries are replicated; each device runs the fused matmul+top-k kernel
  (ops/topk.py) over its slice, producing k *local* candidates per query.
* Local row indices are rebased to global ids (`shard * N/P + row`), then the
  (k scores, k ids) pairs `all_gather` over ICI — P*k candidates per query,
  a tiny transfer (P*k*(4+4) bytes) instead of the raw score matrix.
* One final `lax.top_k` over the gathered candidates yields the exact global
  top-k (exact because per-shard top-k over disjoint row sets loses nothing;
  with the fused kernel's bucketed pass the same ~1e-4 recall bound applies
  per shard, see ops/topk.py docstring).

Everything runs inside one `jax.shard_map`, so XLA schedules the matmuls and
the all-gather as a single program — no host round-trips between fan-out and
merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensortruth_tpu.ops.topk import exact_topk, fused_topk, fused_topk_int8
from tensortruth_tpu.parallel.mesh import SHARD_AXIS, row_sharded

NEG_INF = float("-inf")


def _per_shard_rows(n: int, p: int, tile_n: int | None) -> int:
    per_shard = -(-n // p)
    if tile_n:
        per_shard = -(-per_shard // tile_n) * tile_n
    return per_shard


def _shard_devices(mesh: Mesh, global_shape: tuple) -> list[list]:
    """Devices owning each row shard, in shard order.

    ``row_sharded`` replicates over the ``data`` axis, so one row range maps
    to several devices on a 2D mesh — each gets its own copy of the buffer.
    """
    sharding = row_sharded(mesh)
    per_shard = global_shape[0] // mesh.shape[SHARD_AXIS]
    groups: dict[int, list] = {}
    for dev, idx in sharding.addressable_devices_indices_map(global_shape).items():
        groups.setdefault((idx[0].start or 0) // per_shard, []).append(dev)
    return [groups[i] for i in range(len(groups))]


def _iter_shard_buffers(pieces, n: int, dim: int, per_shard: int, p: int, np_dtype):
    """Re-chunk row-contiguous f32 pieces into exactly-per_shard buffers.

    Yields (shard_index, (per_shard, dim) buffer in ``np_dtype``) — each
    buffer freshly allocated (the caller hands it to device_put and drops
    it), zero-padded past row ``n``. Peak host RAM is ONE shard buffer plus
    one incoming piece, never the full matrix.
    """
    buf = np.zeros((per_shard, dim), np_dtype)
    si = fill = total = 0
    for piece in pieces:
        piece = np.asarray(piece)
        off = 0
        while off < piece.shape[0]:
            take = min(per_shard - fill, piece.shape[0] - off)
            buf[fill : fill + take] = piece[off : off + take]
            fill += take
            off += take
            total += take
            if fill == per_shard:
                yield si, buf
                si += 1
                fill = 0
                buf = np.zeros((per_shard, dim), np_dtype)
    if total != n:
        raise RuntimeError(f"matrix pieces supplied {total} rows, expected {n}")
    while si < p:  # trailing all-padding shards
        yield si, buf
        si += 1
        fill = 0
        buf = np.zeros((per_shard, dim), np_dtype)


def shard_corpus_streaming(
    pieces,
    n: int,
    dim: int,
    mesh: Mesh,
    np_dtype=None,
    tile_n: int | None = None,
) -> tuple[jax.Array, int]:
    """Place an (n, dim) corpus row-sharded on the mesh FROM PIECES.

    ``pieces`` is an iterator of row-contiguous f32 arrays (e.g.
    ``VectorIndex.iter_matrix_pieces`` over mmap'd shards) — the full f32
    matrix is never materialized on the host: each mesh shard's buffer is
    filled (converting to ``np_dtype``, default bfloat16), placed on its
    devices, and dropped. Padded rows are zero vectors, masked to -inf
    inside the local top-k via the traced valid-row count (``sharded_topk``).
    Pass ``tile_n`` (the fused kernel's tile) so each shard's slice is
    tile-aligned here, once, and the fused path never copies in-jit
    (ops/topk.py note).
    """
    import ml_dtypes

    if np_dtype is None:
        np_dtype = ml_dtypes.bfloat16
    p = mesh.shape[SHARD_AXIS]
    per_shard = _per_shard_rows(n, p, tile_n)
    n_pad = per_shard * p
    global_shape = (n_pad, dim)
    devs = _shard_devices(mesh, global_shape)
    arrays = []
    for si, buf in _iter_shard_buffers(pieces, n, dim, per_shard, p, np_dtype):
        arrays.extend(jax.device_put(buf, d) for d in devs[si])
    sharded = jax.make_array_from_single_device_arrays(
        global_shape, row_sharded(mesh), arrays
    )
    return sharded, n


def shard_corpus(
    emb: np.ndarray, mesh: Mesh, tile_n: int | None = None
) -> tuple[jax.Array, int]:
    """Place an (N, D) matrix row-sharded on the mesh; pad N to the shard count.

    Array-in-hand wrapper over ``shard_corpus_streaming`` (one piece);
    keeps the input's dtype, zero-pads the tail (padding is masked via
    ``n_actual`` downstream, so the pad value is immaterial). Returns
    (device array with NamedSharding, original N).
    """
    return shard_corpus_streaming(
        iter([emb]), emb.shape[0], emb.shape[1], mesh,
        np_dtype=emb.dtype, tile_n=tile_n,
    )


def shard_corpus_int8_streaming(
    pieces, n: int, dim: int, mesh: Mesh, tile_n: int | None = None
) -> tuple[jax.Array, jax.Array, int]:
    """int8-quantize row-contiguous f32 pieces straight onto the mesh.

    Streaming analog of the old array-in-hand int8 placement: per-row
    symmetric scales (ops/topk.py quantize_corpus discipline) are exact
    piece-locally, so each mesh shard quantizes and places independently —
    the f32 corpus is never resident. Returns (emb_q (N_pad, D) int8
    row-sharded, scales (N_pad,) f32 sharded identically, original N).
    """
    from jax.sharding import NamedSharding

    p = mesh.shape[SHARD_AXIS]
    per_shard = _per_shard_rows(n, p, tile_n)
    n_pad = per_shard * p
    devs = _shard_devices(mesh, (n_pad, dim))
    scale_sharding = NamedSharding(mesh, P(SHARD_AXIS))
    scale_devs: dict[int, list] = {}
    for dev, idx in scale_sharding.addressable_devices_indices_map((n_pad,)).items():
        scale_devs.setdefault((idx[0].start or 0) // per_shard, []).append(dev)
    from tensortruth_tpu.ops.topk import quantize_corpus

    emb_arrays, scale_arrays = [], []
    for si, buf in _iter_shard_buffers(pieces, n, dim, per_shard, p, np.float32):
        q, s = quantize_corpus(buf)
        n_valid = int(np.clip(n - si * per_shard, 0, per_shard))
        s[n_valid:] = 0.0  # zero scales on padding rows (parity with the
        # array-in-hand path; padding is masked by n_valid downstream anyway)
        emb_arrays.extend(jax.device_put(q, d) for d in devs[si])
        scale_arrays.extend(jax.device_put(s, d) for d in scale_devs[si])
    emb_dev = jax.make_array_from_single_device_arrays(
        (n_pad, dim), row_sharded(mesh), emb_arrays
    )
    scales_dev = jax.make_array_from_single_device_arrays(
        (n_pad,), scale_sharding, scale_arrays
    )
    return emb_dev, scales_dev, n


def shard_corpus_int8(
    emb: np.ndarray, mesh: Mesh, tile_n: int | None = None
) -> tuple[jax.Array, jax.Array, int]:
    """Array-in-hand wrapper over ``shard_corpus_int8_streaming``."""
    return shard_corpus_int8_streaming(
        iter([np.asarray(emb, np.float32)]), emb.shape[0], emb.shape[1], mesh,
        tile_n=tile_n,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "mesh", "n_actual", "use_fused", "m", "tile_n", "q_sharded"),
)
def sharded_topk(
    q: jax.Array,
    emb: jax.Array,
    *,
    k: int,
    mesh: Mesh,
    n_actual: int,
    use_fused: bool = False,
    m: int = 1,
    tile_n: int = 2048,
    q_sharded: bool = False,
    scales: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded corpus.

    q: (B, D) normalized queries (replicated, or sharded over the ``data``
    axis when ``q_sharded`` — the 2D DP×shards layout where each data-slice
    of the query batch merges its own candidates and no query all-gather is
    needed); emb: (N_pad, D) row-sharded. Returns (scores (B, k) f32, global
    indices (B, k) i32); indices of padded rows never appear (masked to
    -inf / -1).

    ``scales``: (N_pad,) per-row int8 scales sharded like ``emb`` — the int8
    flat tier on a mesh (shard_corpus_int8). Fused path rescales inside the
    Pallas kernel; the exact path dequantizes the local slice in-registers.
    """
    from tensortruth_tpu.parallel.mesh import DATA_AXIS
    n_pad = emb.shape[0]
    p = mesh.shape[SHARD_AXIS]
    local_n = n_pad // p
    k_local = min(k, local_n)

    def shard_fn(q_l: jax.Array, emb_l: jax.Array, scales_l: jax.Array | None = None):
        shard = jax.lax.axis_index(SHARD_AXIS)
        offset = shard * local_n
        # Per-shard valid-row count (traced: depends on axis_index). Padding
        # rows are masked to -inf BEFORE the local top-k, so a zero-pad row
        # (cosine 0) can never displace a true negative-cosine row — the
        # merged global top-k is exact all the way into negative scores.
        n_valid_local = jnp.clip(n_actual - offset, 0, local_n).astype(jnp.int32)
        if scales_l is not None and use_fused:
            vals, idx = fused_topk_int8(
                q_l, emb_l, scales_l, k_local, m=m, tile_n=tile_n,
                n_valid=n_valid_local,
            )
        elif scales_l is not None:
            emb_deq = emb_l.astype(q_l.dtype) * scales_l[:, None].astype(q_l.dtype)
            vals, idx = exact_topk(q_l, emb_deq, k_local, n_valid=n_valid_local)
        elif use_fused:
            vals, idx = fused_topk(
                q_l, emb_l, k_local, m=m, tile_n=tile_n, n_valid=n_valid_local
            )
        else:
            vals, idx = exact_topk(q_l, emb_l, k_local, n_valid=n_valid_local)
        gidx = idx + offset
        # -1 = masked slot from the fused local top-k; gidx check covers the
        # exact path, where -inf-scored pad columns still carry their index.
        valid = (idx >= 0) & (gidx < n_actual)
        vals = jnp.where(valid, vals, NEG_INF)
        gidx = jnp.where(valid, gidx, -1)
        # (P, B, k_local) candidate gather over ICI — tiny vs the score matrix.
        all_vals = jax.lax.all_gather(vals, SHARD_AXIS)
        all_idx = jax.lax.all_gather(gidx, SHARD_AXIS)
        b = q_l.shape[0]
        cand_v = all_vals.transpose(1, 0, 2).reshape(b, p * k_local)
        cand_i = all_idx.transpose(1, 0, 2).reshape(b, p * k_local)
        k_out = min(k, p * k_local)
        top_v, pos = jax.lax.top_k(cand_v, k_out)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        if k_out < k:
            top_v = jnp.pad(top_v, ((0, 0), (0, k - k_out)), constant_values=NEG_INF)
            top_i = jnp.pad(top_i, ((0, 0), (0, k - k_out)), constant_values=-1)
        return top_v, top_i

    q_spec = P(DATA_AXIS) if q_sharded else P()
    in_specs = [q_spec, P(SHARD_AXIS, None)]
    args = [q, emb]
    if scales is not None:
        in_specs.append(P(SHARD_AXIS))
        args.append(scales)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(q_spec, q_spec),
        # Outputs ARE replicated over ``shards`` (identical post-all_gather
        # reduction on every shard) but VMA can't statically infer that
        # through top_k.
        check_vma=False,
    )
    return fn(*args)


def sharded_topk_search(
    q: np.ndarray | jax.Array,
    emb: jax.Array,
    k: int,
    mesh: Mesh,
    n_actual: int,
    **kw,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-friendly wrapper: numpy in, numpy out."""
    vals, idx = sharded_topk(
        jnp.asarray(q), emb, k=k, mesh=mesh, n_actual=n_actual, **kw
    )
    return np.asarray(vals), np.asarray(idx)
