"""Fused matmul + top-k cosine-similarity retrieval kernels.

This is the TPU-native replacement for the reference's ChromaDB HNSW search
(reference rag_engine.py:628-637, builder.py:424-426). Instead of a C++ graph
index, the embedding matrix lives in HBM and every query batch runs one fused
scan: ``scores = Q @ E^T`` tiled onto the MXU with an in-VMEM candidate
reduction riding along, so the full (B, N) score matrix never touches HBM.

Design (cf. TPU-KNN "K Nearest Neighbor Search at Peak FLOP/s"):

* Grid over row-tiles of E. Per tile the kernel computes ``(B, TILE_N)``
  scores on the MXU, reduces each row to ``C = TILE_N/m`` strided bucket
  maxima (+ global row indices) with ``m`` unrolled VPU passes, and
  max-merges them into a (B, C_OUT) candidate accumulator living in the
  kernel's OUTPUT blocks — the (B, N) score matrix never exists anywhere.
  An exact ``lax.top_k`` over the C_OUT candidates finishes the job.
* A true top-k item is lost only when a strictly better item maps to the
  same accumulator slot: expected loss ≈ k(k-1)/(2·c_out) items.
* **Default m=1, c_out=tile_n=2048**: the accumulator is ONE VMEM-resident
  output block revisited by every grid step — fully static addressing, no
  block transitions. Measured on v5e at 1M×1024 bf16: **4.1 ms/32-query
  batch (488 GB/s ≈ 60% of HBM peak), recall@10 = 1.000,
  recall@100 = 0.980**. Variants measured and rejected: dynamic-slice VMEM
  scratch accumulator (10.8 ms — scalar-core dynamic addressing serializes
  the pipeline), multi-block rotation via the outer grid dim (10.7 ms —
  per-transition bubbles), aliased in/out candidate blocks (fast but TPU
  output blocks are write-only on revisit → wrong results). Raising
  ``c_out`` above ``tile_n/m`` re-enables block rotation for higher
  recall at large k, at the ~10.7 ms cost point.

``exact_topk`` is the XLA reference path (full score matrix + lax.top_k) used
for parity tests and as the small-N fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def exact_topk(
    q: jax.Array, emb: jax.Array, k: int, n_valid: jax.Array | int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Exact brute-force: full (B, N) score matrix, XLA top_k.

    q: (B, D) normalized queries; emb: (N, D) normalized corpus.
    ``n_valid`` (traced ok): rows ≥ n_valid are padding — masked to -inf
    BEFORE top_k so zero-pad rows (score 0) can never displace true
    negative-cosine rows. Returns (scores (B, k) f32, indices (B, k) i32).
    """
    scores = jax.lax.dot_general(
        q,
        emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


def _fused_kernel(
    *refs,
    tile_n: int,
    m: int,
    n_rot: int,
    n_actual: int,
    quantized: bool = False,
    dynamic_valid: bool = False,
):
    """One grid step: score a TILE_N row-tile of E, bucket-reduce, max-merge
    into this step's rotating candidate block.

    The candidate accumulator IS the output. Grid = (n_rot, inner): the
    OUTER dimension picks the candidate block, the INNER dimension streams
    the tiles assigned to it (tile = t·n_rot + b, strided so neighbouring
    corpus tiles land in different blocks). Consecutive inner steps revisit
    the SAME output block, which Mosaic keeps resident in VMEM — giving a
    legal read-modify-write accumulator with fully static addressing
    (measured 2.4× faster than a dynamic-slice VMEM scratch accumulator:
    the scalar-core dynamic addressing serialized the pipeline; and unlike
    non-consecutive output revisiting, resident blocks are readable).

    ``quantized`` (int8 corpus mode): the tile arrives int8 plus a
    (1, TILE_N) per-row scale input, and scores are rescaled column-wise —
    HBM traffic halves versus bf16 at ~0.3% score error.
    """
    refs = list(refs)
    q_ref = refs.pop(0)
    e_ref = refs.pop(0)
    scale_ref = refs.pop(0) if quantized else None
    nvalid_ref = refs.pop(0) if dynamic_valid else None
    vals_ref, idx_ref = refs
    c = tile_n // m  # candidates per tile
    block, t = pl.program_id(0), pl.program_id(1)
    tile_start = (t * n_rot + block) * tile_n

    @pl.when(t == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[:] = jnp.full_like(idx_ref, -1)

    # (B, TILE_N) scores on the MXU, f32 accumulation.
    e = e_ref[:]
    if scale_ref is not None:
        e = e.astype(q_ref.dtype)  # int8 tile → compute dtype in VMEM
    s = jax.lax.dot_general(
        q_ref[:],
        e,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale_ref is not None:
        s = s * scale_ref[:].astype(jnp.float32)  # (1, TILE_N) broadcast

    b = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, c), 1)

    # Strided bucket max+argmax: segment i covers columns [i*C, (i+1)*C);
    # bucket j = {j, j+C, ..., j+(m-1)C}. Unrolled m-pass VPU reduction.
    best_vals = jnp.full((b, c), NEG_INF, dtype=jnp.float32)
    best_idx = jnp.full((b, c), -1, dtype=jnp.int32)
    limit = nvalid_ref[0] if dynamic_valid else n_actual
    for i in range(m):
        seg = s[:, i * c : (i + 1) * c]
        gidx = tile_start + i * c + col
        seg = jnp.where(gidx < limit, seg, NEG_INF)  # mask padded rows
        take = seg > best_vals
        best_vals = jnp.where(take, seg, best_vals)
        best_idx = jnp.where(take, gidx, best_idx)

    # Same output block across all inner steps → resident in VMEM → RMW ok.
    take = best_vals > vals_ref[:]
    vals_ref[:] = jnp.where(take, best_vals, vals_ref[:])
    idx_ref[:] = jnp.where(take, best_idx, idx_ref[:])


@functools.partial(
    jax.jit, static_argnames=("k", "m", "tile_n", "c_out", "interpret", "n_actual")
)
def fused_topk(
    q: jax.Array,
    emb: jax.Array,
    k: int,
    m: int = 1,
    tile_n: int = 2048,
    c_out: int = 2048,
    interpret: bool | None = None,
    n_actual: int | None = None,
    n_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused matmul + bucketed top-k. Same signature/returns as exact_topk.

    ``m`` is the within-tile bucket size; ``tile_n`` the E-row tile per grid
    step; ``c_out`` the candidate-accumulator width (recall knob — expected
    top-k loss ≈ k²/(2·c_out)). q is (B, D); emb (N, D) — both L2-normalized,
    any float dtype (bf16 recommended on TPU). Mosaic requires the per-tile
    candidate count ``tile_n // m`` to be a lane multiple (128) and ``c_out``
    a multiple of it.

    ``n_actual`` is the STATIC valid-row count (compile-time). ``n_valid``
    is a TRACED i32 scalar overriding it — used under shard_map where each
    shard's valid-row count depends on ``axis_index`` and the kernel is
    traced once for all shards; the scalar rides in SMEM.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, d = q.shape
    n, d2 = emb.shape
    n_actual = n if n_actual is None else n_actual
    assert d == d2, (q.shape, emb.shape)
    assert tile_n % m == 0
    c = tile_n // m
    if c % 128 != 0:
        raise ValueError(
            f"tile_n//m must be a multiple of 128 lanes, got {tile_n}//{m}={c}"
        )
    c_out = max(c, min(c_out, -(-n_actual // tile_n) * c))  # ≤ N/m wide
    c_out = -(-c_out // c) * c  # multiple of c

    # Pad B to the sublane multiple; N to a tile multiple. NOTE: padding the
    # corpus here copies the WHOLE matrix inside the jit (2 GB at the 1M
    # tier ≈ +5 ms/call) — callers that can, pre-pad once at device
    # placement and pass ``n_actual`` (retrieval/engine.py does).
    b_pad = -(-b // 16) * 16
    n_pad = -(-n // tile_n) * tile_n
    if b_pad != b:
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        emb = jnp.pad(emb, ((0, n_pad - n), (0, 0)))

    num_tiles = n_pad // tile_n
    n_rot = c_out // c  # candidate blocks; block b accumulates tiles t·n_rot+b
    inner = -(-num_tiles // n_rot)
    tiles_padded = n_rot * inner
    if tiles_padded != num_tiles:  # round the grid up (masked via n_actual)
        emb = jnp.pad(emb, ((0, (tiles_padded - num_tiles) * tile_n), (0, 0)))

    kernel = functools.partial(
        _fused_kernel,
        tile_n=tile_n,
        m=m,
        n_rot=n_rot,
        n_actual=n_actual,
        dynamic_valid=n_valid is not None,
    )
    rot_spec = pl.BlockSpec(
        (b_pad, c), lambda b_, t: (0, b_), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((b_pad, d), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (tile_n, d), lambda b_, t: (t * n_rot + b_, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [q, emb]
    if n_valid is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(n_valid, jnp.int32).reshape(1))
    cand_vals, cand_idx = pl.pallas_call(
        kernel,
        grid=(n_rot, inner),
        in_specs=in_specs,
        out_specs=[rot_spec, rot_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)

    k_eff = min(k, n_actual, c_out)
    top_vals, top_pos = jax.lax.top_k(cand_vals, k_eff)
    top_idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
    if k_eff < k:  # fewer candidates than k: pad with -inf / -1
        top_vals = jnp.pad(top_vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        top_idx = jnp.pad(top_idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return top_vals[:b], top_idx[:b]


def pad_corpus_for_fused(emb, tile_n: int = 2048):
    """Pad an (N, D) host matrix to a tile multiple ONCE before device
    placement; pass the true N as ``n_actual`` to fused_topk."""
    import numpy as np

    n = emb.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    if n_pad == n:
        return emb, n
    pad = np.zeros((n_pad - n, emb.shape[1]), dtype=emb.dtype)
    return np.concatenate([emb, pad], axis=0), n


def quantize_corpus(emb) -> tuple:
    """Symmetric per-row int8 quantization: (emb_q (N,D) int8, scales (N,) f32).

    For L2-normalized rows the per-element error is ≤ 1/254 of the row max —
    measured recall@10 impact at 1M rows is ≈ 0 (see BASELINE.md).
    """
    import numpy as np

    emb = np.asarray(emb, dtype=np.float32)
    scales = np.abs(emb).max(axis=1) / 127.0
    scales = np.maximum(scales, 1e-12)
    emb_q = np.clip(np.rint(emb / scales[:, None]), -127, 127).astype(np.int8)
    return emb_q, scales.astype(np.float32)


def quantize_corpus_streaming(pieces, n_rows: int, dim: int, tile_n: int = 2048):
    """quantize_corpus + pad_corpus_for_fused without ever holding the f32
    corpus: pieces stream in (mmap shards at the capacity tier), the padded
    int8 output and scales are preallocated once. Peak host RAM = the int8
    corpus (¼ of f32) + one piece. Returns (emb_q (N_pad, D) int8,
    scales (N_pad,) f32, n_actual)."""
    import numpy as np

    n_pad = -(-n_rows // tile_n) * tile_n
    emb_q = np.zeros((n_pad, dim), np.int8)
    scales = np.zeros(n_pad, np.float32)
    row = 0
    for piece in pieces:
        piece = np.asarray(piece, dtype=np.float32)
        q, s = quantize_corpus(piece)
        emb_q[row : row + q.shape[0]] = q
        scales[row : row + q.shape[0]] = s
        row += q.shape[0]
    if row != n_rows:
        raise ValueError(f"pieces supplied {row} rows, expected {n_rows}")
    return emb_q, scales, n_rows


@functools.partial(
    jax.jit, static_argnames=("k", "m", "tile_n", "c_out", "interpret", "n_actual")
)
def fused_topk_int8(
    q: jax.Array,
    emb_q: jax.Array,
    scales: jax.Array,
    k: int,
    m: int = 1,
    tile_n: int = 2048,
    c_out: int = 2048,
    interpret: bool | None = None,
    n_actual: int | None = None,
    n_valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """fused_topk over an int8 corpus + per-row scales (see quantize_corpus).

    Same returns as exact_topk. HBM reads halve vs bf16; the int8→bf16
    convert rides the VPU while the MXU does the matmul. ``n_valid`` is the
    traced per-shard valid-row override (see fused_topk) so the int8 path
    also runs under shard_map on a mesh.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, d = q.shape
    n, d2 = emb_q.shape
    n_actual = n if n_actual is None else n_actual
    assert d == d2 and scales.shape == (n,)
    assert tile_n % m == 0
    c = tile_n // m
    if c % 128 != 0:
        raise ValueError(f"tile_n//m must be a multiple of 128, got {c}")
    c_out = max(c, min(c_out, -(-n_actual // tile_n) * c))
    c_out = -(-c_out // c) * c

    b_pad = -(-b // 16) * 16
    n_pad = -(-n // tile_n) * tile_n
    if b_pad != b:
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))
    if n_pad != n:
        emb_q = jnp.pad(emb_q, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, (0, n_pad - n))
    scales2d = scales.reshape(1, n_pad)

    num_tiles = n_pad // tile_n
    n_rot = c_out // c
    inner = -(-num_tiles // n_rot)
    tiles_padded = n_rot * inner
    if tiles_padded != num_tiles:
        emb_q = jnp.pad(emb_q, ((0, (tiles_padded - num_tiles) * tile_n), (0, 0)))
        scales2d = jnp.pad(scales2d, ((0, 0), (0, (tiles_padded - num_tiles) * tile_n)))
    kernel = functools.partial(
        _fused_kernel,
        tile_n=tile_n,
        m=m,
        n_rot=n_rot,
        n_actual=n_actual,
        quantized=True,
        dynamic_valid=n_valid is not None,
    )
    rot_spec = pl.BlockSpec(
        (b_pad, c), lambda b_, t: (0, b_), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((b_pad, d), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (tile_n, d), lambda b_, t: (t * n_rot + b_, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, tile_n), lambda b_, t: (0, t * n_rot + b_),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [q, emb_q, scales2d]
    if n_valid is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(n_valid, jnp.int32).reshape(1))
    cand_vals, cand_idx = pl.pallas_call(
        kernel,
        grid=(n_rot, inner),
        in_specs=in_specs,
        out_specs=[rot_spec, rot_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)

    k_eff = min(k, n_actual, c_out)
    top_vals, top_pos = jax.lax.top_k(cand_vals, k_eff)
    top_idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
    if k_eff < k:
        top_vals = jnp.pad(top_vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
        top_idx = jnp.pad(top_idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return top_vals[:b], top_idx[:b]


def topk_search(
    q: jax.Array,
    emb: jax.Array,
    k: int,
    *,
    exact: bool = False,
    m: int = 1,
    tile_n: int = 2048,
    n_actual: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch: exact path for tiny corpora / exact=True, fused otherwise."""
    n = emb.shape[0]
    n_actual = n if n_actual is None else n_actual
    if exact or n_actual <= 4096:
        k_eff = min(k, n_actual)
        vals, idx = exact_topk(q, emb[:n_actual] if n_actual < n else emb, k_eff)
        if k_eff < k:
            vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
            idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return vals, idx
    return fused_topk(q, emb, k, m=m, tile_n=tile_n, n_actual=n_actual)
