"""Fused matmul + top-k cosine-similarity retrieval kernels.

This is the TPU-native replacement for the reference's ChromaDB HNSW search
(reference rag_engine.py:628-637, builder.py:424-426). Instead of a C++ graph
index, the embedding matrix lives in HBM and every query batch runs one fused
scan: ``scores = Q @ E^T`` tiled onto the MXU with an in-VMEM candidate
reduction riding along, so the full (B, N) score matrix never touches HBM.

Design (cf. TPU-KNN "K Nearest Neighbor Search at Peak FLOP/s"):

* Grid over row-tiles of E. Per tile the kernel computes ``(B, TILE_N)``
  scores on the MXU, then reduces each row to ``TILE_N / m`` *strided
  bucket maxima* (+ their global row indices) with ``m`` unrolled VPU max
  passes — no reshape, no sort, O(TILE_N) work per row.
* Buckets are strided (bucket ``j`` holds columns ``{j, j+C, j+2C, …}``), so
  adjacent chunks of the same document — the common correlated-score case —
  land in *different* buckets, minimising top-k collisions.
* Per-tile bucket maxima are **max-merged into a fixed (B, C_OUT) candidate
  accumulator held in VMEM scratch** (tile i's C candidates land in the
  rotating slot slice ``[(i*C) % C_OUT, +C)``), written to HBM once in the
  final grid step — the host-visible output is O(C_OUT), independent of N,
  so the full (B, N) score matrix never exists anywhere.
* An exact ``jax.lax.top_k`` over the C_OUT candidates finishes the job.
  A true top-k item is lost only when a strictly better item maps to the
  same accumulator slot: expected loss ≈ k(k-1)/(2·C_OUT) items — for
  k=100, C_OUT=8192 that is ~0.6 of 100 (recall@100 ≈ 0.994); for k=10,
  ~0.005 (recall@10 ≈ 0.9995). Larger ``c_out`` → higher recall.

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


def exact_topk(q: jax.Array, emb: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact brute-force: full (B, N) score matrix, XLA top_k.

    q: (B, D) normalized queries; emb: (N, D) normalized corpus.
    Returns (scores (B, k) f32, indices (B, k) i32).
    """
    scores = jax.lax.dot_general(
        q,
        emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


def _fused_kernel(
    *refs,
    tile_n: int,
    m: int,
    n_rot: int,
    n_actual: int,
    quantized: bool = False,
):
    """One grid step: score a TILE_N row-tile of E, bucket-reduce, max-merge
    into this step's rotating candidate block.

    The candidate accumulator IS the output: tile ``i`` owns output block
    ``i % n_rot`` via the BlockSpec index map, so every per-step offset is
    static (measured 2.4× faster than a dynamic-slice VMEM scratch
    accumulator — the scalar-core dynamic addressing serialized the
    pipeline). Blocks are initialized on their first visit
    (``step < n_rot``).

    ``quantized`` (int8 corpus mode): the tile arrives int8 plus a
    (1, TILE_N) per-row scale input, and scores are rescaled column-wise —
    HBM traffic halves versus bf16 at ~0.3% score error.
    """
    if quantized:
        q_ref, e_ref, scale_ref, vals_ref, idx_ref = refs
    else:
        q_ref, e_ref, vals_ref, idx_ref = refs
        scale_ref = None
    c = tile_n // m  # candidates per tile
    step = pl.program_id(0)
    tile_start = step * tile_n

    @pl.when(step < n_rot)
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
    for i in range(m):
        seg = s[:, i * c : (i + 1) * c]
        gidx = tile_start + i * c + col
        seg = jnp.where(gidx < n_actual, seg, NEG_INF)  # mask padded rows
        take = seg > best_vals
        best_vals = jnp.where(take, seg, best_vals)
        best_idx = jnp.where(take, gidx, best_idx)

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
    m: int = 16,
    tile_n: int = 2048,
    c_out: int = 8192,
    interpret: bool | None = None,
    n_actual: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused matmul + bucketed top-k. Same signature/returns as exact_topk.

    ``m`` is the within-tile bucket size; ``tile_n`` the E-row tile per grid
    step; ``c_out`` the candidate-accumulator width (recall knob — expected
    top-k loss ≈ k²/(2·c_out)). q is (B, D); emb (N, D) — both L2-normalized,
    any float dtype (bf16 recommended on TPU). Mosaic requires the per-tile
    candidate count ``tile_n // m`` to be a lane multiple (128) and ``c_out``
    a multiple of it.
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
    n_rot = c_out // c  # candidate blocks; tile i owns block i % n_rot

    kernel = functools.partial(
        _fused_kernel,
        tile_n=tile_n,
        m=m,
        n_rot=n_rot,
        n_actual=n_actual,
    )
    cand_vals, cand_idx = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, c), lambda i: (0, i % n_rot), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, c), lambda i: (0, i % n_rot), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.int32),
        ],
        interpret=interpret,
    )(q, emb)

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


@functools.partial(
    jax.jit, static_argnames=("k", "m", "tile_n", "c_out", "interpret", "n_actual")
)
def fused_topk_int8(
    q: jax.Array,
    emb_q: jax.Array,
    scales: jax.Array,
    k: int,
    m: int = 16,
    tile_n: int = 2048,
    c_out: int = 8192,
    interpret: bool | None = None,
    n_actual: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """fused_topk over an int8 corpus + per-row scales (see quantize_corpus).

    Same returns as exact_topk. HBM reads halve vs bf16; the int8→bf16
    convert rides the VPU while the MXU does the matmul.
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
    kernel = functools.partial(
        _fused_kernel,
        tile_n=tile_n,
        m=m,
        n_rot=n_rot,
        n_actual=n_actual,
        quantized=True,
    )
    cand_vals, cand_idx = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, c), lambda i: (0, i % n_rot), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, c), lambda i: (0, i % n_rot), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, c_out), jnp.int32),
        ],
        interpret=interpret,
    )(q, emb_q, scales2d)

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
    m: int = 16,
    tile_n: int = 2048,
    n_actual: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch: exact path for tiny corpora / exact=True, fused otherwise."""
    n = emb.shape[0]
    n_actual = n if n_actual is None else n_actual
    if exact or n_actual <= 4096 or m == 1:
        k_eff = min(k, n_actual)
        vals, idx = exact_topk(q, emb[:n_actual] if n_actual < n else emb, k_eff)
        if k_eff < k:
            vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=NEG_INF)
            idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
        return vals, idx
    return fused_topk(q, emb, k, m=m, tile_n=tile_n, n_actual=n_actual)
