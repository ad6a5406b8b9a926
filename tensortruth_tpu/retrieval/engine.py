"""MultiIndexEngine: the TPU-native multi-index retrieval core.

Replaces the reference's ``MultiIndexRetriever`` + per-index
``AutoMergingRetriever`` stack (reference rag_engine.py:368-527,608-690).
Where the reference fans out N Chroma HNSW searches over a thread pool and
concatenates on the host, here all loaded module matrices are **stacked into
one row-sharded device matrix** with per-module row ranges, so a query batch
is ONE fused matmul+top-k dispatch regardless of how many indexes are loaded
— the "fan-out + merge" is the kernel's own tiling plus (multi-device) an
all-gather over ICI (parallel/sharded_topk.py).

Behavioral contracts preserved:

* per-module top-k (`similarity_top_k` per index, reference
  rag_engine.py:590-593) — the stacked search retrieves
  ``top_k × n_modules`` global candidates, then per-module quotas apply;
* ``top_k_per_index`` balancing — per-index limit
  ``max(1, total // n_indexes)``, re-sorted by score
  (reference rag_engine.py:463-507);
* auto-merge leaves→parents per module before balancing
  (reference rag_engine.py:641-644);
* LRU cache (128 queries) keyed by query text with ``clear_cache()``
  (reference rag_engine.py:395-404,519-527);
* per-index failure isolation is moot — one dispatch either returns or
  raises; module-level errors surface at load time instead.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.index.nodes import Node
from tensortruth_tpu.index.store import VectorIndex
from tensortruth_tpu.ops.topk import topk_search
from tensortruth_tpu.parallel.sharded_topk import sharded_topk
from tensortruth_tpu.retrieval.automerge import auto_merge

logger = logging.getLogger(__name__)


@dataclass
class RetrievedNode:
    """Engine output unit (analog of LlamaIndex NodeWithScore)."""

    node: Node
    score: float
    module: str
    source_index: int

    @property
    def text(self) -> str:
        return self.node.text

    @property
    def node_id(self) -> str:
        return self.node.node_id

    def to_dict(self) -> dict:
        return {
            "node_id": self.node.node_id,
            "module": self.module,
            "score": self.score,
            "text": self.node.text,
            "metadata": self.node.metadata,
        }


class MultiIndexEngine:
    def __init__(
        self,
        indexes: dict[str, VectorIndex],
        similarity_top_k: int = 10,
        merge_ratio: float = 0.5,
        enable_cache: bool = True,
        cache_size: int = 128,
        balance_strategy: str = "top_k_per_index",
        mesh=None,
        use_fused: bool | None = None,
        ivf_threshold: int = 2_000_000,
        ivf_clusters: int = 1024,
        ivf_nprobe: int = 32,
        corpus_dtype: str = "bfloat16",
    ):
        self.modules = list(indexes.keys())
        self.indexes = indexes
        self.similarity_top_k = similarity_top_k
        self.merge_ratio = merge_ratio
        self.enable_cache = enable_cache
        self.cache_size = cache_size
        self.balance_strategy = balance_strategy
        self.mesh = mesh
        # Fused Pallas path by default on real TPUs, exact XLA elsewhere.
        self.use_fused = (
            use_fused
            if use_fused is not None
            else jax.default_backend() == "tpu"
        )
        self.ivf_threshold = ivf_threshold
        self.ivf_clusters = ivf_clusters
        self.ivf_nprobe = ivf_nprobe
        # "int8" halves HBM per chunk (ops/topk.py quantize_corpus) — only
        # the single-device fused path; mesh/IVF tiers stay bf16.
        self.corpus_dtype = corpus_dtype
        self._stacked_scales = None
        self._cache: OrderedDict[str, list[RetrievedNode]] = OrderedDict()
        self._stacked: jax.Array | None = None
        self._ivf = None  # IVFIndex for the 10M tier (ops/ivf.py)
        self._ivf_sharded = None  # ShardedIVF: clusters sharded over the mesh
        self._row_map: np.ndarray | None = None  # global row → (module_i, phys row)
        self._module_of_row: np.ndarray | None = None
        self._n_actual = 0
        self._restack()

    # -- device matrix management ---------------------------------------------

    def _restack(self) -> None:
        """Stack all alive module rows into one device matrix.

        EVERY placement path streams row-contiguous pieces
        (``VectorIndex.iter_matrix_pieces`` — mmap shards for packed
        modules): the host-side f32 stack is never materialized, so a
        10M-row packed index (40 GB f32 on disk) loads with peak host RAM
        ≈ the device corpus in its storage dtype + one mmap'd shard,
        whether it lands on one chip, a mesh, or the IVF tier."""
        mats, mods, rows, active = [], [], [], []
        for mi, mod in enumerate(self.modules):
            m, row_map = self.indexes[mod].matrix()
            if m.shape[0] == 0:
                continue
            mats.append(m)
            mods.append(np.full(m.shape[0], mi, np.int32))
            rows.append(row_map)
            active.append(mod)
        if not mats:
            self._stacked, self._n_actual = None, 0
            return

        def emb_pieces():
            """Row-contiguous pieces in stack order, streaming-friendly."""
            for mod in active:
                yield from self.indexes[mod].iter_matrix_pieces()

        self._module_of_row = np.concatenate(mods)
        self._row_map = np.concatenate(rows)
        self._n_actual = int(sum(m.shape[0] for m in mats))
        dim = mats[0].shape[1]
        self._ivf = None
        self._ivf_sharded = None
        self._stacked_scales = None
        # A mesh shards the flat full-recall scan P ways, so the beyond-HBM
        # threshold scales with the shard count; past it, IVF cluster blocks
        # themselves shard over ``shards`` (SURVEY.md §2.14; BASELINE cfg 5).
        from tensortruth_tpu.parallel.mesh import SHARD_AXIS

        n_shards = self.mesh.shape[SHARD_AXIS] if self.mesh is not None else 1
        # int8 halves bytes/chunk, so the flat full-recall scan holds to 2×
        # the row count before the beyond-HBM IVF tier kicks in (measured:
        # 10M int8 rows fit one v5e chip at 22.8 ms/batch, BASELINE.md).
        dtype_factor = 2 if self.corpus_dtype == "int8" else 1
        if self._n_actual >= self.ivf_threshold * n_shards * dtype_factor:
            from tensortruth_tpu.ops.ivf import build_ivf, shard_ivf

            # device_blocks=False on a mesh: blocks go host → shard_ivf
            # places them cluster-sharded directly; a single-device staging
            # copy may not even fit one chip's HBM at this tier.
            ivf = build_ivf(
                emb_pieces,
                n_clusters=self.ivf_clusters,
                block_dtype=jnp.int8 if self.corpus_dtype == "int8" else jnp.bfloat16,
                n_rows=self._n_actual,
                dim=dim,
                device_blocks=self.mesh is None,
            )
            if self.mesh is not None:
                self._ivf_sharded = shard_ivf(ivf, self.mesh)
                self._stacked = self._ivf_sharded.blocks
            else:
                self._ivf = ivf
                self._stacked = self._ivf.blocks  # handle for n_chunks math
        elif self.corpus_dtype == "int8" and self.mesh is not None:
            from tensortruth_tpu.parallel.sharded_topk import (
                shard_corpus_int8_streaming,
            )

            self._stacked, self._stacked_scales, _ = shard_corpus_int8_streaming(
                emb_pieces(), self._n_actual, dim, self.mesh,
                tile_n=2048 if self.use_fused else None,
            )
        elif self.corpus_dtype == "int8" and self.use_fused:
            from tensortruth_tpu.ops.topk import quantize_corpus_streaming

            # Streams mmap shards through per-piece quantization — the f32
            # corpus is never resident (capacity-tier load, BASELINE.md).
            emb_q, scales, _ = quantize_corpus_streaming(
                emb_pieces(), self._n_actual, dim
            )
            self._stacked = jnp.asarray(emb_q)
            self._stacked_scales = jnp.asarray(scales)
        else:
            if self.corpus_dtype == "int8":
                # int8 flat scan needs the fused kernel; exact XLA falls back
                # to bf16 — say so instead of silently doubling HBM.
                logger.warning(
                    "corpus_dtype=int8 requested but use_fused=False on a "
                    "single device: falling back to bfloat16 corpus (2x HBM)"
                )
            # bf16 on device by default: halves HBM and keeps the fused
            # kernel inside the VMEM budget (f32 tiles double-buffer past
            # 16MB); scores accumulate in f32 regardless (ops/topk.py).
            if self.mesh is not None:
                import ml_dtypes

                from tensortruth_tpu.parallel.sharded_topk import (
                    shard_corpus_streaming,
                )

                self._stacked, _ = shard_corpus_streaming(
                    emb_pieces(), self._n_actual, dim, self.mesh,
                    np_dtype=(
                        np.float32 if self.corpus_dtype == "float32"
                        else ml_dtypes.bfloat16
                    ),
                    tile_n=2048 if self.use_fused else None,
                )
            else:
                # Stream pieces into a preallocated device-dtype host buffer,
                # pre-padded to the kernel tile multiple (ops/topk.py note):
                # the f32 stack is never resident, halving peak host RAM on
                # the default bf16 tier and quartering it from mmap shards.
                import ml_dtypes

                np_dtype = (
                    np.float32 if self.corpus_dtype == "float32" else ml_dtypes.bfloat16
                )
                n_pad = -(-self._n_actual // 2048) * 2048
                out = np.zeros((n_pad, dim), np_dtype)
                row = 0
                for piece in emb_pieces():
                    out[row : row + piece.shape[0]] = piece
                    row += piece.shape[0]
                if row != self._n_actual:
                    raise RuntimeError(
                        f"matrix pieces supplied {row} rows, stack expects "
                        f"{self._n_actual}"
                    )
                self._stacked = jnp.asarray(out)
        self._cache.clear()

    def refresh(self) -> None:
        """Re-stack after index mutations (add/remove documents)."""
        self._restack()

    @property
    def n_chunks(self) -> int:
        return self._n_actual

    # -- retrieval -------------------------------------------------------------

    def retrieve(self, query_emb: np.ndarray, query_text: str = "") -> list[RetrievedNode]:
        """Single query: (D,) embedding → balanced merged RetrievedNodes."""
        if self.enable_cache and query_text and query_text in self._cache:
            self._cache.move_to_end(query_text)
            return self._cache[query_text]
        result = self.retrieve_batch(query_emb[None, :])[0]
        if self.enable_cache and query_text:
            self._cache[query_text] = result
            if len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)
        return result

    def retrieve_batch(self, query_embs: np.ndarray) -> list[list[RetrievedNode]]:
        """Batch of queries → per-query balanced merged RetrievedNodes.

        One device dispatch for the whole batch across all loaded modules.
        """
        if self._stacked is None or self._n_actual == 0:
            return [[] for _ in range(query_embs.shape[0])]
        # Over-retrieve so every module could fill its quota (reference
        # retrieves top_k per index then merges).
        k = min(self.similarity_top_k * max(1, len(self.modules)), self._n_actual)
        # NEVER cast the query to int8: normalized query components are all
        # |v| < 1 and would truncate to zero. int8 lives corpus-side only
        # (scales in _stacked_scales or inside the IVF index); queries score
        # in bf16 against it.
        q_dtype = (
            jnp.bfloat16
            if (self._stacked_scales is not None or self._stacked.dtype == jnp.int8)
            else self._stacked.dtype
        )
        q = jnp.asarray(query_embs, dtype=q_dtype)
        if self._ivf_sharded is not None:
            from tensortruth_tpu.ops.ivf import ivf_search_sharded

            vals, idx = ivf_search_sharded(
                self._ivf_sharded, q, k, nprobe=self.ivf_nprobe
            )
            return [self._postprocess(vals[i], idx[i]) for i in range(vals.shape[0])]
        if self._ivf is not None:
            from tensortruth_tpu.ops.ivf import ivf_search

            vals, idx = ivf_search(self._ivf, q, k, nprobe=self.ivf_nprobe)
            return [self._postprocess(vals[i], idx[i]) for i in range(vals.shape[0])]
        if self.mesh is not None:
            vals, idx = sharded_topk(
                q,
                self._stacked,
                k=k,
                mesh=self.mesh,
                n_actual=self._n_actual,
                use_fused=self.use_fused,
                scales=self._stacked_scales,
            )
        elif self._stacked_scales is not None:
            from tensortruth_tpu.ops.topk import fused_topk_int8

            vals, idx = fused_topk_int8(
                q, self._stacked, self._stacked_scales, k, n_actual=self._n_actual
            )
        else:
            vals, idx = topk_search(
                q, self._stacked, k, exact=not self.use_fused,
                n_actual=self._n_actual,
            )
        vals, idx = np.asarray(vals), np.asarray(idx)
        return [self._postprocess(vals[i], idx[i]) for i in range(vals.shape[0])]

    def _postprocess(self, scores: np.ndarray, rows: np.ndarray) -> list[RetrievedNode]:
        """Host side: global rows → per-module hits → auto-merge → balance."""
        valid = rows >= 0
        scores, rows = scores[valid], rows[valid]

        per_module: dict[int, list[tuple[str, float]]] = {}
        for s, r in zip(scores.tolist(), rows.tolist()):
            mi = int(self._module_of_row[r])
            phys = int(self._row_map[r])
            node = self.indexes[self.modules[mi]].node_of_row(phys)
            per_module.setdefault(mi, []).append((node.node_id, float(s)))

        results: list[RetrievedNode] = []
        for mi, hits in per_module.items():
            mod = self.modules[mi]
            # Per-module quota: the stacked search plays the role of each
            # index's own top-k retriever (reference as_retriever(top_k)).
            hits = hits[: self.similarity_top_k]
            merged = auto_merge(hits, self.indexes[mod].store, self.merge_ratio)
            for nid, score in merged:
                results.append(
                    RetrievedNode(
                        node=self.indexes[mod].store.get(nid),
                        score=score,
                        module=mod,
                        source_index=mi,
                    )
                )

        if len(self.modules) > 1 and self.balance_strategy == "top_k_per_index":
            results = self._balance(results)
        else:
            results.sort(key=lambda r: -r.score)
        return results

    def _balance(self, nodes: list[RetrievedNode]) -> list[RetrievedNode]:
        """per-index limit = max(1, total // n_indexes), re-sorted by score
        (reference rag_engine.py:463-507)."""
        by_index: dict[int, list[RetrievedNode]] = {}
        for n in nodes:
            by_index.setdefault(n.source_index, []).append(n)
        if not by_index:
            return []
        limit = max(1, len(nodes) // len(by_index))
        balanced: list[RetrievedNode] = []
        for group in by_index.values():
            group.sort(key=lambda r: -r.score)
            balanced.extend(group[:limit])
        balanced.sort(key=lambda r: -r.score)
        return balanced

    def clear_cache(self) -> None:
        self._cache.clear()
