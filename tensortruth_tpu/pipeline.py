"""Jitted end-to-end query step: tokenize(host) → [embed → top-k](device).

SURVEY.md §7 step 6: the online hot path runs as ONE device dispatch per
query batch instead of two (encoder forward, then top-k). Over the remote
TPU tunnel each dispatch costs ~30 ms RTT, so fusing embed+search into a
single XLA program is a direct latency win; XLA also overlaps the encoder's
final layers with the first corpus tiles' DMA.

Used by RAGService/bench for the single-device tier; the mesh tier keeps
separate stages (queries are DP-sharded between them) and the IVF tier has
its own probe program.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tensortruth_tpu.models.xlmr import XLMRConfig, cls_embed
from tensortruth_tpu.ops.topk import exact_topk, fused_topk


@functools.partial(
    jax.jit, static_argnames=("cfg", "k", "use_fused", "m", "tile_n", "n_actual")
)
def embed_topk(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    emb: jax.Array,
    *,
    cfg: XLMRConfig,
    k: int,
    n_actual: int,
    use_fused: bool = True,
    m: int = 1,
    tile_n: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """One program: encoder forward → normalized CLS → corpus top-k."""
    q = cls_embed(params, ids, mask, cfg).astype(emb.dtype)
    n = emb.shape[0]
    if use_fused and n_actual > 4096:
        vals, idx = fused_topk(q, emb, k, m=m, tile_n=tile_n, n_actual=n_actual)
    else:
        k_eff = min(k, n)
        vals, idx = exact_topk(q, emb, k_eff)
        if k_eff < k:
            vals = jnp.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=float("-inf"))
            idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)), constant_values=-1)
    valid = (idx >= 0) & (idx < n_actual)
    vals = jnp.where(valid, vals, float("-inf"))
    idx = jnp.where(valid, idx, -1)
    return vals, idx


class QueryPipeline:
    """Host wrapper: bucketed tokenization + the fused device step."""

    def __init__(self, embedder, engine):
        self.embedder = embedder
        self.engine = engine

    def applicable(self) -> bool:
        """Fusion only on the single-device flat tier."""
        return (
            self.engine.mesh is None
            and self.engine._ivf is None
            and self.engine._ivf_sharded is None
            and self.engine._stacked_scales is None  # int8 tier has its own path
            and self.engine._stacked is not None
        )

    def retrieve_batch(self, texts: Sequence[str]):
        """texts → per-query merged/balanced RetrievedNodes (one dispatch)."""
        eng = self.engine
        e = self.embedder
        if not texts or eng._stacked is None:
            return [[] for _ in texts]
        ids, mask = e.tokenizer.encode_batch(list(texts), e.max_length)
        from tensortruth_tpu.models.embedder import _bucket

        real_len = int(mask.sum(axis=1).max())
        seq = _bucket(real_len, e.seq_buckets)
        bsz = _bucket(len(texts), e.batch_buckets)
        ids_p = np.full((bsz, seq), e.tokenizer.pad_id, dtype=np.int32)
        mask_p = np.zeros((bsz, seq), dtype=np.int32)
        ids_p[: len(texts)] = ids[:, :seq]
        mask_p[: len(texts)] = mask[:, :seq]

        k = min(eng.similarity_top_k * max(1, len(eng.modules)), eng._n_actual)
        vals, idx = embed_topk(
            e.params,
            jnp.asarray(ids_p),
            jnp.asarray(mask_p),
            eng._stacked,
            cfg=e.cfg,
            k=k,
            n_actual=eng._n_actual,
            use_fused=eng.use_fused,
        )
        vals = np.asarray(vals)[: len(texts)]
        idx = np.asarray(idx)[: len(texts)]
        return [eng._postprocess(vals[i], idx[i]) for i in range(len(texts))]

    def retrieve_one(self, text: str):
        """Single query with the engine's LRU text cache semantics."""
        eng = self.engine
        if eng.enable_cache and text in eng._cache:
            eng._cache.move_to_end(text)
            return eng._cache[text]
        result = self.retrieve_batch([text])[0]
        if eng.enable_cache:
            eng._cache[text] = result
            if len(eng._cache) > eng.cache_size:
                eng._cache.popitem(last=False)
        return result
