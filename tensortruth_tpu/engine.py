"""Engine factory: load per-module indexes into one TPU retrieval engine.

Re-design of the reference's ``load_engine_for_modules``
(reference rag_engine.py:529-738). Differences by construction:

* per-module Chroma dirs + AutoMergingRetriever + MultiIndexRetriever stack
  collapses into ONE ``MultiIndexEngine`` holding all module matrices
  stacked on device (retrieval/engine.py) — auto-merge and balancing
  semantics preserved there;
* the reranker + hard-cutoff postprocessor chain (reference
  rag_engine.py:711-726) becomes RankingStage + apply_confidence_gate;
* adaptive top-k kept: ``similarity_top_k = max(5, 2 * reranker_top_n)``
  (reference rag_engine.py:590-593).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path

from tensortruth_tpu.index.store import VectorIndex, sanitize_model_id
from tensortruth_tpu.models.manager import ModelManager, ModelSpec
from tensortruth_tpu.retrieval.engine import MultiIndexEngine

logger = logging.getLogger(__name__)


@dataclass
class RAGEngine:
    """Everything the query path needs, loaded once per module-set."""

    retriever: MultiIndexEngine
    embedder: object
    reranker: object | None
    modules: list[str]
    params: dict = field(default_factory=dict)
    pipeline: object | None = None  # fused embed→top-k step (pipeline.py)

    @property
    def similarity_top_k(self) -> int:
        return self.retriever.similarity_top_k


def adaptive_top_k(reranker_top_n: int) -> int:
    """Retrieve 2× the rerank target, floor 5 (reference rag_engine.py:590-593)."""
    return max(5, reranker_top_n * 2)


def load_engine_for_modules(
    modules: list[str],
    params: dict | None = None,
    *,
    indexes_dir: str | Path | None = None,
    extra_index_paths: list[str | Path] | None = None,
    config=None,
    mesh=None,
) -> RAGEngine:
    """Load module indexes + models into a ready RAGEngine.

    ``extra_index_paths`` are session/project document indexes (absolute
    VectorIndex dirs) attached alongside catalog modules (reference
    rag_engine.py:608-656 legacy-path handling).
    """
    from tensortruth_tpu.app.config import load_config
    from tensortruth_tpu.app.paths import get_base_indexes_dir

    params = dict(params or {})
    config = config or load_config()
    if mesh is None and config.rag.mesh.get("enabled"):
        # Config-driven mesh (config.yaml rag.mesh) for multi-chip slices.
        from tensortruth_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            n_shards=config.rag.mesh.get("n_shards") or None,
            n_data=config.rag.mesh.get("n_data", 1),
        )
    embedding_model = params.get(
        "embedding_model", config.rag.default_embedding_model
    )
    reranker_model = params.get("reranker_model", config.rag.default_reranker)
    top_n = params.get("reranker_top_n", config.rag.default_top_n)
    use_reranker = params.get("use_reranker", True)

    indexes_dir = Path(indexes_dir) if indexes_dir else get_base_indexes_dir()
    model_dir = indexes_dir / sanitize_model_id(embedding_model)

    indexes: dict[str, VectorIndex] = {}
    from tensortruth_tpu.index.store import resolve_module_dir

    for module in modules:
        # Accept both bare module names and {doc_type}_{module} dir names.
        path = resolve_module_dir(model_dir, module)
        if path is None:
            logger.warning("module index not found, skipping: %s", module)
            continue
        try:  # per-module failure isolation (reference rag_engine.py:608-656)
            indexes[module] = VectorIndex.load(path)
        except Exception as e:
            logger.error("module index %s unreadable (%s), skipping: %s",
                         module, type(e).__name__, e)
            continue
        logger.info("loaded module %s (%d chunks)", module, indexes[module].n_alive)
    for p in extra_index_paths or []:
        p = Path(p)
        if VectorIndex.is_valid(p):
            # Key by scope dir + leaf ("{session_id}/index"): every scope
            # index dir is named plain "index", so keying by p.name alone
            # made a session's documents silently vanish whenever its
            # project also had documents (dict overwrite).
            name = f"{p.parent.name}/{p.name}"
            try:
                indexes[name] = VectorIndex.load(p)
            except Exception as e:
                logger.error("document index %s unreadable, skipping: %s", p, e)

    manager = ModelManager.get_instance()
    mc = config.rag.get_embedding_model_config(embedding_model)
    # Models inherit the mesh: encoder/reranker forwards run DP over every
    # mesh device (the rerank stage dominates e2e time and scales linearly).
    embedder = manager.get_embedder(
        ModelSpec(
            embedding_model,
            dtype=mc.dtype,
            max_length=mc.max_length,
            local_dir=mc.local_dir,
            tokenizer_path=mc.tokenizer_path,
            batch_buckets=tuple(mc.batch_buckets) if mc.batch_buckets else None,
            seq_buckets=tuple(mc.seq_buckets) if mc.seq_buckets else None,
        ),
        mesh=mesh,
    )
    reranker = (
        manager.get_reranker(ModelSpec(reranker_model), mesh=mesh)
        if use_reranker
        else None
    )

    # GELU-flavor compat: an index embedded with one GELU variant scored
    # against queries embedded with the other carries ~1e-3 activation error
    # (TPU default tanh vs CPU/GPU exact). Detectable, not fatal — warn.
    query_flavor = getattr(embedder, "gelu_flavor", "")
    for module, idx in indexes.items():
        built_flavor = idx.metadata.get("gelu", "")
        if built_flavor and query_flavor and built_flavor != query_flavor:
            logger.warning(
                "module %s was embedded with %s GELU but queries use %s "
                "GELU — rebuild the index on this backend for exact parity",
                module, built_flavor, query_flavor,
            )

    retriever = MultiIndexEngine(
        indexes,
        similarity_top_k=adaptive_top_k(top_n),
        balance_strategy=params.get(
            "balance_strategy", config.rag.default_balance_strategy
        ),
        mesh=mesh,
        use_fused=config.rag.use_fused_topk,
        corpus_dtype=params.get("corpus_dtype", config.rag.corpus_dtype),
    )
    from tensortruth_tpu.pipeline import QueryPipeline

    pipeline = QueryPipeline(embedder, retriever)
    return RAGEngine(
        pipeline=pipeline if pipeline.applicable() else None,
        retriever=retriever,
        embedder=embedder,
        reranker=reranker,
        modules=list(indexes.keys()),
        params={
            "reranker_top_n": top_n,
            "confidence_cutoff": params.get(
                "confidence_cutoff", config.rag.default_confidence_threshold
            ),
            "confidence_cutoff_hard": params.get(
                "confidence_cutoff_hard", config.rag.default_confidence_cutoff_hard
            ),
            "embedding_model": embedding_model,
            "reranker_model": reranker_model if use_reranker else None,
            **params,
        },
    )
