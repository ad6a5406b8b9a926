"""Full-stack e2e on real TPU hardware: build → load engine → query.

Uses the REAL 568M-param models (random-init — no HF cache here; compute
path identical to pretrained) and real reference docs as corpus. Validates
the served pipeline end-to-end on device: chunk → TPU-batched embed →
persisted index → engine load → fused embed→top-k → auto-merge →
cross-encoder rerank → confidence gate → metrics.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/.cache/jax_comp", exist_ok=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    data_dir = tempfile.mkdtemp(prefix="tt_tpu_e2e_")
    os.environ["TENSOR_TRUTH_TPU_DATA_DIR"] = data_dir

    from tensortruth_tpu.app.config import TensorTruthTPUConfig
    from tensortruth_tpu.app.sources import save_user_sources
    from tensortruth_tpu.indexing.builder import build_module
    from tensortruth_tpu.models.manager import ModelManager, ModelSpec
    from tensortruth_tpu.services.rag_service import RAGService

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

    sources = {"libraries": {"ttref": {"url": "https://example"}}, "papers": {}, "books": {}}
    save_user_sources(sources)
    docs = os.path.join(data_dir, "library_docs", "library_ttref")
    os.makedirs(docs)
    import shutil

    for name in ("README.md",):
        shutil.copy(f"/root/reference/{name}", docs)
    for name in os.listdir("/root/reference/docs"):
        shutil.copy(f"/root/reference/docs/{name}", docs)

    t0 = time.time()
    embedder = ModelManager.get_instance().get_embedder(ModelSpec("BAAI/bge-m3"))
    print(f"embedder ready in {time.time()-t0:.1f}s", flush=True)

    # Real-weight path: when a local BGE-M3 checkpoint was discovered
    # (models/manager.py discover_checkpoint), assert cosine parity of the
    # converted JAX forward against torch on the same token ids.
    key = ModelManager.get_instance()._embedder_key
    local_dir = key[3] if key else None
    if local_dir:
        print(f"using real weights from {local_dir}", flush=True)
        try:
            import numpy as np
            import torch
            import transformers

            probe = "TPU retrieval parity probe sentence."
            ids, mask = embedder.tokenizer.encode_batch([probe], 64)
            model = transformers.AutoModel.from_pretrained(
                local_dir, add_pooling_layer=False
            )
            model.eval()
            with torch.no_grad():
                ref = model(
                    input_ids=torch.tensor(ids.astype(np.int64)),
                    attention_mask=torch.tensor(mask.astype(np.int64)),
                ).last_hidden_state[:, 0].numpy()
            ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)
            ours = embedder.encode([probe])
            cos = float((ours * ref).sum())
            print(f"real-weight cosine parity vs torch: {cos:.5f}", flush=True)
            assert cos > 0.99, cos
        except ImportError as e:
            print(f"torch parity probe skipped (missing dep: {e})", flush=True)
    else:
        print(
            "no local BGE-M3 checkpoint found — random-init weights "
            "(timing-equivalent; see tests/unit/test_xlmr_parity.py for "
            "full-depth numerical parity)",
            flush=True,
        )

    t0 = time.time()
    ok = build_module(
        "ttref", embedder,
        library_docs_dir=os.path.join(data_dir, "library_docs"),
        indexes_dir=os.path.join(data_dir, "indexes"),
        sources=sources,
        chunk_sizes=[512, 128], chunk_overlap=32,
    )
    assert ok
    print(f"build OK in {time.time()-t0:.1f}s", flush=True)

    cfg = TensorTruthTPUConfig.default()
    svc = RAGService(config=cfg, llm_factory=lambda p: None)
    t0 = time.time()
    svc.load_engine(["ttref"], {"reranker_top_n": 3},
                    indexes_dir=os.path.join(data_dir, "indexes"))
    print(f"engine load (incl reranker init) {time.time()-t0:.1f}s; "
          f"chunks={svc.engine.retriever.n_chunks}", flush=True)

    for query in ("how do I configure extensions?", "what indexes are supported?"):
        t0 = time.time()
        r = svc.retrieve(query)
        dt = time.time() - t0
        print(json.dumps({
            "query": query,
            "ms": round(dt * 1e3, 1),
            "confidence": r.confidence,
            "n_sources": len(r.sources),
            "timings": r.metrics.get("timings"),
        }), flush=True)
    print("TPU E2E OK", flush=True)


if __name__ == "__main__":
    main()
