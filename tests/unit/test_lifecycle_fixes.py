"""Engine-cache lifecycle + registry singleton regressions (round-2 review):
restart/reinitialize must drop cached engines, model swaps must not pin two
model sets in HBM, and ProviderRegistry.get_instance must not rebuild (and
discard its TTL caches) on every call."""

import numpy as np
import pytest

from tensortruth_tpu.app.config import ProviderConfig
from tensortruth_tpu.core.providers import ProviderRegistry


@pytest.fixture
def data_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.app.config import TensorTruthTPUConfig, save_config
    from tensortruth_tpu.models.manager import ModelManager

    ModelManager.reset_instance()
    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.default_reranker = "tiny-reranker"
    cfg.rag.use_fused_topk = False
    save_config(cfg)
    return cfg


def _build_session_index(tmp_path, cfg):
    from tensortruth_tpu.index.chunker import hierarchical_chunk
    from tensortruth_tpu.index.store import VectorIndex
    from tensortruth_tpu.tokenization import SimpleTokenizer

    tok = SimpleTokenizer()
    nodes = hierarchical_chunk(
        "MXU systolic array text. " * 200, tok, "d1", module="scope",
        chunk_sizes=[128, 32], chunk_overlap=8,
    )

    def embed(texts):
        out = np.zeros((len(texts), 64), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash(t)) % 2**32)
            v = rng.standard_normal(64)
            out[i] = v / np.linalg.norm(v)
        return out

    d = tmp_path / "scope_index"
    idx = VectorIndex.build(nodes, embed, embedding_model="tiny-embedder")
    idx.save(d)
    return d


def test_clear_engines_drops_cache_and_pointer(data_env, tmp_path):
    from tensortruth_tpu.services.rag_service import RAGService

    svc = RAGService(config=data_env)
    d = _build_session_index(tmp_path, data_env)
    svc.load_engine([], params={}, extra_index_paths=[str(d)])
    assert svc.engine is not None and len(svc._engines) == 1

    svc.clear_engines()
    assert svc.engine is None and len(svc._engines) == 0

    # plain unload keeps the cache (other sessions may still use it)
    svc.load_engine([], params={}, extra_index_paths=[str(d)])
    svc.unload()
    assert svc.engine is None and len(svc._engines) == 1


def test_model_swap_evicts_other_model_engines(data_env, tmp_path):
    """A cached engine built on model X must be dropped when a new engine
    loads model Y — otherwise both models + corpora stay pinned in HBM.
    Turning the reranker OFF pins nothing extra and must NOT evict."""
    from tensortruth_tpu.models import manager as manager_mod
    from tensortruth_tpu.services.rag_service import RAGService

    svc = RAGService(config=data_env)
    d = _build_session_index(tmp_path, data_env)
    svc.load_engine([], params={"embedding_model": "tiny-embedder"},
                    extra_index_paths=[str(d)])
    assert len(svc._engines) == 1
    # same models, different params hash → both cached (the cache's purpose)
    svc.load_engine([], params={"embedding_model": "tiny-embedder",
                                "reranker_top_n": 3},
                    extra_index_paths=[str(d)])
    assert len(svc._engines) == 2
    # use_reranker=False is model-compatible — nothing evicted for it
    svc.load_engine([], params={"embedding_model": "tiny-embedder",
                                "use_reranker": False},
                    extra_index_paths=[str(d)])
    assert len(svc._engines) == 2  # LRU cap, no model-swap purge

    # a genuinely different embedding model IS a swap → all others evicted
    manager_mod._EMBEDDER_ARCHS.setdefault(
        "tiny-embedder-b", manager_mod._EMBEDDER_ARCHS["tiny-embedder"]
    )
    try:
        svc.load_engine([], params={"embedding_model": "tiny-embedder-b",
                                    "use_reranker": False},
                        extra_index_paths=[str(d)])
        keys = {svc._model_key(e)[0] for e in svc._engines.values()}
        assert keys == {"tiny-embedder-b"}
    finally:
        manager_mod._EMBEDDER_ARCHS.pop("tiny-embedder-b", None)


def test_registry_singleton_not_rebuilt_per_call():
    ProviderRegistry.reset_instance()
    provs = [ProviderConfig(id="p1", type="ollama", base_url="http://x:1")]
    a = ProviderRegistry.get_instance(provs)
    b = ProviderRegistry.get_instance(provs)  # the status-poll pattern
    assert a is b  # caches survive polling
    ProviderRegistry.reset_instance()
    c = ProviderRegistry.get_instance(provs)
    assert c is not a
    ProviderRegistry.reset_instance()


def test_concurrent_load_unload_no_corruption(data_env, tmp_path):
    """The engine build now runs outside the service lock: hammer
    load/unload/retrieve from threads and assert no exception and a
    consistent final state (the ADVICE race, re-checked after the change)."""
    import threading

    from tensortruth_tpu.services.rag_service import RAGService

    svc = RAGService(config=data_env)
    d = _build_session_index(tmp_path, data_env)
    errors = []

    def loader(n):
        try:
            for i in range(4):
                svc.load_engine(
                    [], params={"reranker_top_n": (n + i) % 3 + 2},
                    extra_index_paths=[str(d)],
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def unloader():
        try:
            for _ in range(6):
                svc.unload()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=loader, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=unloader))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # cache bounded and engines usable
    assert len(svc._engines) <= svc._max_cached_engines
    eng = svc.load_engine([], params={"reranker_top_n": 2},
                          extra_index_paths=[str(d)])
    assert eng.retriever.n_chunks > 0
