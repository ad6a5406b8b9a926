"""Tests for the r4 end-of-round snapshot surfaces (commit 538f8ac).

Each test pins one of the behavior fixes that landed in the snapshot:
engine extra-index keying, config rebinding after PATCH, MCP tool-load
single-flight, lazy embedder factory, failed-upload cleanup, reindex
metadata carry-forward, and the engine-build publish ordering.
"""

import asyncio
import hashlib
import threading

import numpy as np
import pytest

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.models.manager import ModelManager
from tensortruth_tpu.services.document_index import DocumentIndexBuilder
from tensortruth_tpu.services.document_service import DocumentService
from tensortruth_tpu.tokenization import load_tokenizer


def _stable_seed(t: str) -> int:
    return int.from_bytes(hashlib.blake2b(t.encode(), digest_size=4).digest(), "little")


class FakeEmbedder:
    """Deterministic 64-dim embedder (matches tiny-embedder's hidden size)."""

    tokenizer = load_tokenizer()
    model_id = "fake"

    def __init__(self, dim=64):
        self.dim = dim

    def encode(self, texts, **kw):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(_stable_seed(t))
            v = rng.standard_normal(self.dim)
            out[i] = v / np.linalg.norm(v)
        return out


# -- engine.py: extra index paths keyed by scope dir, not leaf name ------------


def test_extra_index_paths_same_leaf_name_both_load(tmp_path, monkeypatch):
    """A session index and a project index are both named '<scope>/index';
    keying by leaf name alone silently dropped one of them (dict overwrite)."""
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    ModelManager.reset_instance()
    from tensortruth_tpu.engine import load_engine_for_modules

    sess = tmp_path / "sessions" / "s1" / "index"
    proj = tmp_path / "projects" / "p1" / "index"
    for scope, text in ((sess, "session doc text. " * 60), (proj, "project doc text. " * 60)):
        b = DocumentIndexBuilder(scope, FakeEmbedder(), chunk_sizes=[64, 16], chunk_overlap=4)
        b.add_documents({"d": text})

    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.use_fused_topk = False
    engine = load_engine_for_modules(
        [],
        {"use_reranker": False},
        indexes_dir=tmp_path / "indexes",
        extra_index_paths=[sess, proj],
        config=cfg,
    )
    assert set(engine.modules) == {"s1/index", "p1/index"}


# -- deps.py: rebind_config points built singletons at the new config ----------


def test_rebind_config_propagates_to_built_singletons(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.app.config import save_config
    from tensortruth_tpu.server.deps import ServiceContainer

    c = ServiceContainer(data_dir=tmp_path)
    rag = c.rag_service
    sess = c.session_service
    tools = c.tool_service
    old = c.config
    assert rag.config is old and sess.config is old

    cfg = TensorTruthTPUConfig.default()
    cfg.llm.default_temperature = 0.77
    save_config(cfg)
    reloaded = c.reload_config()
    assert reloaded is not old
    assert rag.config is reloaded
    assert rag.chat_history_service.config is reloaded
    assert sess.config is reloaded
    assert tools.config is reloaded
    # A session created AFTER the reload picks up the new defaults.
    s = sess.create_session()
    assert s["params"]["temperature"] == 0.77


def test_rebind_config_skips_unbuilt_singletons(tmp_path, monkeypatch):
    """rebind on a cold container must not force-construct services."""
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.server.deps import ServiceContainer

    c = ServiceContainer(data_dir=tmp_path)
    c.rebind_config()
    assert c._rag_service is None and c._session_service is None


# -- deps.py: get_mcp_tools single-flight ---------------------------------------


def test_get_mcp_tools_single_flight(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    import tensortruth_tpu.agents.mcp_client as mcp_client
    from tensortruth_tpu.server.deps import ServiceContainer

    calls = []

    async def fake_load(service):
        calls.append(1)
        await asyncio.sleep(0.05)  # hold the window open for the racer
        return ({"t": object()}, [], {})

    monkeypatch.setattr(mcp_client, "load_mcp_tools", fake_load)
    c = ServiceContainer(data_dir=tmp_path)

    async def race():
        return await asyncio.gather(c.get_mcp_tools(), c.get_mcp_tools())

    r1, r2 = asyncio.run(race())
    assert len(calls) == 1  # two racers, one connect pass
    assert r1 is r2 and "t" in r1


# -- document_index.py: lazy embedder factory -----------------------------------


def test_builder_factory_deferred_until_needed(tmp_path):
    loads = []

    def factory():
        loads.append(1)
        return FakeEmbedder()

    b = DocumentIndexBuilder(tmp_path / "index", factory, chunk_sizes=[64, 16])
    assert loads == []  # construction is free
    assert b.doc_ids() == [] and not b.exists
    assert loads == []  # bookkeeping never loads the model
    b.add_documents({"d": "needs the model now. " * 60})
    assert loads == [1]  # first real op loads exactly once
    b.add_documents({"e": "more text. " * 60})
    assert loads == [1]  # cached thereafter


def test_document_service_bookkeeping_never_loads_model(tmp_path):
    """delete/list on a cold server must not pay the 568M model load."""
    scope = tmp_path / "sessions" / "s"
    svc = DocumentService(lambda: FakeEmbedder(), chunk_sizes=[64, 16])
    r = svc.add_text(scope, "a.md", "text body " * 100)

    def poison():
        raise AssertionError("bookkeeping op constructed the embedder")

    cold = DocumentService(poison, chunk_sizes=[64, 16])
    assert cold.list_documents(scope) == [r["doc_id"]]
    assert cold.describe_documents(scope)[0]["filename"] == "a.md"
    assert cold.index_exists(scope)
    assert cold.remove_document(scope, r["doc_id"]) > 0


def test_builder_accepts_ready_embedder_instance(tmp_path):
    """An object with .encode is used directly, not treated as a factory."""
    emb = FakeEmbedder()
    b = DocumentIndexBuilder(tmp_path / "index", emb, chunk_sizes=[64, 16])
    assert b.embedder is emb


# -- document_service.py: failed upload leaves no orphan file --------------------


def test_failed_pdf_upload_removes_stored_file(tmp_path):
    svc = DocumentService(lambda: FakeEmbedder(), chunk_sizes=[64, 16])
    scope = tmp_path / "sessions" / "s"
    r = svc.add_pdf(scope, "scan.pdf", b"%PDF-1.4 nothing extractable")
    assert r["status"] == "failed"
    assert not list((scope / "pdfs").glob("*.pdf"))  # no orphan
    assert svc.list_documents(scope) == []


# -- document_service.py: reindex carries ingest metadata forward ----------------


def test_reindex_preserves_ingest_metadata(tmp_path):
    svc = DocumentService(lambda: FakeEmbedder(), chunk_sizes=[64, 16])
    scope = tmp_path / "projects" / "p"
    r = svc.add_text(
        scope, "paper.md", "body text " * 100,
        metadata={"source_url": "https://example.org/x", "arxiv_id": "2401.1"},
    )
    assert svc.reindex(scope) == 1
    docs = svc.describe_documents(scope)
    assert docs[0]["filename"] == "paper.md"  # not blanked by the rebuild
    meta = svc._stored_metadata(scope)[r["doc_id"]]
    assert meta["source_url"] == "https://example.org/x"
    assert meta["arxiv_id"] == "2401.1"


# -- rag_service.py: engine published before the build lock releases -------------


def test_engine_publish_ordering_under_contention(tmp_path, monkeypatch):
    """Stress the cold-start race: the loser of the build lock must find the
    winner's engine in the cache, never rebuild (publish happens under the
    build lock now)."""
    import tensortruth_tpu.services.rag_service as rs

    builds = []

    def slow_build(modules, params, extra_index_paths=None, config=None, **kw):
        builds.append(1)
        import time

        time.sleep(0.05)

        class FakeEngine:
            class retriever:
                @staticmethod
                def clear_cache():
                    pass

            reranker = None
            params = {"embedding_model": "e", "reranker_model": None}

        engine = FakeEngine()
        engine.modules = list(modules)
        return engine

    monkeypatch.setattr(rs, "load_engine_for_modules", slow_build)
    svc = rs.RAGService(config=TensorTruthTPUConfig.default())

    results = []
    threads = [
        threading.Thread(
            target=lambda: results.append(svc.load_engine(["m"], {"x": 1}))
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1  # single-flight held through publication
    assert len({id(r) for r in results}) == 1  # everyone got the same engine


class TestSettingsHashRobustness:
    """A torn settings_hash.json (crash mid-write before the atomic writer)
    must read as stale — not raise on every staleness probe."""

    def test_corrupt_settings_file_reads_as_stale(self, tmp_path):
        from tensortruth_tpu.services.document_index import DocumentIndexBuilder

        b = DocumentIndexBuilder(tmp_path, embedder=None)
        (tmp_path / "settings_hash.json").write_text('{"hash": "abc')  # torn
        assert b.stored_settings_hash() == "<corrupt>"
        assert b.is_stale()

    def test_write_settings_is_atomic_and_round_trips(self, tmp_path):
        from tensortruth_tpu.services.document_index import DocumentIndexBuilder

        b = DocumentIndexBuilder(tmp_path, embedder=None)
        b._write_settings()
        assert b.stored_settings_hash() == b.current_settings_hash()
        assert not b.is_stale()
        assert not list(tmp_path.glob("*.tmp"))
