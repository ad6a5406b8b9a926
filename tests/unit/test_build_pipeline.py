"""Offline build pipeline: sources config, metadata extraction, build_module,
build CLI (reference tests/unit/test_indexing_builder.py +
tests/integration/test_build_db.py analogs)."""

import json

import numpy as np
import pytest

from tensortruth_tpu.app.sources import (
    get_document_type_for_module,
    list_all_modules,
    load_user_sources,
    save_user_sources,
)
from tensortruth_tpu.core.types import DocumentType
from tensortruth_tpu.index.store import VectorIndex
from tensortruth_tpu.indexing.builder import build_module, load_documents
from tensortruth_tpu.indexing.metadata import (
    extract_metadata,
    format_authors,
    list_available_models,
    list_modules_for_model,
    parse_yaml_header,
    resolve_model_id,
)

import hashlib


def _stable_seed(t: str) -> int:
    return int.from_bytes(hashlib.blake2b(t.encode(), digest_size=4).digest(), "little")

DIM = 16


class FakeEmbedder:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def encode(self, texts, **kw):
        out = np.zeros((len(texts), DIM), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(_stable_seed(t))
            v = rng.standard_normal(DIM)
            out[i] = v / np.linalg.norm(v)
        return out


SOURCES = {
    "libraries": {"numpy": {"url": "https://numpy.org/doc", "doc_type": "sphinx"}},
    "papers": {
        "attention": {"papers": {"1706.03762": {"title": "Attention Is All You Need",
                                                 "authors": ["Vaswani", "Shazeer", "Parmar", "More"],
                                                 "year": 2017}}}
    },
    "books": {"mlbook": {"url": "https://example.com/b.pdf"}},
}


@pytest.fixture
def data_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    save_user_sources(SOURCES, tmp_path / "sources.json")
    docs = tmp_path / "library_docs"
    lib = docs / "library_numpy"
    lib.mkdir(parents=True)
    (lib / "intro.md").write_text("# NumPy arrays\n\n" + "Array broadcasting rules. " * 200)
    (lib / "ufuncs.md").write_text("---\ntitle: Universal functions\n---\n\n" + "ufunc dispatch. " * 150)
    papers = docs / "papers_attention"
    papers.mkdir(parents=True)
    (papers / "1706_03762.md").write_text("Transformer attention. " * 100)
    return tmp_path


def test_sources_roundtrip(data_env):
    s = load_user_sources()
    assert set(list_all_modules(s)) == {"numpy", "attention", "mlbook"}
    assert get_document_type_for_module(s, "numpy") is DocumentType.LIBRARY
    assert get_document_type_for_module(s, "attention") is DocumentType.PAPERS
    assert get_document_type_for_module(s, "mlbook") is DocumentType.BOOK


def test_yaml_header_and_authors():
    assert parse_yaml_header("---\ntitle: X\nyear: 2020\n---\nbody")["title"] == "X"
    assert parse_yaml_header("no header") == {}
    assert format_authors(["A"]) == "A"
    assert format_authors(["A", "B", "C", "D"]) == "A et al."


def test_extract_metadata_paths(data_env):
    s = load_user_sources()
    m = extract_metadata("text", "1706_03762.md", "attention", DocumentType.PAPERS, s)
    assert m["arxiv_id"] == "1706.03762"
    assert m["title"] == "Attention Is All You Need"
    assert m["authors"] == "Vaswani et al."
    m2 = extract_metadata("x", "intro.md", "numpy", DocumentType.LIBRARY, s)
    assert m2["source_url"] == "https://numpy.org/doc"
    m3 = extract_metadata("x", "03_chapter_3_linear_models.md", "mlbook", DocumentType.BOOK, s)
    assert m3["chapter"] == 3
    # YAML header overrides
    m4 = extract_metadata("---\ntitle: Override\n---\n", "intro.md", "numpy", DocumentType.LIBRARY, s)
    assert m4["title"] == "Override"


def test_build_module_end_to_end(data_env, tiny_tokenizer):
    emb = FakeEmbedder(tiny_tokenizer)
    ok = build_module(
        "numpy",
        emb,
        library_docs_dir=data_env / "library_docs",
        indexes_dir=data_env / "indexes",
        sources=load_user_sources(),
        embedding_model="BAAI/bge-m3",
        chunk_sizes=[128, 32],
        chunk_overlap=8,
    )
    assert ok
    idx_dir = data_env / "indexes" / "bge-m3" / "library_numpy"
    assert VectorIndex.is_valid(idx_dir)
    idx = VectorIndex.load(idx_dir)
    assert idx.n_alive > 0
    assert idx.metadata["embedding_model"] == "BAAI/bge-m3"
    assert idx.metadata["chunking_strategy"] == "hierarchical"
    # metadata flowed into nodes
    some_leaf = next(idx.store.leaves())
    assert some_leaf.metadata["doc_type"] == "library"
    assert some_leaf.metadata["source_url"] == "https://numpy.org/doc"

    # enumeration helpers
    assert list_available_models(data_env / "indexes") == ["bge-m3"]
    assert list_modules_for_model(data_env / "indexes", "BAAI/bge-m3") == ["library_numpy"]
    assert resolve_model_id("bge-m3", ["BAAI/bge-m3"]) == "BAAI/bge-m3"


def test_build_module_missing_docs(data_env, tiny_tokenizer):
    ok = build_module(
        "mlbook",
        FakeEmbedder(tiny_tokenizer),
        library_docs_dir=data_env / "library_docs",
        indexes_dir=data_env / "indexes",
        sources=load_user_sources(),
    )
    assert not ok


def test_build_cli(data_env, monkeypatch, tiny_tokenizer):
    import tensortruth_tpu.build_db as build_db
    from tensortruth_tpu.models import manager as mgr_mod

    class FakeManager:
        def get_embedder(self, spec=None):
            return FakeEmbedder(tiny_tokenizer)

    monkeypatch.setattr(mgr_mod.ModelManager, "get_instance", staticmethod(lambda: FakeManager()))
    rc = build_db.main(["--modules", "numpy", "--chunk-sizes", "128", "32", "--chunk-overlap", "8"])
    assert rc == 0
    assert VectorIndex.is_valid(data_env / "indexes" / "bge-m3" / "library_numpy")
    # unknown module fails
    rc = build_db.main(["--modules", "nope"])
    assert rc == 1


def test_load_documents_filters(tmp_path):
    (tmp_path / "a.md").write_text("hello")
    (tmp_path / "b.bin").write_bytes(b"\x00\x01")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "c.txt").write_text("world")
    docs = load_documents(tmp_path)
    assert [f for f, _ in docs] == ["a.md", "sub/c.txt"]


def test_gelu_flavor_recorded_in_index_metadata(tiny_tokenizer):
    """Advisor r2: the encoder's GELU variant is stamped into index metadata
    so old-index/new-query math mismatches are detectable at engine load."""
    from tensortruth_tpu.index.chunker import chunk_document
    from tensortruth_tpu.index.store import VectorIndex

    nodes = chunk_document(
        "alpha beta gamma. " * 30, tiny_tokenizer, doc_id="d",
        chunk_sizes=[64, 16], chunk_overlap=4,
    )
    idx = VectorIndex.build(
        nodes,
        lambda texts: np.ones((len(texts), 8), np.float32),
        embedding_model="BAAI/bge-m3",
        gelu_flavor="exact",
    )
    assert idx.metadata["gelu"] == "exact"


def test_embedder_exposes_gelu_flavor():
    from tensortruth_tpu.models.embedder import Embedder
    from tensortruth_tpu.models.xlmr import XLMRConfig

    class _Tok:
        pass

    tiny = XLMRConfig(
        vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position=40,
    )
    emb = Embedder.random_init(tiny, _Tok())
    assert emb.gelu_flavor in ("tanh", "exact")
    # CPU test backend → exact by default (TPU flips to tanh)
    assert emb.gelu_flavor == "exact"
