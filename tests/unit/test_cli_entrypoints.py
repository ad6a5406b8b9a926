"""CLI entry points: tensor-truth-tpu-build and tensor-truth-tpu-docs
(reference build_db.py, fetch_sources.py, utils/validation.py) driven
end-to-end against a tmp data dir with the tiny test models."""

import json

import pytest

from tensortruth_tpu import build_db, fetch_sources
from tensortruth_tpu.utils.validation import (
    validate_library_config,
    validate_module_for_build,
    validate_sources,
)


@pytest.fixture
def data_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.app.config import TensorTruthTPUConfig, save_config

    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.use_fused_topk = False
    save_config(cfg)
    sources = {
        "libraries": {},
        "papers": {"micro": {"papers": ["1234.0001"]}},
        "books": {},
    }
    (tmp_path / "sources.json").write_text(json.dumps(sources))
    docs = tmp_path / "library_docs" / "papers_micro"
    docs.mkdir(parents=True)
    (docs / "p1.md").write_text("# Paper\n\n" + "retrieval on TPUs. " * 120)
    return tmp_path


# ----------------------------------------------------------------- validation


def test_validate_module_for_build_reports_each_failure(tmp_path):
    sources = {"libraries": {"lib": {"url": "x"}}, "papers": {}, "books": {}}
    assert "not found" in validate_module_for_build("ghost", sources, tmp_path)
    assert "missing" in validate_module_for_build("lib", sources, tmp_path)
    d = tmp_path / "library_lib"
    d.mkdir()
    assert "empty" in validate_module_for_build("lib", sources, tmp_path)
    (d / "a.md").write_text("content")
    assert validate_module_for_build("lib", sources, tmp_path) is None


def test_validate_sources_flags_orphans(tmp_path):
    sources = {"libraries": {}, "papers": {}, "books": {}}
    (tmp_path / "papers_stray").mkdir(parents=True)
    report = validate_sources(sources, tmp_path)
    assert report["orphaned_dirs"] == ["papers_stray"]


def test_validate_library_config():
    assert validate_library_config({"doc_type": "sphinx"})
    assert validate_library_config({"doc_type": "sphinx", "inventory_url": "https://numpy.org/doc/objects.inv"}) is None
    assert validate_library_config({"doc_type": "doxygen"})
    assert validate_library_config({"doc_type": "doxygen", "doc_root": "https://docs.opencv.org/4.x/"}) is None


# ------------------------------------------------------------------- build_db


def test_build_db_builds_module_and_writes_index(data_env):
    from tensortruth_tpu.models.manager import ModelManager

    ModelManager.reset_instance()
    rc = build_db.main(["--modules", "micro", "--embedding-model", "tiny-embedder"])
    assert rc == 0
    idx = data_env / "indexes" / "tiny-embedder" / "papers_micro"
    assert (idx / "index_metadata.json").exists()
    meta = json.loads((idx / "index_metadata.json").read_text())
    assert meta["embedding_model"] == "tiny-embedder"
    ModelManager.reset_instance()


def test_build_db_unknown_module_fails_fast(data_env):
    assert build_db.main(["--modules", "ghost"]) == 1


def test_build_db_requires_selection(data_env, capsys):
    with pytest.raises(SystemExit):
        build_db.main([])


def test_build_db_papers_selector_picks_configured_modules(data_env, monkeypatch):
    seen = []
    monkeypatch.setattr(
        build_db, "build_module", lambda m, *a, **k: seen.append(m) or True
    )

    class NullEmbedder:
        pass

    from tensortruth_tpu.models.manager import ModelManager

    monkeypatch.setattr(
        ModelManager, "get_embedder", lambda self, spec, mesh=None: NullEmbedder()
    )
    rc = build_db.main(["--papers", "--embedding-model", "tiny-embedder"])
    assert rc == 0 and seen == ["micro"]


# -------------------------------------------------------------- fetch_sources


def test_fetch_sources_list_and_validate(data_env, capsys):
    assert fetch_sources.main(["list"]) == 0
    out = capsys.readouterr().out
    assert "micro" in out
    assert fetch_sources.main(["validate"]) == 0


def test_fetch_sources_add_updates_sources_json(data_env):
    rc = fetch_sources.main(
        [
            "add",
            "libraries",
            "mylib",
            "--config",
            json.dumps({"doc_type": "sphinx", "inventory_url": "http://x/objects.inv"}),
        ]
    )
    assert rc == 0
    sources = json.loads((data_env / "sources.json").read_text())
    assert "mylib" in sources["libraries"]


def test_fetch_sources_add_rejects_invalid_config(data_env):
    rc = fetch_sources.main(
        ["add", "libraries", "badlib", "--config", json.dumps({"doc_type": "sphinx"})]
    )
    assert rc != 0
    sources = json.loads((data_env / "sources.json").read_text())
    assert "badlib" not in sources["libraries"]


# ------------------------------------------------------ arxiv metadata shapes


def test_arxiv_metadata_accepts_list_and_dict_paper_configs():
    """sources.json allows papers as a bare id list or an id->info dict
    (both shapes accepted by scrapers/arxiv.py fetch_paper_category)."""
    from tensortruth_tpu.indexing.metadata import extract_arxiv_metadata_from_config

    as_list = {"papers": {"cat": {"papers": ["1234.0001"]}}}
    meta = extract_arxiv_metadata_from_config("1234_0001.md", "cat", as_list)
    assert meta["arxiv_id"] == "1234.0001"

    as_dict = {
        "papers": {
            "cat": {"papers": {"1234.0001": {"title": "T", "year": 2024}}}
        }
    }
    meta = extract_arxiv_metadata_from_config("1234_0001.md", "cat", as_dict)
    assert meta["title"] == "T" and meta["year"] == 2024

    # unknown file → category metadata only, no crash
    meta = extract_arxiv_metadata_from_config("other.md", "cat", as_list)
    assert "arxiv_id" not in meta and meta["category"] == "cat"


# --------------------------------------------- reference CLI flag parity (r3)


def test_build_db_no_validate_and_path_overrides(data_env, tmp_path, monkeypatch):
    """--no-validate + --library-docs-dir/--indexes-dir/--sources-config
    (reference build_db.py:57-88,166): ad-hoc layouts build without
    sources.json validation, into an explicit indexes dir."""
    alt = tmp_path / "alt"
    docs = alt / "docs" / "papers_solo"
    docs.mkdir(parents=True)
    (docs / "d.md").write_text("alt layout doc " * 100)
    (alt / "sources.json").write_text(
        json.dumps({"libraries": {}, "papers": {"solo": {"papers": []}}, "books": {}})
    )
    from tensortruth_tpu.models.manager import ModelManager

    ModelManager.reset_instance()
    rc = build_db.main([
        "--modules", "solo", "--embedding-model", "tiny-embedder",
        "--no-validate",
        "--library-docs-dir", str(alt / "docs"),
        "--sources-config", str(alt / "sources.json"),
        "--indexes-dir", str(alt / "idx"),
    ])
    assert rc == 0
    assert (alt / "idx" / "tiny-embedder" / "papers_solo" / "index_metadata.json").exists()
    ModelManager.reset_instance()


def test_build_db_extensions_flag_filters_files(data_env, monkeypatch):
    """--extensions restricts the indexed file set (reference --extensions)."""
    docs = data_env / "library_docs" / "papers_micro"
    (docs / "skipme.rst").write_text("rst content " * 50)
    captured = {}

    def fake_build(m, embedder, **kw):
        captured.update(kw)
        return True

    monkeypatch.setattr(build_db, "build_module", fake_build)

    class NullEmbedder:
        pass

    from tensortruth_tpu.models.manager import ModelManager

    monkeypatch.setattr(
        ModelManager, "get_embedder", lambda self, spec, mesh=None: NullEmbedder()
    )
    rc = build_db.main([
        "--modules", "micro", "--embedding-model", "tiny-embedder",
        "--extensions", ".md",
    ])
    assert rc == 0 and captured["extensions"] == [".md"]


def test_load_documents_extensions_and_pdf(tmp_path):
    from test_pdf_toc import _make_pdf

    from tensortruth_tpu.indexing.builder import load_documents

    (tmp_path / "a.md").write_text("markdown doc")
    (tmp_path / "b.rst").write_text("rst doc")
    docs = load_documents(tmp_path, [".md"])
    assert [n for n, _ in docs] == ["a.md"]
    (tmp_path / "c.pdf").write_bytes(_make_pdf(["pdf page text"]))
    docs = load_documents(tmp_path, [".md", ".pdf"])
    names = [n for n, _ in docs]
    assert "c.pdf" in names and "b.rst" not in names
    assert "pdf page text" in dict(docs)["c.pdf"]
    # extension names normalize without the leading dot
    docs = load_documents(tmp_path, ["md"])
    assert [n for n, _ in docs] == ["a.md"]


def test_fetch_sources_structured_add_flags(data_env):
    """--url/--type/--arxiv-ids structured add (reference non-interactive
    add flags) compose into the section config without JSON."""
    rc = fetch_sources.main([
        "add", "libraries", "structlib",
        "--url", "http://x/objects.inv", "--type", "sphinx",
    ])
    assert rc == 0
    sources = json.loads((data_env / "sources.json").read_text())
    assert sources["libraries"]["structlib"]["inventory_url"] == "http://x/objects.inv"

    rc = fetch_sources.main([
        "add", "papers", "newcat", "--arxiv-ids", "1234.0001", "2345.0002",
    ])
    assert rc == 0
    sources = json.loads((data_env / "sources.json").read_text())
    assert set(sources["papers"]["newcat"]["papers"]) == {"1234.0001", "2345.0002"}


def test_fetch_sources_add_interactive_when_no_args(data_env, monkeypatch):
    called = {}
    import tensortruth_tpu.utils.interactive as interactive

    monkeypatch.setattr(
        interactive, "interactive_add", lambda *a, **k: called.setdefault("yes", True)
    )
    rc = fetch_sources.main(["add"])
    assert rc == 0 and called.get("yes")


def test_fetch_sources_fetch_passes_scraper_knobs(data_env, monkeypatch):
    """--workers/--min-size reach scrape_library; --pages-per-chunk/
    --max-pages-per-chapter reach fetch_book."""
    seen = {}

    def fake_scrape(name, cfg, docs_dir, **kw):
        seen["lib"] = kw
        return True

    def fake_book(name, cfg, docs_dir, **kw):
        seen["book"] = (cfg, kw)
        return True

    import tensortruth_tpu.scrapers.book as book
    import tensortruth_tpu.scrapers.library as library

    monkeypatch.setattr(library, "scrape_library", fake_scrape)
    monkeypatch.setattr(book, "fetch_book", fake_book)

    sources = json.loads((data_env / "sources.json").read_text())
    sources["libraries"]["lib1"] = {"doc_type": "sphinx", "inventory_url": "http://x"}
    sources["books"]["bk1"] = {"url": "http://b.pdf"}
    (data_env / "sources.json").write_text(json.dumps(sources))

    rc = fetch_sources.main([
        "fetch", "--modules", "lib1", "bk1",
        "--workers", "3", "--min-size", "99",
        "--pages-per-chunk", "7", "--max-pages-per-chapter", "11",
    ])
    assert rc == 0
    assert seen["lib"] == {"max_workers": 3, "min_size": 99}
    book_cfg, book_kw = seen["book"]
    assert book_kw["pages_per_chunk"] == 7
    assert book_cfg["max_pages_per_chapter"] == 11
