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
    assert validate_library_config({"doc_type": "sphinx", "inventory_url": "u"}) is None
    assert validate_library_config({"doc_type": "doxygen"})
    assert validate_library_config({"doc_type": "doxygen", "doc_root": "u"}) is None


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
