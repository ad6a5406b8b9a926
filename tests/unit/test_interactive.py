"""Interactive source wizard (scripted input, no network)."""

import pytest

from tensortruth_tpu.app.sources import load_user_sources
from tensortruth_tpu.utils.interactive import (
    add_book_interactive,
    add_library_interactive,
    interactive_add,
)


def scripted(answers):
    it = iter(answers)

    def input_fn(prompt):
        return next(it)

    return input_fn


def test_add_library_sphinx():
    name, cfg = add_library_interactive(
        scripted(["numpy_2.1", "sphinx", "https://numpy.org/objects.inv", "", ""])
    )
    assert name == "numpy_2.1"
    assert cfg == {"doc_type": "sphinx", "inventory_url": "https://numpy.org/objects.inv"}


def test_add_library_doxygen_requires_root():
    with pytest.raises(ValueError):
        add_library_interactive(scripted(["opencv", "doxygen", "", ""]))


def test_add_book_offline(monkeypatch):
    """Offline: metadata fetch fails gracefully, user supplies everything."""
    import requests

    monkeypatch.setattr(
        requests, "get", lambda *a, **k: (_ for _ in ()).throw(OSError("offline"))
    )
    name, cfg = add_book_interactive(
        scripted(["https://x/b.pdf", "ML Book", "A. Author, B. Writer", "", "20"]),
        print_fn=lambda *a: None,
    )
    assert name == "ml_book"  # key derived from confirmed title
    assert cfg == {
        "url": "https://x/b.pdf",
        "title": "ML Book",
        "authors": ["A. Author", "B. Writer"],
        "pages_per_chunk": 20,
    }


def test_add_book_extracts_pdf_metadata(monkeypatch):
    """PDF Info dict title/authors become the prompt defaults."""
    import requests

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Title (Deep Retrieval) /Author (Ada Lovelace; Alan Turing) >>\nendobj\n"
        b"trailer << /Info 1 0 R >>\n%%EOF"
    )

    class R:
        content = pdf

        def raise_for_status(self):
            pass

    monkeypatch.setattr(requests, "get", lambda *a, **k: R())
    printed = []
    name, cfg = add_book_interactive(
        scripted(["https://x/b.pdf", "", "", "", ""]),  # accept all defaults
        print_fn=printed.append,
    )
    assert cfg["title"] == "Deep Retrieval"
    assert cfg["authors"] == ["Ada Lovelace", "Alan Turing"]
    assert name == "deep_retrieval"
    assert any("detected title" in p for p in printed)


def test_validate_arxiv_id():
    from tensortruth_tpu.utils.interactive import validate_arxiv_id

    assert validate_arxiv_id("2101.00001") == "2101.00001"
    assert validate_arxiv_id("2101.00001v3") == "2101.00001"
    assert validate_arxiv_id("https://arxiv.org/abs/1706.03762") == "1706.03762"
    assert validate_arxiv_id("https://arxiv.org/pdf/1706.03762.pdf") == "1706.03762"
    assert validate_arxiv_id("math.GT/0309136") == "math.GT/0309136"
    assert validate_arxiv_id("not-an-id") is None
    assert validate_arxiv_id("12.34") is None


def test_sanitize_config_key():
    from tensortruth_tpu.utils.interactive import sanitize_config_key

    assert sanitize_config_key("NumPy 2.1 (dev)") == "NumPy_2.1_dev"
    assert sanitize_config_key("../../etc") == "etc"


def test_add_papers_with_metadata(monkeypatch):
    from tensortruth_tpu.utils import interactive as mod
    import tensortruth_tpu.web.search as search_mod

    monkeypatch.setattr(
        search_mod, "fetch_arxiv_metadata",
        lambda aid: {"arxiv_id": aid, "title": f"Paper {aid}", "authors": ["X"],
                     "year": "2017", "summary": ""},
    )
    printed = []
    name, cfg = mod.add_papers_interactive(
        scripted(["attention", "1706.03762, bad-id 2101.00001v2", ""]),
        print_fn=printed.append,
    )
    assert name == "attention"
    assert set(cfg["papers"]) == {"1706.03762", "2101.00001"}
    assert cfg["papers"]["1706.03762"]["title"] == "Paper 1706.03762"
    assert cfg["papers"]["1706.03762"]["year"] == "2017"
    assert any("not a valid arXiv id: bad-id" in p for p in printed)


def test_interactive_add_saves(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    interactive_add(
        scripted(["libraries", "jax_0.9", "sphinx", "https://jax.dev/objects.inv", "", ""])
    )
    sources = load_user_sources()
    assert "jax_0.9" in sources["libraries"]


def test_interactive_add_honors_sources_path(tmp_path, monkeypatch):
    """--sources-config must reach the wizard (code-review r3: the wizard
    always saved to the default path, silently ignoring the override)."""
    import json

    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path / "default"))
    alt = tmp_path / "alt_sources.json"
    interactive_add(
        scripted(["libraries", "altlib", "sphinx", "https://x/objects.inv", "", ""]),
        sources_path=alt,
    )
    assert alt.exists()
    assert "altlib" in json.loads(alt.read_text())["libraries"]
    assert not (tmp_path / "default" / "sources.json").exists()
