"""Per-type sources.json validation taxonomy
(reference utils/validation.py:52-394 failure cases)."""

import pytest

from tensortruth_tpu.utils.validation import (
    validate_entry,
    validate_sources,
    validate_sources_schema,
    validate_url,
    validate_url_format,
)

GOOD_SPHINX = {"doc_type": "sphinx", "inventory_url": "https://numpy.org/doc/objects.inv", "version": "2.1"}
GOOD_DOXYGEN = {"doc_type": "doxygen", "doc_root": "https://docs.opencv.org/4.x/", "version": "4.10"}
GOOD_PAPERS = {"papers": {"1706.03762": {"title": "Attention"}}}
GOOD_BOOK = {"url": "https://example.com/book.pdf", "use_toc": True, "pages_per_chunk": 12}


@pytest.mark.parametrize(
    "url,ok",
    [
        ("https://numpy.org/doc/objects.inv", True),
        ("http://localhost:8080/docs", True),
        ("http://192.168.0.1/x", True),
        ("https://sub.domain-x.io/path?q=1#frag", True),
        ("ftp://numpy.org/x", False),
        ("numpy.org/doc", False),
        ("https://", False),
        ("not a url", False),
        ("", False),
        (None, False),
    ],
)
def test_url_format_taxonomy(url, ok):
    assert validate_url_format(url) is ok
    if not ok:
        # the reachability layer must not mask a format failure
        assert validate_url(url or "", check_reachable=False) is False


@pytest.mark.parametrize(
    "section,cfg,fragment",
    [
        # libraries
        ("libraries", {"doc_type": "mkdocs"}, "unknown doc_type"),
        ("libraries", {"doc_type": "sphinx"}, "needs 'inventory_url'"),
        ("libraries", {"doc_type": "doxygen"}, "needs 'doc_root'"),
        ("libraries", {"doc_type": "sphinx", "inventory_url": "nope"}, "not a valid http(s) URL"),
        ("libraries", "just-a-string", "must be an object"),
        # papers
        ("papers", {"papers": {"not-an-id": {}}}, "not a valid arXiv id"),
        ("papers", {"papers": "1706.03762"}, "must be a list or map"),
        ("papers", {"papers": {"1706.03762": {}}, "converter": "magic"}, "unknown converter"),
        # books
        ("books", {}, "needs 'url'"),
        ("books", {"url": "example.com/b.pdf"}, "not a valid http(s) URL"),
        ("books", {"url": "https://e.com/b.pdf", "use_toc": "yes"}, "'use_toc' must be true/false"),
        ("books", {"url": "https://e.com/b.pdf", "pages_per_chunk": 0}, "positive integer"),
        ("books", {"url": "https://e.com/b.pdf", "max_pages_per_chapter": -3}, "positive integer"),
        ("books", {"url": "https://e.com/b.pdf", "split_method": "chapters"}, "unknown split_method"),
        ("books", {"url": "https://e.com/b.pdf", "converter": "magic"}, "unknown converter"),
    ],
)
def test_entry_error_taxonomy(section, cfg, fragment):
    errors, _ = validate_entry(section, "m", cfg)
    assert any(fragment in e for e in errors), errors
    assert all(e.startswith(f"{section}.m:") for e in errors)


@pytest.mark.parametrize(
    "section,cfg,fragment",
    [
        ("libraries", {"type": "sphinx", "inventory_url": "https://x.org/objects.inv"}, "deprecated"),
        ("libraries", GOOD_SPHINX | {"version": ""}, "no 'version' pin"),
        ("papers", {"papers": {}}, "empty category"),
    ],
)
def test_entry_warning_taxonomy(section, cfg, fragment):
    errors, warnings = validate_entry(section, "m", cfg)
    assert not errors, errors
    assert any(fragment in w for w in warnings), warnings


@pytest.mark.parametrize(
    "section,cfg",
    [
        ("libraries", GOOD_SPHINX),
        ("libraries", GOOD_DOXYGEN),
        ("papers", GOOD_PAPERS),
        ("papers", {"papers": ["1706.03762", "hep-th/9901001"]}),
        ("books", GOOD_BOOK),
        ("books", {"pdf_url": "https://e.com/b.pdf", "split_method": "pages"}),
    ],
)
def test_good_entries_are_clean(section, cfg):
    errors, _ = validate_entry(section, "m", cfg)
    assert errors == []


def test_schema_sweep_flags_cross_section_duplicates():
    sources = {
        "libraries": {"numpy": dict(GOOD_SPHINX)},
        "papers": {"numpy": dict(GOOD_PAPERS)},
        "books": {},
    }
    report = validate_sources_schema(sources)
    assert any("duplicate module name" in e for e in report["errors"])


def test_full_report_cross_checks_filesystem(tmp_path):
    """errors fail validation; missing docs are incomplete, not an error
    (reference exit-code semantics :253-263)."""
    docs = tmp_path / "library_docs"
    docs.mkdir()
    (docs / "library_numpy").mkdir()
    (docs / "library_numpy" / "a.md").write_text("x")
    (docs / "stray_dir").mkdir()
    sources = {
        "libraries": {
            "numpy": dict(GOOD_SPHINX),
            "torch": dict(GOOD_SPHINX),  # configured, no docs on disk
        },
        "papers": {},
        "books": {},
    }
    report = validate_sources(sources, docs)
    assert report["ok"] is True  # no schema errors -> valid-but-incomplete
    assert report["modules"]["numpy"]["ok"] is True
    assert report["modules"]["torch"]["ok"] is False
    assert "missing" in report["modules"]["torch"]["error"]
    assert report["orphaned_dirs"] == ["stray_dir"]
    assert "1/2 sources have docs" in report["summary"]

    sources["books"]["bad"] = {}  # schema error -> validation fails
    report = validate_sources(sources, docs)
    assert report["ok"] is False
    assert any("books.bad" in e for e in report["errors"])


def test_missing_docs_dir_is_a_warning(tmp_path):
    report = validate_sources({"libraries": {}, "papers": {}, "books": {}}, tmp_path / "nope")
    assert report["ok"] is True
    assert any("does not exist" in w for w in report["warnings"])
