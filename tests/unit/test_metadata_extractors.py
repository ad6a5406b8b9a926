"""Doc-type metadata extraction (reference utils/metadata.py:95-695)."""

import pytest

from tensortruth_tpu.indexing.metadata import (
    extract_arxiv_metadata_from_config,
    extract_book_chapter_metadata,
    extract_library_module_metadata,
    extract_metadata_with_llm,
    format_authors,
    parse_yaml_header,
)


def test_format_authors_variants():
    assert format_authors(["A. One"]) == "A. One"
    assert format_authors(["A. One", "B. Two"]) == "A. One, B. Two"
    assert format_authors(["A", "B", "C"]) == "A, B, C"
    assert format_authors([f"A{i}" for i in range(8)]) == "A0 et al."
    assert format_authors([]) == ""
    assert format_authors("Single String") == "Single String"


def test_yaml_header_parsing():
    text = "---\ntitle: My Doc\nurl: https://x\n---\nbody text"
    meta = parse_yaml_header(text)
    assert meta["title"] == "My Doc"
    assert meta["url"] == "https://x"
    assert parse_yaml_header("no header here") == {}


def test_book_chapter_metadata_from_filename():
    meta = extract_book_chapter_metadata("03_Linear_Algebra_deep-learning.md", "deep-learning")
    assert meta["doc_type"] == "book"
    assert meta["chapter"] == 3
    assert "Linear Algebra" in meta["title"]


def test_book_chapter_leading_number_bounded():
    """A leading 4+ digit number is a year, not a chapter index (code-review
    r3: '2024_annual_report.md' was stamped chapter 2024). Scraper indices
    are small and zero-padded; explicit 'chapter_NNNN' still wins."""
    meta = extract_book_chapter_metadata("2024_annual_report.md", "reports")
    assert "chapter" not in meta
    meta = extract_book_chapter_metadata("123_Appendix_book.md", "book")
    assert meta["chapter"] == 123
    meta = extract_book_chapter_metadata("chapter_2024_outlook.md", "book")
    assert meta["chapter"] == 2024  # explicit marker is trusted at any width


def test_arxiv_metadata_from_config():
    sources = {"papers": {"ml": {"papers": {
        "1706.03762": {"title": "Attention Is All You Need",
                        "authors": ["Vaswani", "et al"], "year": 2017}}}}}
    meta = extract_arxiv_metadata_from_config("1706.03762.md", "ml", sources)
    assert meta["title"] == "Attention Is All You Need"
    assert meta["arxiv_id"] == "1706.03762"
    # unknown id degrades gracefully (doc_type/category still stamped)
    meta2 = extract_arxiv_metadata_from_config("9999.md", "ml", sources)
    assert meta2["category"] == "ml" and "title" not in meta2


def test_library_module_metadata():
    sources = {"libraries": {"numpy": {"url": "https://numpy.org/doc",
                                        "doc_type": "sphinx"}}}
    meta = extract_library_module_metadata("numpy.linalg.svd.md", "numpy", sources)
    assert meta["library"] == "numpy"
    assert meta["source_url"] == "https://numpy.org/doc"
    assert meta["doc_format"] == "sphinx"


def test_llm_metadata_extraction_and_fallback():
    class GoodLLM:
        def complete(self, prompt):
            return '{"title": "Found Title", "authors": ["X"], "year": 2024}'

    meta = extract_metadata_with_llm("some paper text", GoodLLM())
    assert meta["title"] == "Found Title"

    class BadLLM:
        def complete(self, prompt):
            return "not json at all"

    assert extract_metadata_with_llm("text", BadLLM()) == {}

    class BoomLLM:
        def complete(self, prompt):
            raise RuntimeError("down")

    assert extract_metadata_with_llm("text", BoomLLM()) == {}
