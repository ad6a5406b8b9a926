"""Scraper parsing logic with local fixtures (no network)
(reference scrapers tests analog)."""

import zlib

import pytest

from tensortruth_tpu.scrapers.common import url_to_filename
from tensortruth_tpu.scrapers.sphinx import parse_inventory_v2, WANTED_ROLES
from tensortruth_tpu.utils.validation import (
    validate_library_config,
    validate_module_for_build,
    validate_sources,
)
from tensortruth_tpu.web.html2md import extract_title, html_to_markdown


def _make_inventory(entries):
    header = (
        b"# Sphinx inventory version 2\n"
        b"# Project: test\n"
        b"# Version: 1.0\n"
        b"# The remainder of this file is compressed using zlib.\n"
    )
    payload = "\n".join(
        f"{name} {domain}:{role} 1 {uri} -" for name, domain, role, uri in entries
    ).encode()
    return header + zlib.compress(payload)


def test_parse_inventory_v2():
    inv = _make_inventory(
        [
            ("numpy.array", "py", "function", "reference/generated/numpy.array.html"),
            ("numpy", "py", "module", "reference/index.html"),
            ("genindex", "std", "label", "genindex.html"),
            ("numpy.ndarray.shape", "py", "attribute", "x.html"),
            ("dollar.obj", "py", "class", "api/$"),
        ]
    )
    objects = parse_inventory_v2(inv)
    assert len(objects) == 5
    by_name = {o["name"]: o for o in objects}
    assert by_name["numpy.array"]["role"] == "function"
    assert by_name["dollar.obj"]["uri"] == "api/dollar.obj"  # $ expansion
    py_wanted = [o for o in objects if o["domain"] == "py" and o["role"] in WANTED_ROLES]
    assert {o["name"] for o in py_wanted} == {"numpy.array", "numpy", "dollar.obj"}


def test_parse_inventory_rejects_bad_header():
    with pytest.raises(ValueError):
        parse_inventory_v2(b"not an inventory\n\n\n\nxxxx")


def test_url_to_filename():
    assert url_to_filename("https://x.org/api/func.html") == "api_func.md"
    assert url_to_filename("https://x.org/") == "index.md"
    assert url_to_filename("https://x.org/a/b.md") == "a_b.md"


def test_html_to_markdown_structure():
    html = """
    <html><head><title>Doc Title</title></head><body>
    <nav>skip me</nav>
    <main>
      <h1>Heading</h1>
      <p>Some <strong>bold</strong> and <code>inline</code>.</p>
      <pre>code block</pre>
      <ul><li>one</li><li>two</li></ul>
      <a href="/rel">link</a>
      <table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td>2</td></tr></table>
    </main>
    <footer>skip too</footer></body></html>
    """
    md = html_to_markdown(html, base_url="https://x.org")
    assert "# Heading" in md
    assert "**bold**" in md
    assert "`inline`" in md
    assert "```\ncode block\n```" in md
    assert "- one" in md and "- two" in md
    assert "[link](https://x.org/rel)" in md
    assert "| A | B |" in md
    assert "skip me" not in md and "skip too" not in md
    assert extract_title(html) == "Doc Title"


def test_validate_library_config():
    assert validate_library_config({"inventory_url": "https://numpy.org/doc/objects.inv"}) is None
    assert validate_library_config({}) is not None
    assert validate_library_config({"doc_type": "doxygen", "doc_root": "https://docs.opencv.org/4.x/"}) is None
    assert validate_library_config({"doc_type": "doxygen"}) is not None


def test_validate_sources_report(tmp_path):
    sources = {"libraries": {"numpy": {}}, "papers": {}, "books": {}}
    docs = tmp_path / "docs"
    report = validate_sources(sources, docs)
    assert not report["modules"]["numpy"]["ok"]

    lib = docs / "library_numpy"
    lib.mkdir(parents=True)
    (lib / "a.md").write_text("x")
    (docs / "library_orphan").mkdir()
    report = validate_sources(sources, docs)
    assert report["modules"]["numpy"]["ok"]
    assert report["orphaned_dirs"] == ["library_orphan"]


def test_fetch_sources_cli_list_add_validate(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.fetch_sources import main

    assert main(["add", "libraries", "numpy",
                 "--config", '{"inventory_url": "https://numpy.org/objects.inv"}']) == 0
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "numpy" in out
    # docs not fetched yet: incomplete, NOT an error (reference exit-code
    # semantics — the fix is to fetch, not to edit config)
    assert main(["validate"]) == 0
    out = capsys.readouterr().out
    assert "docs directory missing" in out
    # a schema error DOES fail validation
    assert main(["add", "books", "bad", "--config", "{}"]) == 0
    assert main(["validate"]) == 1
    assert "books.bad" in capsys.readouterr().out


def test_llm_metadata_extraction():
    from tensortruth_tpu.indexing.metadata import extract_metadata_with_llm

    class LLM:
        def complete(self, prompt):
            return 'Sure: {"title": "Deep Nets", "authors": "A One, B Two, C Three, D Four"}'

    out = extract_metadata_with_llm("some text", LLM())
    assert out["title"] == "Deep Nets"
    assert out["authors"] == "A One et al."

    class BadLLM:
        def complete(self, prompt):
            raise RuntimeError("offline")

    assert extract_metadata_with_llm("x", BadLLM()) == {}


def test_llama_cpp_display_name():
    from tensortruth_tpu.core.llama_cpp import format_display_name

    assert format_display_name("models/Qwen2.5-7B-Q4_K_M.gguf") == "Qwen2.5 7B Q4 K M"


def test_bundled_extension_catalog(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.extensions.loader import (
        get_extension_catalog,
        install_from_catalog,
        list_installed_extensions,
    )

    catalog = get_extension_catalog()
    assert any(e["name"] == "arxiv" for e in catalog)
    result = install_from_catalog("arxiv")
    assert result["status"] == "installed"
    assert any(e["filename"] == "arxiv.yaml" for e in list_installed_extensions())
    import pytest

    with pytest.raises(ValueError):
        install_from_catalog("nope")
