"""HTML→markdown conversion quality, query condensation fallback, and the
stage-timing observability layer (reference utils/web_search.py:699-903,
utils/history_condenser.py, SURVEY.md §5.1)."""

import pytest

from tensortruth_tpu.services.condenser import condense_query
from tensortruth_tpu.utils.profiling import StageTimer, device_trace
from tensortruth_tpu.web.html2md import extract_title, html_to_markdown

# ------------------------------------------------------------------- html2md

PAGE = """
<html><head><title> My Doc </title><style>p{color:red}</style></head>
<body>
  <nav>Home | About</nav>
  <div class="cookie-banner">Accept cookies</div>
  <main>
    <h1>Guide</h1>
    <p>Intro with <strong>bold</strong>, <em>italic</em> and <code>x = 1</code>.</p>
    <pre><code>def f():
    return 2</code></pre>
    <ul><li>alpha</li><li>beta <a href="/docs">docs</a></li></ul>
    <ol><li>first</li><li>second</li></ol>
    <img src="/logo.png" alt="logo">
    <blockquote>quoted wisdom</blockquote>
    <table><tr><th>k</th><th>v</th></tr><tr><td>a</td><td>1</td></tr></table>
  </main>
  <footer>copyright</footer>
  <script>alert(1)</script>
</body></html>
"""


def test_noise_stripped_and_structure_preserved():
    md = html_to_markdown(PAGE, base_url="https://ex.com")
    assert "Accept cookies" not in md and "alert(1)" not in md
    assert "Home | About" not in md and "copyright" not in md
    assert "# Guide" in md
    assert "**bold**" in md and "*italic*" in md and "`x = 1`" in md
    assert "```\ndef f():\n    return 2\n```" in md


def test_lists_links_images_resolve_relative_urls():
    md = html_to_markdown(PAGE, base_url="https://ex.com")
    assert "- alpha" in md
    assert "[docs](https://ex.com/docs)" in md
    assert "1. first" in md and "2. second" in md
    assert "![logo](https://ex.com/logo.png)" in md


def test_blockquote_and_table_render():
    md = html_to_markdown(PAGE)
    assert "> quoted wisdom" in md
    assert "| k | v |" in md and "| --- | --- |" in md and "| a | 1 |" in md


def test_main_content_preferred_over_body():
    html = "<body><p>outside</p><article><p>inside</p></article></body>"
    md = html_to_markdown(html)
    assert "inside" in md and "outside" not in md


def test_extract_title_falls_back_to_h1():
    assert extract_title(PAGE) == "My Doc"
    assert extract_title("<body><h1>H1 Title</h1></body>") == "H1 Title"
    assert extract_title("<body><p>none</p></body>") == ""


def test_whitespace_collapsed_no_triple_newlines():
    md = html_to_markdown(PAGE)
    assert "\n\n\n" not in md
    assert not md.startswith("\n") and not md.endswith("\n")


# ----------------------------------------------------------------- condenser


class FakeLLM:
    def __init__(self, reply=None, err=None):
        self.reply, self.err = reply, err
        self.prompts = []

    def complete(self, prompt):
        self.prompts.append(prompt)
        if self.err:
            raise self.err
        return self.reply


def test_condense_skips_empty_history():
    llm = FakeLLM(reply="never used")
    assert condense_query(llm, "   ", "what is it?") == "what is it?"
    assert llm.prompts == []


def test_condense_uses_llm_and_includes_entities():
    llm = FakeLLM(reply="what does fused_topk in ops/topk.py return?")
    out = condense_query(llm, "user: tell me about ops/topk.py", "what does it return?")
    assert out == "what does fused_topk in ops/topk.py return?"
    assert "ops/topk.py" in llm.prompts[0]  # history fed to the prompt


def test_condense_falls_back_on_error_and_empty():
    q = "original q"
    assert condense_query(FakeLLM(err=RuntimeError("down")), "h", q) == q
    assert condense_query(FakeLLM(reply="   "), "h", q) == q
    with pytest.raises(RuntimeError):
        condense_query(FakeLLM(err=RuntimeError("down")), "h", q, fallback_on_error=False)


# ----------------------------------------------------------------- profiling


def test_stage_timer_accumulates_and_totals():
    t = StageTimer()
    with t.stage("embed"):
        pass
    with t.stage("embed"):  # same stage twice accumulates
        pass
    with t.stage("rerank"):
        pass
    d = t.to_dict()
    assert set(d) == {"embed", "rerank", "total_ms"}
    assert d["total_ms"] == round(d["embed"] + d["rerank"], 2)


def test_stage_timer_records_on_exception():
    t = StageTimer()
    with pytest.raises(ValueError):
        with t.stage("boom"):
            raise ValueError("x")
    assert "boom" in t.timings_ms


def test_device_trace_noop_without_dir():
    with device_trace(None):
        pass  # must not require jax.profiler


def test_device_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    with device_trace(str(tmp_path)):
        jnp.ones((4,)).block_until_ready()
    assert list(tmp_path.rglob("*")), "profiler should write trace files"


def test_stage_timer_nested_and_dict():
    import time

    from tensortruth_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("outer"):
        time.sleep(0.01)
    with t.stage("second"):
        pass
    d = t.to_dict()
    assert set(d) == {"outer", "second", "total_ms"}
    assert d["outer"] >= 10.0  # ms
    assert d["second"] >= 0.0
    assert d["total_ms"] >= d["outer"]


def test_device_trace_noop_without_dir(tmp_path):
    from tensortruth_tpu.utils.profiling import device_trace

    with device_trace(None):  # no-op context
        pass
    # with a dir it starts/stops the JAX profiler (smoke — trace files
    # appear only on real device work, which CPU tests may skip)
    with device_trace(str(tmp_path)):
        pass


def test_format_link_suggestions_output():
    from tensortruth_tpu.web.links import format_link_suggestions

    metas = [
        {"anchor_text": "Docs", "url": "https://x/docs", "title": "X Docs",
         "description": "All the docs", "fetchable": True},
        {"anchor_text": "Blog", "url": "https://x/blog", "title": "",
         "description": "", "fetchable": True},
        {"anchor_text": "Dead", "url": "https://x/404", "fetchable": False},
    ]
    out = format_link_suggestions(metas)
    assert "https://x/docs" in out and "X Docs" in out
    assert "https://x/blog" in out and "[Blog]" in out  # anchor fallback
    assert "https://x/404" not in out  # unfetchable dropped
    assert format_link_suggestions([]) == ""


def test_extract_links_excludes_fetched_and_relative():
    from tensortruth_tpu.web.links import extract_links_from_markdown

    md = ("See [A](https://a.com/x) and [B](https://b.com/y) and "
          "[rel](/local/path) and [A again](https://a.com/x)")
    links = extract_links_from_markdown(md, "https://page.com",
                                        exclude_urls={"https://b.com/y"})
    urls = [u for _, u in links]
    assert "https://a.com/x" in urls
    assert "https://b.com/y" not in urls
    assert urls.count("https://a.com/x") == 1  # deduped
