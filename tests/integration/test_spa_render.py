"""Renderer conformance: markdown + TeX math + syntax highlighting.

The browser renderer (static/assets/js/lib/{markdown,tex,highlight}.js) has
no JS runtime in this image, so the gate is three-layered:

1. Execute every golden case in static/assets/markdown_cases.json against the
   line-faithful Python twin (tensortruth_tpu/utils/mdrender.py).
2. Sync-check the twin against the JS sources: symbol tables (greek, symbol,
   big-operator, accent, alphabet maps), keyword tables, and command lists are
   parsed out of the JS and compared key-for-key/value-for-value, so the twin
   cannot silently drift from what the browser actually runs.
3. Execute the REAL JS in-process on jsrt, the in-repo ES-subset runtime
   (tensortruth_tpu/jsrt, tests/integration/test_spa_exec.py) — every
   golden case runs through the actual lib/markdown.js+tex.js+highlight.js,
   and stores/ws-handlers run under a DOM shim. The node/bun/qjs path below
   additionally cross-checks on a native engine if one ever appears on
   PATH (static/conformance.html does the same in a browser).

Reference parity: the reference renders math with katex + rehype-katex and
code with rehype-highlight (reference frontend/package.json:37,48-49,
frontend/src/components/chat/MemoizedMarkdown.tsx).
"""

import json
import re
import shutil
import subprocess
from pathlib import Path

import pytest

from tensortruth_tpu.utils import mdrender

STATIC = Path(__file__).resolve().parents[2] / "tensortruth_tpu" / "static"
JS_LIB = STATIC / "assets" / "js" / "lib"
CASES = json.loads((STATIC / "assets" / "markdown_cases.json").read_text())["cases"]

TEX_JS = (JS_LIB / "tex.js").read_text()
HL_JS = (JS_LIB / "highlight.js").read_text()
MD_JS = (JS_LIB / "markdown.js").read_text()


# ------------------------------------------------- 1. golden-case execution


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_golden_case(case):
    html = mdrender.render_markdown(case["input"])
    missing = [s for s in case.get("expect", []) if s not in html]
    present = [s for s in case.get("forbid", []) if s in html]
    assert not missing, f"missing {missing!r} in: {html[:400]}"
    assert not present, f"forbidden {present!r} in: {html[:400]}"


def test_tex_never_raises_on_garbage():
    for bad in ["{{{", "}}}", "\\frac{", "\\begin{pmatrix} 1 &", "^", "_",
                "\\left(", "a^{", "\\sqrt[", "$", "\\\\", "&&&", "\\end{x}"]:
        out = mdrender.render_tex(bad, display=False)
        assert isinstance(out, str) and out.startswith("<span")


def test_tex_output_is_escaped():
    out = mdrender.render_tex('<img src=x onerror=alert(1)>"', display=True)
    assert "<img" not in out
    assert 'onerror="' not in out


def test_highlight_unknown_language_escapes():
    out = mdrender.highlight("<script>alert(1)</script>", "klingon")
    assert out == "&lt;script&gt;alert(1)&lt;/script&gt;"


def test_markdown_placeholder_injection_resolves():
    # user text containing the NUL placeholder shape must not dereference slots
    out = mdrender.render_markdown("before \x00MD0\x00 after `code`")
    assert "<code>code</code>" in out


# ------------------------------------------------- 2. JS ↔ Python table sync


def _js_object_entries(src: str, name: str) -> dict:
    """Parse `const NAME = { key: "value", ... }` string-valued entries."""
    m = re.search(rf"const {name} = \{{(.*?)\n\}};", src, re.S)
    assert m, f"table {name} not found in JS"
    body = m.group(1)
    out = {}
    for key, val in re.findall(r'(\w+):\s*"((?:\\.|[^"\\])*)"', body):
        out[key] = json.loads(f'"{val}"')
    return out


def test_greek_table_sync():
    assert _js_object_entries(TEX_JS, "GREEK") == mdrender.GREEK


def test_symbol_table_sync():
    assert _js_object_entries(TEX_JS, "SYMS") == mdrender.SYMS


def test_bigop_table_sync():
    assert _js_object_entries(TEX_JS, "BIGOPS") == mdrender.BIGOPS


def test_func_lists_sync():
    m = re.search(r"const FUNCS = \[(.*?)\];", TEX_JS, re.S)
    funcs = re.findall(r'"(\w+)"', m.group(1))
    assert funcs == mdrender.FUNCS
    m = re.search(r"const LIMFUNCS = \[(.*?)\];", TEX_JS, re.S)
    assert re.findall(r'"(\w+)"', m.group(1)) == mdrender.LIMFUNCS


def test_alphabet_table_sync():
    m = re.search(r"const ALPHABETS = \{(.*?)\n\};", TEX_JS, re.S)
    body = m.group(1)
    js = {}
    for name, up, lo, dig, exc in re.findall(
            r"(\w+): \[(0x[0-9a-f]+), (0x[0-9a-f]+), (0x[0-9a-f]+|null), \{(.*?)\}\]",
            body):
        exc_map = {k: json.loads(f'"{v}"')
                   for k, v in re.findall(r'(\w+):\s*"((?:\\.|[^"\\])*)"', exc)}
        js[name] = (int(up, 16), int(lo, 16),
                    None if dig == "null" else int(dig, 16), exc_map)
    assert js == mdrender.ALPHABETS


def test_accent_keys_sync():
    m = re.search(r"const ACCENTS = \{(.*?)\n\};", TEX_JS, re.S)
    keys = set(re.findall(r"(\w+):", m.group(1)))
    assert keys == set(mdrender.ACCENTS)


def test_keyword_tables_sync():
    js_kw = _js_object_entries(HL_JS, "KW")
    assert js_kw == mdrender.KW
    js_aliases = {}
    m = re.search(r"const ALIASES = \{(.*?)\n\};", HL_JS, re.S)
    for k, v in re.findall(r'["\']?([\w+#.-]+)["\']?:\s*"(\w+)"', m.group(1)):
        js_aliases[k] = v
    assert js_aliases == mdrender.ALIASES


def test_inline_math_regex_sync():
    m = re.search(r"const INLINE_MATH = /(.*)/g;", MD_JS)
    assert m, "INLINE_MATH not found in markdown.js"
    assert m.group(1) == mdrender._INLINE_MATH.pattern


# ------------------------------------------------- 3. SPA wiring (static)


def test_markdown_js_imports_tex_and_highlight():
    assert 'from "./tex.js"' in MD_JS
    assert 'from "./highlight.js"' in MD_JS
    for name in ("renderTex", "highlight", "renderMarkdown", "escapeHtml",
                 "safeUrl"):
        assert name in MD_JS


def test_ws_token_handler_renders_incrementally():
    ws = (STATIC / "assets" / "js" / "chat" / "ws.js").read_text()
    token = re.search(r"token\(msg\) \{(.*?)\n  \},", ws, re.S).group(1)
    assert "stream.repaint" in token and "renderTimer" in token
    done = re.search(r"done\(msg\) \{(.*?)\n  \},", ws, re.S).group(1)
    assert "renderMarkdown" in done


def test_history_render_uses_markdown():
    sidebar = (STATIC / "assets" / "js" / "views" / "sidebar.js").read_text()
    assert "renderMarkdown(m.content" in sidebar
    assert 'classList.add("md")' in sidebar


def test_conformance_page_exists_and_loads_cases():
    page = (STATIC / "conformance.html").read_text()
    assert "/assets/markdown_cases.json" in page
    assert "/assets/js/lib/markdown.js" in page
    assert "__conformance" in page


def test_css_has_renderer_classes():
    css = (STATIC / "assets" / "css" / "app.css").read_text()
    for cls in (".tex-frac", ".tex-display", ".tex-sqrt", ".tex-matrix",
                ".hl-kw", ".hl-str", ".hl-com", ".msg .body.md",
                ".code-lang", ".tex-stack"):
        assert cls in css, f"missing CSS class {cls}"


# ------------------------------------------------- 4. real-JS conformance


def _find_js_runtime():
    for exe, args in (("node", []), ("bun", ["run"]), ("qjs", ["--module"])):
        path = shutil.which(exe)
        if path:
            return path, args
    return None, None


@pytest.mark.integration
def test_js_conformance_if_runtime_available(tmp_path):
    """Execute the REAL JS renderer against the golden cases.

    Skips when no JS runtime is on PATH (the CI image ships none — the
    Python-twin tests above plus the table-sync tests are the gate then;
    static/conformance.html runs this in a browser via the verify skill).
    """
    exe, args = _find_js_runtime()
    if not exe:
        pytest.skip("no JS runtime (node/bun/qjs) on PATH")
    runner = tmp_path / "run.mjs"
    runner.write_text(f"""
import {{ renderMarkdown }} from "{(JS_LIB / 'markdown.js').as_posix()}";
import {{ readFileSync }} from "fs";
const cases = JSON.parse(readFileSync(
  "{(STATIC / 'assets' / 'markdown_cases.json').as_posix()}", "utf8")).cases;
let failed = 0;
for (const c of cases) {{
  const html = renderMarkdown(c.input);
  const missing = (c.expect || []).filter(s => !html.includes(s));
  const present = (c.forbid || []).filter(s => html.includes(s));
  if (missing.length || present.length) {{
    failed++;
    console.error("FAIL", c.name, JSON.stringify({{missing, present}}));
  }}
}}
process.exit(failed ? 1 : 0);
""")
    res = subprocess.run([exe, *args, str(runner)], capture_output=True,
                         text=True, timeout=60)
    assert res.returncode == 0, res.stderr or res.stdout


# ------------------------------------------------- 4. streaming block split
# (lib/mdstream.js: memoized streaming repaint ≡ reference
# MemoizedMarkdown.tsx. The split invariants run against the Python twin
# mdrender.split_blocks; the wiring check pins the JS to the same logic.)

MDSTREAM_JS = (JS_LIB / "mdstream.js").read_text()


def test_mdstream_wiring():
    assert "export function splitBlocks" in MDSTREAM_JS
    assert "export function createStreamRenderer" in MDSTREAM_JS
    ws = (STATIC / "assets" / "js" / "chat" / "ws.js").read_text()
    assert "stream.repaint(stream.raw)" in ws, "token handler must use the memoized repaint"
    sj = (STATIC / "assets" / "js" / "chat" / "stream.js").read_text()
    assert "createStreamRenderer(stream.body)" in sj
    # done() stays a canonical single-call render of the full text
    assert "renderMarkdown(msg.content || stream.raw)" in ws


def test_split_blocks_never_cuts_fences_or_math():
    src = ("intro text\n\n```python\na = 1\n\nb = 2\n```\n\n"
           "mid paragraph\n\n$$\nx = 1\n\ny = 2\n$$\n\ntail")
    blocks = mdrender.split_blocks(src)
    fence = next(b for b in blocks if b.startswith("```"))
    assert fence.endswith("```") and "\n\n" in fence  # blank lines kept inside
    math = next(b for b in blocks if b.startswith("$$"))
    assert math.endswith("$$") and "\n\n" in math
    assert blocks[0] == "intro text" and blocks[-1] == "tail"


def test_split_blocks_conserves_content():
    # no non-blank line is ever lost or duplicated by the split
    def nonblank(s):
        return [ln for ln in s.split("\n") if ln.strip()]

    for case in CASES:
        blocks = mdrender.split_blocks(case["input"])
        assert nonblank("\n\n".join(blocks)) == nonblank(case["input"]), case["name"]


def test_split_blocks_streaming_prefix_stability():
    # append-only stream: once a block stops being the open tail, its text
    # (hence the cached DOM in createStreamRenderer) never changes again
    src = ("The loss is $$L = \\sum_i x_i^2$$ with inline $\\alpha$.\n\n"
           "```python\ndef step(w, g):\n\n    return w - g\n```\n\n"
           "- item one\n- item two\n\nfinal **paragraph** here")
    prev: list[str] = []
    for i in range(1, len(src) + 1):
        blocks = mdrender.split_blocks(src[:i])
        for j in range(min(len(prev), len(blocks)) - 1):
            assert blocks[j] == prev[j], f"finalized block {j} changed at char {i}"
        prev = blocks
    assert len(prev) == 4
