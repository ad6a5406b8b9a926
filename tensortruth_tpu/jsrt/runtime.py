"""jsrt Runtime: global environment, ES-module loader, and the job queue
(microtasks + virtual timers) that makes await/Promise deterministic."""

from __future__ import annotations

import json as _json
import math as _math
from pathlib import Path

from tensortruth_tpu.jsrt import builtins as B
from tensortruth_tpu.jsrt.interp import (
    UNDEF,
    Env,
    Interp,
    JSArray,
    JSClass,
    JSFunction,
    JSObject,
    JSThrow,
    JsrtError,
)
from tensortruth_tpu.jsrt.parser import parse


class Runtime:
    def __init__(self, root: str | Path | None = None, globals_extra=None):
        self.root = Path(root) if root else None
        self.interp = Interp(self)
        self.modules: dict[str, dict] = {}
        self.loading: set[str] = set()
        self.current_exports: dict = {}
        self.microtasks: list = []
        self.timers: list = []  # (due_seq, fn) — virtual time, FIFO by delay
        self._timer_seq = 0
        self.console_lines: list[str] = []
        self.globals = make_globals(self)
        if globals_extra:
            for k, v in globals_extra.items():
                self.globals.declare(k, v)

    # -- jobs -----------------------------------------------------------------

    def drain_jobs(self, max_steps: int = 100_000):
        steps = 0
        while self.microtasks or self.timers:
            steps += 1
            if steps > max_steps:
                raise JsrtError("jsrt: job queue did not quiesce")
            if self.microtasks:
                self.microtasks.pop(0)()
            else:
                self.timers.sort(key=lambda t: t[0])
                _due, fn = self.timers.pop(0)
                fn()

    def block_on(self, promise):
        """Cooperative await: pump jobs until the promise settles."""
        steps = 0
        while promise.state == "pending":
            if not (self.microtasks or self.timers):
                raise JsrtError("jsrt: await deadlock (promise never settles)")
            steps += 1
            if steps > 100_000:
                raise JsrtError("jsrt: await did not converge")
            if self.microtasks:
                self.microtasks.pop(0)()
            else:
                self.timers.sort(key=lambda t: t[0])
                _due, fn = self.timers.pop(0)
                fn()
        if promise.state == "rejected":
            raise JSThrow(promise.value)
        return promise.value

    # -- modules --------------------------------------------------------------

    def import_module(self, spec: str, importer: Path | None = None) -> dict:
        path = self.resolve(spec, importer or self._current_file)
        key = str(path)
        if key in self.modules:
            # includes modules still mid-execution: cyclic importers see the
            # partial exports (hoisted functions are pre-exported below) —
            # the same live-binding tolerance browsers give ES modules
            return self.modules[key]
        return self.load_module(path)

    def resolve(self, spec: str, importer: Path | None) -> Path:
        if spec.startswith("."):
            base = importer.parent if importer else (self.root or Path("."))
            return (base / spec).resolve()
        if self.root is not None:
            return (self.root / spec).resolve()
        return Path(spec).resolve()

    _current_file: Path | None = None

    def load_module(self, path: str | Path) -> dict:
        path = Path(path).resolve()
        key = str(path)
        if key in self.modules:
            return self.modules[key]
        src = path.read_text(encoding="utf-8")
        ast = parse(src, str(path))
        self.loading.add(key)
        prev_exports = self.current_exports
        prev_file = self._current_file
        exports: dict = {}
        self.modules[key] = exports  # registered live BEFORE execution
        self.current_exports = exports
        self._current_file = path
        env = Env(self.globals)
        try:
            # pre-export hoisted exported functions so cyclic importers can
            # grab them before this module's body finishes executing
            self.interp.hoist(ast[1], env)
            for s in ast[1]:
                if s[0] == "exportdecl" and s[1][0] == "func":
                    exports[s[1][1]] = env.vars[s[1][1]]
            self.interp.st_module(ast, env)
            return exports
        except BaseException:
            self.modules.pop(key, None)
            raise
        finally:
            self.loading.discard(key)
            self.current_exports = prev_exports
            self._current_file = prev_file

    def run_script(self, src: str, env_vars=None, filename: str = "<script>"):
        """Execute a script in a child env of the globals; returns its env."""
        ast = parse(src, filename)
        env = Env(self.globals)
        if env_vars:
            for k, v in env_vars.items():
                env.declare(k, v)
        self.interp.st_module(ast, env)
        self.drain_jobs()
        return env


# -- host<->JS conversion -----------------------------------------------------


def to_js(v, runtime=None):
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (list, tuple)):
        return JSArray(to_js(x) for x in v)
    if isinstance(v, dict):
        return JSObject({str(k): to_js(x) for k, x in v.items()})
    return v


def from_js(v):
    if v is UNDEF:
        return None
    if isinstance(v, float):
        return int(v) if v == int(v) and abs(v) < 2**53 else v
    if isinstance(v, JSArray):
        return [from_js(x) for x in v]
    if isinstance(v, JSObject):
        return {k: from_js(x) for k, x in v.props.items()}
    return v


# -- globals ------------------------------------------------------------------


def make_globals(rt: Runtime) -> Env:
    g = Env()
    B_UNDEF = UNDEF

    def console_emit(kind, *args):
        line = " ".join(B.js_str(a) for a in args)
        rt.console_lines.append(f"[{kind}] {line}" if kind != "log" else line)
        return B_UNDEF

    console = JSObject({
        "log": lambda *a: console_emit("log", *a),
        "warn": lambda *a: console_emit("warn", *a),
        "error": lambda *a: console_emit("error", *a),
        "info": lambda *a: console_emit("log", *a),
        "debug": lambda *a: console_emit("log", *a),
    })

    math_obj = JSObject({
        "floor": lambda x=0.0: float(_math.floor(B.to_number(x))),
        "ceil": lambda x=0.0: float(_math.ceil(B.to_number(x))),
        "round": lambda x=0.0: float(_math.floor(B.to_number(x) + 0.5)),
        "trunc": lambda x=0.0: float(_math.trunc(B.to_number(x))),
        "abs": lambda x=0.0: abs(B.to_number(x)),
        "sign": lambda x=0.0: float((B.to_number(x) > 0) - (B.to_number(x) < 0)),
        "min": lambda *a: min((B.to_number(x) for x in a), default=float("inf")),
        "max": lambda *a: max((B.to_number(x) for x in a), default=float("-inf")),
        "pow": lambda a=0.0, b=0.0: B.to_number(a) ** B.to_number(b),
        "sqrt": lambda x=0.0: _math.sqrt(B.to_number(x)) if B.to_number(x) >= 0 else float("nan"),
        "cbrt": lambda x=0.0: _math.copysign(abs(B.to_number(x)) ** (1 / 3), B.to_number(x)),
        "log": lambda x=0.0: _math.log(B.to_number(x)) if B.to_number(x) > 0 else float("nan"),
        "log2": lambda x=0.0: _math.log2(B.to_number(x)) if B.to_number(x) > 0 else float("nan"),
        "log10": lambda x=0.0: _math.log10(B.to_number(x)) if B.to_number(x) > 0 else float("nan"),
        "exp": lambda x=0.0: _math.exp(B.to_number(x)),
        "hypot": lambda *a: _math.hypot(*(B.to_number(x) for x in a)),
        "random": lambda: 0.42,  # deterministic for tests (no Date/random drift)
        "PI": _math.pi,
        "E": _math.e,
    })

    def object_keys(o=UNDEF):
        if isinstance(o, JSObject):
            return JSArray(o.props.keys())
        if isinstance(o, JSArray):
            return JSArray(str(i) for i in range(len(o)))
        if isinstance(o, dict):
            return JSArray(o.keys())
        return JSArray()

    def object_values(o=UNDEF):
        if isinstance(o, JSObject):
            return JSArray(o.props.values())
        if isinstance(o, JSArray):
            return JSArray(o)
        return JSArray()

    def object_entries(o=UNDEF):
        if isinstance(o, JSObject):
            return JSArray(JSArray([k, v]) for k, v in o.props.items())
        return JSArray()

    def object_assign(target=UNDEF, *sources):
        for s in sources:
            if isinstance(s, JSObject):
                target.props.update(s.props)
        return target

    def object_from_entries(pairs=UNDEF):
        out = {}
        for pair in B.js_iterate(pairs):
            items = B.js_iterate(pair)
            out[B.js_str(items[0])] = items[1]
        return JSObject(out)

    object_obj = JSObject({
        "keys": object_keys,
        "values": object_values,
        "entries": object_entries,
        "assign": object_assign,
        "fromEntries": object_from_entries,
        "freeze": lambda o=UNDEF: o,
        "create": lambda proto=None: JSObject({}),
        "getOwnPropertyNames": object_keys,
    })

    def array_from(v=UNDEF, fn=UNDEF):
        if isinstance(v, JSObject) and "length" in v.props:
            n = B.to_int(v.props["length"])
            items = [v.props.get(str(i), UNDEF) for i in range(n)]
        else:
            items = B.js_iterate(v)
        if fn is not UNDEF:
            items = [rt.interp.call_any(fn, [x, float(i)])
                     for i, x in enumerate(items)]
        return JSArray(items)

    array_ns = _named_ctor(lambda *a: _array_ctor(a), {
        "isArray": lambda v=UNDEF: isinstance(v, JSArray),
        "from": array_from,
        "of": lambda *a: JSArray(a),
    })

    def _array_ctor(a):
        if len(a) == 1 and isinstance(a[0], float):
            return JSArray([UNDEF] * B.to_int(a[0]))
        return JSArray(a)

    def json_stringify(v=UNDEF, replacer=UNDEF, indent=UNDEF):
        if v is UNDEF:
            return UNDEF
        py = _to_jsonable(v)
        kw = {}
        if indent not in (None, UNDEF):
            kw["indent"] = B.to_int(indent) if isinstance(indent, float) else indent
        sep = (",", ": ") if "indent" in kw else (",", ":")
        return _json.dumps(py, ensure_ascii=False, separators=sep, **kw)

    def _to_jsonable(v):
        if v is UNDEF:
            return None
        if isinstance(v, float):
            return int(v) if v == int(v) and abs(v) < 2**53 else v
        if isinstance(v, JSArray):
            return [_to_jsonable(x) for x in v]
        if isinstance(v, JSObject):
            return {k: _to_jsonable(x) for k, x in v.props.items()
                    if x is not UNDEF and not callable(x)}
        if isinstance(v, (JSFunction,)) or callable(v):
            return None
        return v

    def json_parse(s=UNDEF):
        try:
            return to_js(_json.loads(B.js_str(s)))
        except (ValueError, TypeError) as e:
            raise JSThrow(B.make_error("SyntaxError", f"JSON.parse: {e}"))

    json_obj = JSObject({"stringify": json_stringify, "parse": json_parse})

    def parse_int(s=UNDEF, base=10.0):
        s = B.js_str(s).strip()
        b = B.to_int(base) or 10
        m = __import__("re").match(
            r"[+-]?(0[xX])?[0-9a-zA-Z]+", s)
        if not m:
            return float("nan")
        tok = m.group(0)
        try:
            if tok.lower().startswith(("0x", "+0x", "-0x")) and b in (10, 16):
                return float(int(tok, 16))
            digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:b]
            sign = -1 if tok.startswith("-") else 1
            tok = tok.lstrip("+-")
            acc = ""
            for ch in tok:
                if ch.lower() not in digits:
                    break
                acc += ch
            return float(sign * int(acc, b)) if acc else float("nan")
        except ValueError:
            return float("nan")

    def parse_float(s=UNDEF):
        m = __import__("re").match(
            r"\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", B.js_str(s))
        return float(m.group(0)) if m else float("nan")

    number_ns = _named_ctor(lambda *a: B.to_number(a[0]) if a else 0.0, {
        "isInteger": lambda v=UNDEF: isinstance(v, float) and not _math.isnan(v)
        and not _math.isinf(v) and v == int(v),
        "isFinite": lambda v=UNDEF: isinstance(v, float) and _math.isfinite(v),
        "isNaN": lambda v=UNDEF: isinstance(v, float) and _math.isnan(v),
        "parseFloat": parse_float,
        "parseInt": parse_int,
        "MAX_SAFE_INTEGER": float(2**53 - 1),
        "MIN_SAFE_INTEGER": float(-(2**53 - 1)),
        "POSITIVE_INFINITY": float("inf"),
        "NEGATIVE_INFINITY": float("-inf"),
        "EPSILON": 2.220446049250313e-16,
        "NaN": float("nan"),
    })

    string_ns = _named_ctor(lambda *a: B.js_str(a[0]) if a else "", {
        "fromCharCode": lambda *a: "".join(chr(B.to_int(x)) for x in a),
        "fromCodePoint": lambda *a: "".join(chr(B.to_int(x)) for x in a),
        "raw": lambda *a: B.js_str(a[0]) if a else "",
    })

    def set_timeout(fn=UNDEF, delay=0.0, *args):
        rt._timer_seq += 1
        seq = rt._timer_seq
        due = (B.to_number(delay), seq)

        def run():
            rt.interp.call_any(fn, list(args))

        rt.timers.append((due, run))
        return float(seq)

    def clear_timeout(tid=UNDEF):
        want = B.to_int(tid)
        rt.timers = [(d, f) for (d, f) in rt.timers if d[1] != want]
        return UNDEF

    def promise_ctor(executor=UNDEF):
        return B.JSPromise(rt, executor)

    promise_ns = _named_ctor(promise_ctor, {
        "resolve": lambda v=UNDEF: B.JSPromise.resolved(rt, v),
        "reject": lambda v=UNDEF: B.JSPromise.rejected(rt, v),
        "all": lambda items=UNDEF: _promise_all(rt, items),
        "allSettled": lambda items=UNDEF: _promise_all(rt, items, settled=True),
    })

    def error_ctor_factory(name):
        def ctor(msg=""):
            return B.make_error(name, B.js_str(msg) if msg != "" else "")

        ctor.js_constructor = True
        return ctor

    date_ns = _named_ctor(lambda *a: JSObject({"__date__": True}), {
        "now": lambda: 1_700_000_000_000.0,  # frozen clock: deterministic tests
    })

    for name, val in {
        "console": console,
        "Math": math_obj,
        "JSON": json_obj,
        "Object": object_obj,
        "Array": array_ns,
        "Number": number_ns,
        "String": string_ns,
        "Boolean": _named_ctor(lambda *a: B.truthy(a[0]) if a else False, {}),
        "RegExp": B.JSRegExp,
        "Map": B.JSMap,
        "Set": B.JSSet,
        "Promise": promise_ns,
        "Date": date_ns,
        "Error": error_ctor_factory("Error"),
        "TypeError": error_ctor_factory("TypeError"),
        "RangeError": error_ctor_factory("RangeError"),
        "SyntaxError": error_ctor_factory("SyntaxError"),
        "NaN": float("nan"),
        "Infinity": float("inf"),
        "globalThis": JSObject({}),
        "parseInt": parse_int,
        "parseFloat": parse_float,
        "isNaN": lambda v=UNDEF: _math.isnan(B.to_number(v)),
        "isFinite": lambda v=UNDEF: _math.isfinite(B.to_number(v)),
        "setTimeout": set_timeout,
        "clearTimeout": clear_timeout,
        # intervals fire ONCE under the virtual clock: a real repeat would
        # make drain_jobs spin forever; one tick exercises the callback
        "setInterval": set_timeout,
        "clearInterval": clear_timeout,
        "queueMicrotask": lambda fn=UNDEF: (
            rt.microtasks.append(lambda: rt.interp.call_any(fn, [])), UNDEF)[1],
        "encodeURIComponent": lambda s="": __import__("urllib.parse", fromlist=["quote"]).quote(
            B.js_str(s), safe="!'()*-._~"),
        "decodeURIComponent": lambda s="": __import__("urllib.parse", fromlist=["unquote"]).unquote(
            B.js_str(s)),
        "structuredClone": lambda v=UNDEF: to_js(from_js(v)),
    }.items():
        g.declare(name, val)
    return g


def _named_ctor(fn, props):
    """A callable namespace object: `Array.isArray(x)` AND `Array(3)`."""
    fn.js_props = props
    fn.js_constructor = True
    return fn


def _promise_all(rt, items, settled=False):
    from tensortruth_tpu.jsrt.builtins import JSPromise

    items = B.js_iterate(items)
    out = JSPromise(rt)
    results = [UNDEF] * len(items)
    remaining = [len(items)]
    if not items:
        out._settle("fulfilled", JSArray())
        return out

    def finish_one(i, value, ok):
        if settled:
            results[i] = JSObject(
                {"status": "fulfilled", "value": value} if ok else
                {"status": "rejected", "reason": value})
        elif not ok:
            out._settle("rejected", value)
            return
        else:
            results[i] = value
        remaining[0] -= 1
        if remaining[0] == 0:
            out._settle("fulfilled", JSArray(results))

    for i, item in enumerate(items):
        if isinstance(item, JSPromise):
            item.then_native(lambda v, i=i: finish_one(i, v, True),
                             lambda v, i=i: finish_one(i, v, False))
        else:
            finish_one(i, item, True)
    return out
