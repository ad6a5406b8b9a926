"""jsrt runtime library: JS semantics (coercion, equality, typeof) and the
built-in objects/methods the SPA's modules use — String/Array/Object/Math/
JSON/RegExp/Map/Set/Promise/console — mapped onto Python equivalents.

Regexes translate JS syntax to Python `re` (flags, `$1` replacements,
stateful `lastIndex` for /g). Numbers are doubles (Python floats) and
stringify with JS rules ("1" not "1.0"; repr() is shortest-round-trip in
both languages, so 0.30000000000000004 prints identically).
"""

from __future__ import annotations

import json as _json
import math as _math
import re as _re

from tensortruth_tpu.jsrt.interp import (
    UNDEF,
    Env,
    JSArray,
    JSClass,
    JSFunction,
    JSObject,
    JSThrow,
    JSTypeError,
    _SuperProxy,
)

# -- errors -------------------------------------------------------------------


def make_error(name: str, message: str) -> JSObject:
    return JSObject({"name": name, "message": message,
                     "stack": f"{name}: {message}"})


# -- coercions ----------------------------------------------------------------


def truthy(v) -> bool:
    if v is UNDEF or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, float):
        return not (v == 0 or _math.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    return True  # objects/arrays/functions


def js_typeof(v) -> str:
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "object"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (JSFunction, JSClass)) or callable(v):
        return "function"
    return "object"


def js_str(v) -> str:
    if isinstance(v, str):
        return v
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        return _num_str(v)
    if isinstance(v, JSArray):
        return ",".join("" if x in (None, UNDEF) else js_str(x) for x in v)
    if isinstance(v, JSRegExp):
        return f"/{v.source}/{v.flags}"
    if isinstance(v, JSObject):
        if set(v.props.keys()) >= {"name", "message"} and "stack" in v.props:
            return f"{v.props['name']}: {v.props['message']}"
        return "[object Object]"
    if isinstance(v, (JSFunction, JSClass)):
        return f"function {getattr(v, 'name', '')}() {{ [jsrt] }}"
    if callable(v):
        return "function () { [native] }"
    return str(v)


def _num_str(f: float) -> str:
    if _math.isnan(f):
        return "NaN"
    if _math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    return repr(f)


def to_number(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    if v is None:
        return 0.0
    if v is UNDEF:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            if s.startswith(("0x", "0X")):
                return float(int(s, 16))
            return float(s)
        except ValueError:
            return float("nan")
    if isinstance(v, JSArray):
        if len(v) == 0:
            return 0.0
        if len(v) == 1:
            return to_number(v[0])
    return float("nan")


def to_int(v) -> int:
    n = to_number(v)
    if _math.isnan(n) or _math.isinf(n):
        return 0
    return int(n)


def strict_eq(a, b) -> bool:
    if a is UNDEF or b is UNDEF:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if a is None or b is None:
        return a is b
    return a is b


def loose_eq(a, b) -> bool:
    if (a is None or a is UNDEF) and (b is None or b is UNDEF):
        return True
    if isinstance(a, bool):
        return loose_eq(1.0 if a else 0.0, b)
    if isinstance(b, bool):
        return loose_eq(a, 1.0 if b else 0.0)
    if isinstance(a, float) and isinstance(b, str):
        return a == to_number(b)
    if isinstance(a, str) and isinstance(b, float):
        return to_number(a) == b
    return strict_eq(a, b)


def js_iterate(v):
    if isinstance(v, (JSArray, list, tuple)):
        return list(v)
    if isinstance(v, str):
        return list(v)  # code points, matching JS string iteration
    if isinstance(v, JSMap):
        return [JSArray([k, val]) for k, val in v.entries_list()]
    if isinstance(v, JSSet):
        return list(v.items)
    if isinstance(v, JSObject) and "__iter_items__" in v.props:
        return list(v.props["__iter_items__"])
    raise JSTypeError(f"{js_typeof(v)} is not iterable")


# -- operators ----------------------------------------------------------------


def binop(op, a, b):
    if op == "+":
        if isinstance(a, str) or isinstance(b, str) or \
                isinstance(a, (JSArray, JSObject)) or isinstance(b, (JSArray, JSObject)):
            return js_str(a) + js_str(b)
        return to_number(a) + to_number(b)
    if op == "-":
        return to_number(a) - to_number(b)
    if op == "*":
        return to_number(a) * to_number(b)
    if op == "/":
        x, y = to_number(a), to_number(b)
        if y == 0:
            if x == 0 or _math.isnan(x):
                return float("nan")
            return float("inf") if (x > 0) == (not _math.copysign(1, y) < 0) else float("-inf")
        return x / y
    if op == "%":
        x, y = to_number(a), to_number(b)
        if y == 0 or _math.isnan(x) or _math.isinf(x):
            return float("nan")
        return _math.fmod(x, y)
    if op == "**":
        return to_number(a) ** to_number(b)
    if op == "==":
        return loose_eq(a, b)
    if op == "!=":
        return not loose_eq(a, b)
    if op == "===":
        return strict_eq(a, b)
    if op == "!==":
        return not strict_eq(a, b)
    if op in ("<", ">", "<=", ">="):
        if isinstance(a, str) and isinstance(b, str):
            return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
        x, y = to_number(a), to_number(b)
        if _math.isnan(x) or _math.isnan(y):
            return False
        return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
    if op == "&":
        return float(_int32(a) & _int32(b))
    if op == "|":
        return float(_int32(a) | _int32(b))
    if op == "^":
        return float(_int32(a) ^ _int32(b))
    if op == "<<":
        return float(_wrap32(_int32(a) << (_uint32(b) & 31)))
    if op == ">>":
        return float(_int32(a) >> (_uint32(b) & 31))
    if op == ">>>":
        return float((_uint32(a)) >> (_uint32(b) & 31))
    if op == "instanceof":
        if isinstance(b, JSClass) and isinstance(a, JSObject):
            c = a._class
            while c is not None:
                if c is b:
                    return True
                c = c.parent
            return False
        return False
    if op == "in":
        key = js_str(a)
        if isinstance(b, JSObject):
            return key in b.props
        if isinstance(b, JSArray):
            return key.isdigit() and int(key) < len(b)
        if isinstance(b, JSMap):
            return b.has(a)
        return False
    raise JSTypeError(f"jsrt: unsupported operator {op}")


def unop(op, v):
    if op == "!":
        return not truthy(v)
    if op == "-":
        return -to_number(v)
    if op == "+":
        return to_number(v)
    if op == "~":
        return float(~_int32(v))
    raise JSTypeError(f"jsrt: unsupported unary {op}")


def _int32(v) -> int:
    n = to_int(v) & 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _uint32(v) -> int:
    return to_int(v) & 0xFFFFFFFF


def _wrap32(n: int) -> int:
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


# -- regex --------------------------------------------------------------------

_JS_FLAG_MAP = {"i": _re.I, "m": _re.M, "s": _re.S}


def _js_pattern_to_py(pat: str) -> str:
    # JS and Python regex dialects overlap almost entirely for the subset
    # the SPA uses. Translate the few differences.
    out = []
    i = 0
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            nxt = pat[i + 1]
            if nxt == "d" or nxt == "D" or nxt == "w" or nxt == "W" \
                    or nxt == "s" or nxt == "S" or nxt == "b" or nxt == "B":
                out.append(c + nxt)
            elif nxt == "u" and i + 2 < len(pat) and pat[i + 2] == "{":
                j = pat.index("}", i)
                out.append(chr(int(pat[i + 3 : j], 16)))
                i = j + 1
                continue
            elif nxt == "u":
                out.append("\\u" + pat[i + 2 : i + 6])
                i += 6
                continue
            elif nxt == "/":
                out.append("/")
                i += 2
                continue
            else:
                out.append(c + nxt)
            i += 2
            continue
        if pat.startswith("(?<", i) and i + 3 < len(pat) and pat[i + 3] not in "=!":
            out.append("(?P<")
            i += 3
            continue
        if pat.startswith("[^]", i):
            out.append("[\\s\\S]")
            i += 3
            continue
        out.append(c)
        i += 1
    return "".join(out)


class JSRegExp:
    js_constructor = True

    def __init__(self, pattern, flags=""):
        if isinstance(pattern, JSRegExp):
            flags = flags or pattern.flags
            pattern = pattern.source
        self.source = pattern
        self.flags = flags or ""
        py_flags = 0
        for f in self.flags:
            py_flags |= _JS_FLAG_MAP.get(f, 0)
        try:
            self.re = _re.compile(_js_pattern_to_py(pattern), py_flags)
        except _re.error as e:
            raise JSThrow(make_error("SyntaxError", f"invalid regex: {e}"))
        self.global_ = "g" in self.flags
        self.sticky = "y" in self.flags
        self.lastIndex = 0.0

    def test(self, s=""):
        s = js_str(s)
        if self.global_ or self.sticky:
            return self.exec(s) is not None
        return self.re.search(s) is not None

    def exec(self, s=""):
        s = js_str(s)
        pos = to_int(self.lastIndex) if (self.global_ or self.sticky) else 0
        if pos > len(s):
            self.lastIndex = 0.0
            return None
        m = self.re.match(s, pos) if self.sticky else self.re.search(s, pos)
        if m is None:
            self.lastIndex = 0.0
            return None
        if self.global_ or self.sticky:
            self.lastIndex = float(m.end() if m.end() != m.start() else m.end() + 1)
        return _match_array(m)


def _match_array(m: "_re.Match") -> JSArray:
    arr = _JSMatchArray([m.group(0)])
    for g in m.groups():
        arr.append(UNDEF if g is None else g)
    arr.index = float(m.start())
    arr.input = m.string
    groups = m.groupdict()
    arr.named = JSObject({k: (UNDEF if v is None else v)
                          for k, v in groups.items()}) if groups else UNDEF
    return arr


class _JSMatchArray(JSArray):
    index = 0.0
    input = ""
    named = UNDEF


def _expand_replacement(template: str, m: "_re.Match") -> str:
    out = []
    i = 0
    while i < len(template):
        c = template[i]
        if c == "$" and i + 1 < len(template):
            nxt = template[i + 1]
            if nxt == "$":
                out.append("$")
                i += 2
                continue
            if nxt == "&":
                out.append(m.group(0))
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < len(template) and template[j].isdigit():
                    j += 1
                # prefer the longest valid group number
                for end in range(j, i + 1, -1):
                    gnum = int(template[i + 1 : end])
                    if 1 <= gnum <= m.re.groups:
                        out.append(m.group(gnum) or "")
                        i = end
                        break
                else:
                    out.append(c)
                    i += 1
                continue
        out.append(c)
        i += 1
    return "".join(out)


# -- collections --------------------------------------------------------------


class _HashKey:
    """SameValueZero key wrapper so objects hash by identity."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __hash__(self):
        v = self.v
        if isinstance(v, (str, float, bool)) or v is None or v is UNDEF:
            return hash((type(v).__name__, v if v is not UNDEF else "undefined"))
        return id(v)

    def __eq__(self, other):
        return strict_eq(self.v, other.v) or self.v is other.v


class JSMap:
    js_constructor = True

    def __init__(self, init=None):
        self.d: dict = {}
        if init not in (None, UNDEF):
            for pair in js_iterate(init):
                items = js_iterate(pair)
                self.set(items[0], items[1])

    def get(self, k, default=UNDEF):
        return self.d.get(_HashKey(k), (None, default))[1]

    def set(self, k, v=UNDEF):
        self.d[_HashKey(k)] = (k, v)
        return self

    def has(self, k):
        return _HashKey(k) in self.d

    def delete(self, k):
        return self.d.pop(_HashKey(k), None) is not None

    def clear(self):
        self.d.clear()

    def entries_list(self):
        return list(self.d.values())

    @property
    def size(self):
        return float(len(self.d))


class JSSet:
    js_constructor = True

    def __init__(self, init=None):
        self.d: dict = {}
        if init not in (None, UNDEF):
            for item in js_iterate(init):
                self.add(item)

    @property
    def items(self):
        return [v for v in self.d.values()]

    def add(self, v=UNDEF):
        self.d[_HashKey(v)] = v
        return self

    def has(self, v):
        return _HashKey(v) in self.d

    def delete(self, v):
        return self.d.pop(_HashKey(v), _MISSING) is not _MISSING

    def clear(self):
        self.d.clear()

    @property
    def size(self):
        return float(len(self.d))


_MISSING = object()


# -- promises / jobs ----------------------------------------------------------


class JSPromise:
    js_constructor = True

    def __init__(self, runtime, executor=None):
        self.runtime = runtime
        self.state = "pending"
        self.value = UNDEF
        self.callbacks = []  # (on_ok, on_err, next_promise)
        if executor is not None and executor is not UNDEF:
            interp = runtime.interp
            try:
                interp.call_any(executor, [self._resolve_fn(), self._reject_fn()])
            except JSThrow as e:
                self._settle("rejected", e.value)

    # plumbing ---------------------------------------------------------------

    def _resolve_fn(self):
        def resolve(v=UNDEF):
            if isinstance(v, JSPromise):
                v.then_native(lambda x: self._settle("fulfilled", x),
                              lambda x: self._settle("rejected", x))
            else:
                self._settle("fulfilled", v)
            return UNDEF

        return resolve

    def _reject_fn(self):
        def reject(v=UNDEF):
            self._settle("rejected", v)
            return UNDEF

        return reject

    def _settle(self, state, value):
        if self.state != "pending":
            return
        self.state = state
        self.value = value
        for cb in self.callbacks:
            self.runtime.microtasks.append(lambda cb=cb: self._run_cb(cb))
        self.callbacks.clear()

    def _run_cb(self, cb):
        on_ok, on_err, nxt = cb
        interp = self.runtime.interp
        handler = on_ok if self.state == "fulfilled" else on_err
        if handler is None:
            nxt._settle(self.state, self.value)
            return
        try:
            out = interp.call_any(handler, [self.value])
        except JSThrow as e:
            nxt._settle("rejected", e.value)
            return
        if isinstance(out, JSPromise):
            out.then_native(lambda v: nxt._settle("fulfilled", v),
                            lambda v: nxt._settle("rejected", v))
        else:
            nxt._settle("fulfilled", out)

    def then_native(self, ok, err):
        self.then(_native(ok), _native(err))

    # JS surface -------------------------------------------------------------

    def then(self, on_ok=None, on_err=None):
        nxt = JSPromise(self.runtime)
        on_ok = None if on_ok in (None, UNDEF) else on_ok
        on_err = None if on_err in (None, UNDEF) else on_err
        cb = (on_ok, on_err, nxt)
        if self.state == "pending":
            self.callbacks.append(cb)
        else:
            self.runtime.microtasks.append(lambda: self._run_cb(cb))
        return nxt

    def catch(self, on_err=None):
        return self.then(None, on_err)

    def finally_(self, fn=None):
        def wrap(v):
            if fn not in (None, UNDEF):
                self.runtime.interp.call_any(fn, [])
            return v

        def wrap_err(v):
            if fn not in (None, UNDEF):
                self.runtime.interp.call_any(fn, [])
            raise JSThrow(v)

        return self.then(_native(wrap), _native(wrap_err))

    @classmethod
    def resolved(cls, runtime, value):
        p = cls(runtime)
        p._settle("fulfilled", value)
        return p

    @classmethod
    def rejected(cls, runtime, value):
        p = cls(runtime)
        p._settle("rejected", value)
        return p


def _native(fn):
    try:
        fn.js_native = True
    except AttributeError:
        pass  # bound methods reject attributes; the marker is advisory
    return fn


# -- member dispatch ----------------------------------------------------------


def get_member(obj, name, interp):
    if obj is None or obj is UNDEF:
        raise JSTypeError(
            f"cannot read property {name!r} of {js_str(obj)}")
    if isinstance(obj, str):
        return _string_member(obj, name)
    if isinstance(obj, JSArray):
        return _array_member(obj, name, interp)
    if isinstance(obj, JSObject):
        if name in obj.props:
            return obj.props[name]
        if obj._class is not None:
            m = obj._class.find_method(name)
            if m is not None:
                bound = _bind_method(m, obj)
                return bound
            g = obj._class.find_getter(name)
            if g is not None:
                return interp.call_function(g, [], this=obj)
        return UNDEF
    if isinstance(obj, JSMap):
        return _map_member(obj, name)
    if isinstance(obj, JSSet):
        return _set_member(obj, name)
    if isinstance(obj, JSRegExp):
        return _regex_member(obj, name)
    if isinstance(obj, JSPromise):
        if name == "then":
            return obj.then
        if name == "catch":
            return obj.catch
        if name == "finally":
            return obj.finally_
        return UNDEF
    if isinstance(obj, JSClass):
        if name in obj.statics:
            return _bind_method(obj.statics[name], UNDEF)
        if name in obj.props:
            return obj.props[name]
        if name == "name":
            return obj.name
        return UNDEF
    if isinstance(obj, JSFunction):
        if name == "call":
            return lambda this=UNDEF, *args: interp.call_function(obj, list(args), this)
        if name == "apply":
            return lambda this=UNDEF, args=UNDEF: interp.call_function(
                obj, list(js_iterate(args)) if args is not UNDEF else [], this)
        if name == "bind":
            def bind(this=UNDEF, *pre):
                import copy

                b = JSFunction(obj.name, obj.params, obj.body, obj.env,
                               obj.interp, is_async=obj.is_async,
                               is_arrow=obj.is_arrow,
                               is_expr_body=obj.is_expr_body,
                               home_class=obj.home_class)
                b.bound_this = this
                if pre:
                    def called(*args):
                        return interp.call_function(b, list(pre) + list(args), this)
                    return called
                return b
            return bind
        if name == "name":
            return obj.name
        return obj.props.get(name, UNDEF)
    if isinstance(obj, _SuperProxy):
        m = obj.parent_class.find_method(name)
        if m is None:
            raise JSTypeError(f"super has no method {name!r}")
        return _bind_method(m, obj.this)
    if isinstance(obj, float):
        return _number_member(obj, name)
    if isinstance(obj, bool):
        return UNDEF
    if isinstance(obj, dict):  # host dict exposed to JS
        return obj.get(name, UNDEF)
    if callable(obj):
        return getattr(obj, "js_props", {}).get(name, UNDEF)
    raise JSTypeError(f"cannot read {name!r} of {js_typeof(obj)}")


def _bind_method(m: JSFunction, this):
    b = JSFunction(m.name, m.params, m.body, m.env, m.interp,
                   is_async=m.is_async, is_expr_body=m.is_expr_body,
                   home_class=m.home_class)
    b.bound_this = this
    return b


def set_member(obj, name, value):
    if isinstance(obj, JSObject):
        if obj._class is not None:
            setter = obj._class.find_setter(name)
            if setter is not None:
                setter.interp.call_function(setter, [value], this=obj)
                return
        obj.props[name] = value
        return
    if isinstance(obj, JSClass):
        obj.props[name] = value  # static data member
        return
    if isinstance(obj, JSFunction):
        obj.props[name] = value
        return
    if isinstance(obj, JSArray) and name == "length":
        n = to_int(value)
        del obj[n:]
        while len(obj) < n:
            obj.append(UNDEF)
        return
    if isinstance(obj, JSRegExp) and name == "lastIndex":
        obj.lastIndex = value
        return
    if isinstance(obj, dict):
        obj[name] = value
        return
    raise JSTypeError(f"cannot set {name!r} on {js_typeof(obj)}")


def get_index(obj, key, interp):
    if isinstance(obj, (JSArray, str)):
        if isinstance(key, float) or isinstance(key, bool):
            i = to_int(key)
            if isinstance(key, float) and key != int(key):
                return UNDEF
            if 0 <= i < len(obj):
                return obj[i]
            return UNDEF
        return get_member(obj, js_str(key), interp)
    if isinstance(obj, JSObject):
        return obj.props.get(js_str(key), UNDEF)
    if isinstance(obj, dict):
        return obj.get(js_str(key), UNDEF)
    return get_member(obj, js_str(key), interp)


def set_index(obj, key, value):
    if isinstance(obj, JSArray) and isinstance(key, (float, bool)):
        i = to_int(key)
        while len(obj) <= i:
            obj.append(UNDEF)
        obj[i] = value
        return
    set_member(obj, js_str(key), value)


# -- string methods -----------------------------------------------------------


def _norm_idx(i, length, clamp_low=True):
    i = to_int(i)
    if i < 0:
        i += length
    if clamp_low:
        i = max(0, i)
    return min(i, length)


def _string_member(s: str, name: str):
    if name == "length":
        return float(len(s))
    meths = {
        "charAt": lambda i=0.0: s[to_int(i)] if 0 <= to_int(i) < len(s) else "",
        "charCodeAt": lambda i=0.0: (
            float(_utf16_code_unit(s, to_int(i)))
            if 0 <= to_int(i) < _utf16_len(s) else float("nan")),
        "codePointAt": lambda i=0.0: (
            float(ord(s[to_int(i)])) if 0 <= to_int(i) < len(s) else UNDEF),
        "at": lambda i=0.0: (s[to_int(i)] if -len(s) <= to_int(i) < len(s) else UNDEF),
        "indexOf": lambda sub="", start=0.0: float(s.find(js_str(sub), to_int(start))),
        "lastIndexOf": lambda sub="": float(s.rfind(js_str(sub))),
        "includes": lambda sub="", start=0.0: js_str(sub) in s[to_int(start):],
        "startsWith": lambda sub="", start=0.0: s.startswith(js_str(sub), to_int(start)),
        "endsWith": lambda sub="", end=None: s.endswith(
            js_str(sub), 0, len(s) if end in (None, UNDEF) else to_int(end)),
        "slice": lambda a=0.0, b=None: s[
            _norm_idx(a, len(s)):
            (len(s) if b in (None, UNDEF) else _norm_idx(b, len(s)))],
        "substring": lambda a=0.0, b=None: _substring(s, a, b),
        "toLowerCase": lambda: s.lower(),
        "toUpperCase": lambda: s.upper(),
        "trim": lambda: s.strip(),
        "trimStart": lambda: s.lstrip(),
        "trimEnd": lambda: s.rstrip(),
        "repeat": lambda n=0.0: s * to_int(n),
        "padStart": lambda n=0.0, fill=" ": _pad(s, to_int(n), js_str(fill), True),
        "padEnd": lambda n=0.0, fill=" ": _pad(s, to_int(n), js_str(fill), False),
        "split": lambda sep=UNDEF, limit=UNDEF: _split(s, sep, limit),
        "replace": lambda pat=UNDEF, rep=UNDEF: _replace(s, pat, rep, all_=False),
        "replaceAll": lambda pat=UNDEF, rep=UNDEF: _replace(s, pat, rep, all_=True),
        "match": lambda pat=UNDEF: _match(s, pat),
        "matchAll": lambda pat=UNDEF: JSArray(
            _match_array(m) for m in pat.re.finditer(s)),
        "search": lambda pat=UNDEF: _search(s, pat),
        "concat": lambda *a: s + "".join(js_str(x) for x in a),
        "localeCompare": lambda o="": float((s > js_str(o)) - (s < js_str(o))),
        "normalize": lambda form="NFC": __import__("unicodedata").normalize(form, s),
        "toString": lambda: s,
    }
    if name in meths:
        return _native(meths[name])
    if name.isdigit():
        i = int(name)
        return s[i] if i < len(s) else UNDEF
    return UNDEF


def _utf16_len(s: str) -> int:
    return sum(2 if ord(c) > 0xFFFF else 1 for c in s)


def _utf16_code_unit(s: str, i: int) -> int:
    # exact UTF-16 semantics only matter for astral chars, which the SPA's
    # charCodeAt call sites never index into; fall back per code point.
    units = []
    for c in s:
        cp = ord(c)
        if cp > 0xFFFF:
            cp -= 0x10000
            units.append(0xD800 + (cp >> 10))
            units.append(0xDC00 + (cp & 0x3FF))
        else:
            units.append(cp)
        if len(units) > i:
            break
    return units[i]


def _substring(s, a, b):
    x = max(0, min(to_int(a), len(s)))
    y = len(s) if b in (None, UNDEF) else max(0, min(to_int(b), len(s)))
    if x > y:
        x, y = y, x
    return s[x:y]


def _pad(s, n, fill, start):
    if len(s) >= n or not fill:
        return s
    pad = (fill * n)[: n - len(s)]
    return pad + s if start else s + pad


def _split(s, sep, limit):
    if sep is UNDEF:
        return JSArray([s])
    lim = None if limit in (None, UNDEF) else to_int(limit)
    if isinstance(sep, JSRegExp):
        parts = sep.re.split(s)
        parts = [p if p is not None else UNDEF for p in parts]
    else:
        sep = js_str(sep)
        parts = list(s) if sep == "" else s.split(sep)
    return JSArray(parts if lim is None else parts[:lim])


def _replace(s, pat, rep, all_):
    if isinstance(pat, JSRegExp):
        count = 0 if (pat.global_ or all_) else 1
        if callable(rep) or isinstance(rep, JSFunction):
            interp = _runtime_interp(rep)

            def sub_fn(m):
                args = [m.group(0)]
                args += [UNDEF if g is None else g for g in m.groups()]
                args += [float(m.start()), m.string]
                return js_str(interp.call_any(rep, args) if interp
                              else rep(*args))

            return pat.re.sub(sub_fn, s, count=count)
        template = js_str(rep)
        return pat.re.sub(lambda m: _expand_replacement(template, m), s,
                          count=count)
    pat = js_str(pat)
    if callable(rep) or isinstance(rep, JSFunction):
        interp = _runtime_interp(rep)
        out, start = [], 0
        n = -1 if all_ else 1
        while n != 0:
            i = s.find(pat, start)
            if i < 0:
                break
            out.append(s[start:i])
            val = (interp.call_any(rep, [pat, float(i), s]) if interp
                   else rep(pat, float(i), s))
            out.append(js_str(val))
            start = i + len(pat)
            n -= 1
        out.append(s[start:])
        return "".join(out)
    rep_s = js_str(rep).replace("$$", "$")
    return s.replace(pat, rep_s, -1 if all_ else 1)


def _runtime_interp(fn):
    if isinstance(fn, JSFunction):
        return fn.interp
    return None


def _match(s, pat):
    if not isinstance(pat, JSRegExp):
        pat = JSRegExp(js_str(pat))
    if pat.global_:
        out = JSArray(m.group(0) for m in pat.re.finditer(s))
        return out if out else None
    m = pat.re.search(s)
    return _match_array(m) if m else None


def _search(s, pat):
    if not isinstance(pat, JSRegExp):
        pat = JSRegExp(js_str(pat))
    m = pat.re.search(s)
    return float(m.start()) if m else -1.0


# -- number methods -----------------------------------------------------------


def _number_member(f: float, name: str):
    meths = {
        "toFixed": lambda d=0.0: f"{f:.{to_int(d)}f}",
        "toString": lambda base=10.0: _num_to_string(f, to_int(base)),
        "toPrecision": lambda p=6.0: f"{f:.{to_int(p)}g}",
        "valueOf": lambda: f,
    }
    return _native(meths[name]) if name in meths else UNDEF


def _num_to_string(f, base):
    if base == 10:
        return _num_str(f)
    n = to_int(f)
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    if n == 0:
        return "0"
    sign = "-" if n < 0 else ""
    n = abs(n)
    out = []
    while n:
        out.append(digits[n % base])
        n //= base
    return sign + "".join(reversed(out))


# -- array methods ------------------------------------------------------------


def _array_member(arr: JSArray, name: str, interp):
    def call(fn, *args):
        return interp.call_any(fn, list(args))

    if name == "length":
        return float(len(arr))
    if name == "index" and isinstance(arr, _JSMatchArray):
        return arr.index
    if name == "input" and isinstance(arr, _JSMatchArray):
        return arr.input
    if name == "groups" and isinstance(arr, _JSMatchArray):
        return arr.named

    meths = {
        "push": lambda *a: (arr.extend(a), float(len(arr)))[1],
        "pop": lambda: arr.pop() if arr else UNDEF,
        "shift": lambda: arr.pop(0) if arr else UNDEF,
        "unshift": lambda *a: (arr.__setitem__(slice(0, 0), list(a)),
                               float(len(arr)))[1],
        "slice": lambda a=0.0, b=None: JSArray(arr[
            _norm_idx(a, len(arr)):
            (len(arr) if b in (None, UNDEF) else _norm_idx(b, len(arr)))]),
        "splice": lambda start=0.0, dc=None, *items: _splice(arr, start, dc, items),
        "indexOf": lambda v, start=0.0: _index_of(arr, v, to_int(start)),
        "lastIndexOf": lambda v: _last_index_of(arr, v),
        "includes": lambda v, start=0.0: _index_of(arr, v, to_int(start)) >= 0,
        "join": lambda sep=",": js_str(sep).join(
            "" if x in (None, UNDEF) else js_str(x) for x in arr),
        "concat": lambda *a: JSArray(
            list(arr) + [y for x in a for y in (list(x) if isinstance(x, JSArray) else [x])]),
        "map": lambda fn: JSArray(
            call(fn, v, float(i), arr) for i, v in enumerate(list(arr))),
        "filter": lambda fn: JSArray(
            v for i, v in enumerate(list(arr)) if truthy(call(fn, v, float(i), arr))),
        "forEach": lambda fn: [call(fn, v, float(i), arr)
                               for i, v in enumerate(list(arr))] and UNDEF or UNDEF,
        "reduce": lambda fn, *init: _reduce(arr, fn, init, call),
        "reduceRight": lambda fn, *init: _reduce(
            JSArray(reversed(arr)), fn, init, call),
        "find": lambda fn: next(
            (v for i, v in enumerate(list(arr)) if truthy(call(fn, v, float(i), arr))), UNDEF),
        "findIndex": lambda fn: next(
            (float(i) for i, v in enumerate(list(arr)) if truthy(call(fn, v, float(i), arr))), -1.0),
        "findLast": lambda fn: next(
            (v for i, v in reversed(list(enumerate(list(arr))))
             if truthy(call(fn, v, float(i), arr))), UNDEF),
        "some": lambda fn: any(
            truthy(call(fn, v, float(i), arr)) for i, v in enumerate(list(arr))),
        "every": lambda fn: all(
            truthy(call(fn, v, float(i), arr)) for i, v in enumerate(list(arr))),
        "sort": lambda fn=UNDEF: _sort(arr, fn, call),
        "reverse": lambda: (arr.reverse(), arr)[1],
        "flat": lambda depth=1.0: _flat(arr, to_int(depth)),
        "flatMap": lambda fn: _flat(JSArray(
            call(fn, v, float(i), arr) for i, v in enumerate(list(arr))), 1),
        "fill": lambda v, a=0.0, b=None: _fill(arr, v, a, b),
        "keys": lambda: JSArray(float(i) for i in range(len(arr))),
        "values": lambda: JSArray(arr),
        "entries": lambda: JSArray(
            JSArray([float(i), v]) for i, v in enumerate(arr)),
        "at": lambda i=0.0: (arr[to_int(i)]
                             if -len(arr) <= to_int(i) < len(arr) else UNDEF),
        "toString": lambda: js_str(arr),
    }
    if name in meths:
        return _native(meths[name])
    if name.isdigit():
        i = int(name)
        return arr[i] if i < len(arr) else UNDEF
    return UNDEF


def _index_of(arr, v, start):
    for i in range(max(0, start), len(arr)):
        if strict_eq(arr[i], v) or arr[i] is v:
            return float(i)
    return -1.0


def _last_index_of(arr, v):
    for i in range(len(arr) - 1, -1, -1):
        if strict_eq(arr[i], v) or arr[i] is v:
            return float(i)
    return -1.0


def _splice(arr, start, dc, items):
    n = len(arr)
    s = to_int(start)
    s = max(0, s + n) if s < 0 else min(s, n)
    count = n - s if dc in (None, UNDEF) else max(0, to_int(dc))
    removed = JSArray(arr[s : s + count])
    arr[s : s + count] = list(items)
    return removed


def _reduce(arr, fn, init, call):
    items = list(enumerate(list(arr)))
    if init:
        acc = init[0]
    else:
        if not items:
            raise JSTypeError("reduce of empty array with no initial value")
        (_, acc), items = items[0], items[1:]
    for i, v in items:
        acc = call(fn, acc, v, float(i), arr)
    return acc


def _sort(arr, fn, call):
    import functools

    if fn is UNDEF or fn is None:
        arr.sort(key=js_str)
    else:
        def cmp(a, b):
            r = to_number(call(fn, a, b))
            return -1 if r < 0 else (1 if r > 0 else 0)

        arr.sort(key=functools.cmp_to_key(cmp))
    return arr


def _flat(arr, depth):
    out = JSArray()
    for v in arr:
        if isinstance(v, JSArray) and depth > 0:
            out.extend(_flat(v, depth - 1))
        else:
            out.append(v)
    return out


def _fill(arr, v, a, b):
    n = len(arr)
    x = _norm_idx(a, n)
    y = n if b in (None, UNDEF) else _norm_idx(b, n)
    for i in range(x, y):
        arr[i] = v
    return arr


# -- map/set/regex member tables ---------------------------------------------


def _map_member(m: JSMap, name):
    meths = {
        "get": m.get, "set": m.set, "has": m.has, "delete": m.delete,
        "clear": m.clear,
        "keys": lambda: JSArray(k for k, _v in m.entries_list()),
        "values": lambda: JSArray(v for _k, v in m.entries_list()),
        "entries": lambda: JSArray(JSArray([k, v]) for k, v in m.entries_list()),
        "forEach": lambda fn: [_foreach_cb(fn, v, k, m)
                               for k, v in m.entries_list()] and UNDEF or UNDEF,
    }
    if name == "size":
        return m.size
    return _native(meths[name]) if name in meths else UNDEF


def _set_member(s: JSSet, name):
    meths = {
        "add": s.add, "has": s.has, "delete": s.delete, "clear": s.clear,
        "forEach": lambda fn: [_foreach_cb(fn, v, v, s) for v in s.items] and UNDEF or UNDEF,
        "values": lambda: JSArray(s.items),
        "keys": lambda: JSArray(s.items),
    }
    if name == "size":
        return s.size
    return _native(meths[name]) if name in meths else UNDEF


def _foreach_cb(fn, v, k, coll):
    if isinstance(fn, JSFunction):
        return fn.interp.call_any(fn, [v, k, coll])
    return fn(v, k, coll)


def _regex_member(r: JSRegExp, name):
    if name == "test":
        return _native(r.test)
    if name == "exec":
        return _native(r.exec)
    if name == "source":
        return r.source
    if name == "flags":
        return r.flags
    if name == "global":
        return r.global_
    if name == "lastIndex":
        return float(r.lastIndex)
    return UNDEF
