"""jsrt language conformance: each case runs a JS snippet and checks the
value of `out` (converted via from_js). The suite is the safety net that
lets the SPA's real modules run on jsrt with confidence."""

import pytest

from tensortruth_tpu.jsrt import JSThrow, Runtime, from_js
from tensortruth_tpu.jsrt.lexer import JSSyntaxError


def run(src, **env):
    rt = Runtime()
    e = rt.run_script(src, env_vars=env or None)
    return from_js(e.get("out")) if e.lookup("out") else None


CASES = [
    # literals / arithmetic / precedence
    ("let out = 1 + 2 * 3;", 7),
    ("let out = (1 + 2) * 3;", 9),
    ("let out = 7 % 3;", 1),
    ("let out = 2 ** 10;", 1024),
    ("let out = 0x10 + 0b101 + 0o17;", 16 + 5 + 15),
    ("let out = 1_000_000;", 1000000),
    ("let out = 10 / 4;", 2.5),
    ("let out = -3 + +\"4\";", 1),
    ("let out = \"a\" + 1 + 2;", "a12"),
    ("let out = 1 + 2 + \"a\";", "3a"),
    # comparison / equality
    ("let out = 1 < 2 && 2 <= 2 && 3 > 2 && 3 >= 3;", True),
    ("let out = \"abc\" < \"abd\";", True),
    ("let out = 1 == \"1\";", True),
    ("let out = 1 === \"1\";", False),
    ("let out = null == undefined;", True),
    ("let out = null === undefined;", False),
    ("let out = NaN === NaN;", False),
    # logic / nullish / ternary
    ("let out = 0 || \"fallback\";", "fallback"),
    ("let out = 0 ?? \"fallback\";", 0),
    ("let out = null ?? \"fb\";", "fb"),
    ("let out = true ? \"y\" : \"n\";", "y"),
    ("let a = null; let out = a?.b?.c;", None),
    ("let a = {b: {c: 5}}; let out = a?.b?.c;", 5),
    ("let a = null; let out = a?.b.c ?? 9;", 9),
    # strings
    ("let out = \"hello\".toUpperCase();", "HELLO"),
    ("let out = \"a,b,,c\".split(\",\");", ["a", "b", "", "c"]),
    ("let out = \"abc\".split(\"\");", ["a", "b", "c"]),
    ("let out = \"  x \".trim();", "x"),
    ("let out = \"ab\".repeat(3);", "ababab"),
    ("let out = \"5\".padStart(3, \"0\");", "005"),
    ("let out = \"abcdef\".slice(1, -1);", "bcde"),
    ("let out = \"abcdef\".slice(-2);", "ef"),
    ("let out = \"abcdef\".substring(4, 1);", "bcd"),
    ("let out = \"abc\".charCodeAt(1);", 98),
    ("let out = String.fromCodePoint(0x1d538);", "\U0001d538"),
    ("let out = \"a-b-c\".replace(\"-\", \"+\");", "a+b-c"),
    ("let out = \"a-b-c\".replaceAll(\"-\", \"+\");", "a+b+c"),
    ("let out = `x${1 + 1}y${\"z\"}`;", "x2yz"),
    ("let out = `a\\nb`;", "a\nb"),
    ("let v = 5; let out = `${v > 3 ? `big ${v}` : \"small\"}`;", "big 5"),
    ("let out = \"abc\".includes(\"b\");", True),
    ("let out = \"caf\\u00e9\";", "café"),
    # numbers
    ("let out = (3.14159).toFixed(2);", "3.14"),
    ("let out = parseInt(\"42px\");", 42),
    ("let out = parseInt(\"ff\", 16);", 255),
    ("let out = parseFloat(\"2.5rem\");", 2.5),
    ("let out = Number.isInteger(4.0);", True),
    ("let out = Number(\"12\") + 1;", 13),
    ("let out = isNaN(\"abc\");", True),
    ("let out = Math.max(1, 5, 3);", 5),
    ("let out = Math.floor(-1.5);", -2),
    ("let out = Math.round(2.5);", 3),
    ("let out = (255).toString(16);", "ff"),
    # arrays
    ("let out = [1, 2, 3].map(x => x * 2);", [2, 4, 6]),
    ("let out = [1, 2, 3, 4].filter(x => x % 2 === 0);", [2, 4]),
    ("let out = [1, 2, 3].reduce((a, b) => a + b, 10);", 16),
    ("let out = [1, 2, 3].reduce((a, b) => a + b);", 6),
    ("let out = [3, 1, 2].sort();", [1, 2, 3]),
    ("let out = [3, 1, 2].sort((a, b) => b - a);", [3, 2, 1]),
    ("let out = [[1, 2], [3]].flat();", [1, 2, 3]),
    ("let out = [1, 2].concat([3], 4);", [1, 2, 3, 4]),
    ("let out = [1, 2, 3].indexOf(2);", 1),
    ("let out = [1, 2, 3].includes(4);", False),
    ("let out = [1, 2, 3].find(x => x > 1);", 2),
    ("let out = [1, 2, 3].findIndex(x => x > 5);", -1),
    ("let out = [1, 2, 3].some(x => x === 2);", True),
    ("let out = [1, 2, 3].every(x => x > 0);", True),
    ("let a = [1, 2, 3]; a.splice(1, 1, 9, 8); let out = a;", [1, 9, 8, 3]),
    ("let a = [1, 2]; a.push(3, 4); let out = a;", [1, 2, 3, 4]),
    ("let a = [1, 2, 3]; let out = [a.shift(), a];", [1, [2, 3]]),
    ("let out = [...[1, 2], ...[3]];", [1, 2, 3]),
    ("let out = Array.from(\"abc\");", ["a", "b", "c"]),
    ("let out = Array.from({length: 3}, (_, i) => i * 2);", [0, 2, 4]),
    ("let out = Array.isArray([1]);", True),
    ("let out = [1, 2, 3].join(\"-\");", "1-2-3"),
    ("let out = [1, [2, [3]]].flat(2);", [1, 2, 3]),
    ("let out = new Array(3).fill(0);", [0, 0, 0]),
    ("let a = [5, 6]; let out = a.at(-1);", 6),
    # objects
    ("let o = {a: 1, b: 2}; let out = Object.keys(o);", ["a", "b"]),
    ("let o = {a: 1}; let out = Object.values(o);", [1]),
    ("let o = {a: 1, b: 2}; let out = Object.entries(o);", [["a", 1], ["b", 2]]),
    ("let out = Object.fromEntries([[\"x\", 1]]);", {"x": 1}),
    ("let b = 7; let out = {a: 1, b};", {"a": 1, "b": 7}),
    ("let out = {...{a: 1}, b: 2};", {"a": 1, "b": 2}),
    ("let k = \"dyn\"; let out = {[k + \"x\"]: 5};", {"dynx": 5}),
    ("let o = {}; o.a = 1; o[\"b\"] = 2; let out = o;", {"a": 1, "b": 2}),
    ("let o = {a: {b: 3}}; let out = o.a.b;", 3),
    ("let o = {m(x) { return x * 2; }}; let out = o.m(21);", 42),
    ("let o = {a: 1}; delete o.a; let out = o;", {}),
    ("let o = {a: 1}; let out = \"a\" in o;", True),
    # destructuring
    ("let [a, b, ...rest] = [1, 2, 3, 4]; let out = [a, b, rest];", [1, 2, [3, 4]]),
    ("let {a, b = 5} = {a: 1}; let out = [a, b];", [1, 5]),
    ("let {a: {b}} = {a: {b: 9}}; let out = b;", 9),
    ("let {x, ...rest} = {x: 1, y: 2, z: 3}; let out = [x, rest];", [1, {"y": 2, "z": 3}]),
    ("let [, second] = [1, 2]; let out = second;", 2),
    ("let a = 1, b = 2; [a, b] = [b, a]; let out = [a, b];", [2, 1]),
    ("function f({a, b = 2}, [c]) { return a + b + c; } let out = f({a: 1}, [3]);", 6),
    # functions / closures / arrows
    ("function add(a, b) { return a + b; } let out = add(2, 3);", 5),
    ("let out = ((a, b = 10) => a + b)(5);", 15),
    ("function f(...args) { return args.length; } let out = f(1, 2, 3);", 3),
    ("function outer() { let c = 0; return () => ++c; } let inc = outer(); inc(); let out = inc();", 2),
    ("let fs = []; for (let i = 0; i < 3; i++) { fs.push(() => i); } let out = fs.map(f => f());", [0, 1, 2]),
    ("let out = [1, 2, 3].map(function (x) { return x + 1; });", [2, 3, 4]),
    ("function f(a) { return arguments.length; } let out = f(1, 2, 3);", 3),
    ("let f = x => y => x + y; let out = f(2)(3);", 5),
    # hoisting
    ("let out = hoisted(); function hoisted() { return \"up\"; }", "up"),
    # control flow
    ("let s = 0; for (let i = 0; i < 5; i++) { if (i === 3) { continue; } s += i; } let out = s;", 7),
    ("let s = 0; for (const x of [1, 2, 3]) { s += x; } let out = s;", 6),
    ("let ks = []; for (const k in {a: 1, b: 2}) { ks.push(k); } let out = ks;", ["a", "b"]),
    ("let s = \"\"; for (const ch of \"ab\") { s += ch + \".\"; } let out = s;", "a.b."),
    ("let i = 0; while (i < 4) { i++; } let out = i;", 4),
    ("let i = 0; do { i++; } while (i < 3); let out = i;", 3),
    ("let out = 0; for (let i = 0; i < 10; i++) { if (i === 5) { break; } out = i; }", 4),
    ("""let out; switch ("b") { case "a": out = 1; break; case "b": out = 2; break; default: out = 3; }""", 2),
    ("""let out = []; switch (1) { case 1: out.push("one"); case 2: out.push("two"); break; case 3: out.push("three"); }""", ["one", "two"]),
    ("""let out; switch (99) { case 1: out = 1; break; default: out = "dflt"; }""", "dflt"),
    # try/catch/finally & throw
    ("let out; try { throw new Error(\"boom\"); } catch (e) { out = e.message; }", "boom"),
    ("let out = []; try { out.push(1); } finally { out.push(2); }", [1, 2]),
    ("let out = []; try { throw 5; } catch { out.push(\"caught\"); } finally { out.push(\"fin\"); }", ["caught", "fin"]),
    ("function f() { try { return \"t\"; } finally { } } let out = f();", "t"),
    # typeof / instanceof
    ("let out = [typeof 1, typeof \"a\", typeof true, typeof undefined, typeof null, typeof {}, typeof (() => 0)];",
     ["number", "string", "boolean", "undefined", "object", "object", "function"]),
    ("let out = typeof neverDeclared;", "undefined"),
    # classes
    ("""class P { constructor(n) { this.n = n; } double() { return this.n * 2; } }
        let out = new P(21).double();""", 42),
    ("""class A { hi() { return "A"; } } class B extends A { hi() { return "B" + super.hi(); } }
        let out = new B().hi();""", "BA"),
    ("""class C { constructor() { this.v = 1; } static make() { return 7; } }
        let out = C.make();""", 7),
    ("""class D { constructor(x) { this.x = x; } get dbl() { return this.x * 2; } }
        let out = new D(4).dbl;""", 8),
    ("""class E { constructor() { this.items = []; } add(v) { this.items.push(v); return this; } }
        let out = new E().add(1).add(2).items;""", [1, 2]),
    ("""class F {} let f = new F(); let out = f instanceof F;""", True),
    # Map / Set
    ("let m = new Map(); m.set(\"a\", 1).set(\"b\", 2); let out = [m.get(\"a\"), m.size, m.has(\"c\")];", [1, 2, False]),
    ("let m = new Map([[\"x\", 1]]); let out = m.get(\"x\");", 1),
    ("let s = new Set([1, 2, 2, 3]); let out = s.size;", 3),
    ("let s = new Set(); s.add(1); s.add(1); let out = [...s];", [1]),
    ("let m = new Map([[\"a\", 1], [\"b\", 2]]); let out = [...m.keys()];", ["a", "b"]),
    ("let out = []; for (const [k, v] of new Map([[\"a\", 1]])) { out.push(k, v); }", ["a", 1]),
    # regex
    ("let out = /a(b+)c/.test(\"xabbbcy\");", True),
    ("let m = /a(b+)c/.exec(\"xabbcy\"); let out = [m[0], m[1], m.index];", ["abbc", "bb", 1]),
    ("let out = \"a1b22c\".replace(/\\d+/g, \"#\");", "a#b#c"),
    ("let out = \"a1b22\".replace(/(\\d+)/g, (m, g) => `[${g}]`);", "a[1]b[22]"),
    ("let out = \"aXbXc\".split(/X/);", ["a", "b", "c"]),
    ("let out = \"hello world\".match(/o(.)/)[1];", " "),
    ("let out = (\"abc abd\".match(/ab./g) || []).length;", 2),
    ("let out = \"a-b\".replace(/(\\w)-(\\w)/, \"$2-$1\");", "b-a"),
    ("let out = /^x/m.test(\"a\\nxb\");", True),
    ("let out = /a.c/s.test(\"a\\nc\");", True),
    ("let out = /ABC/i.test(\"abc\");", True),
    ("let r = /\\d/g; let out = [r.test(\"a1b2\"), r.lastIndex];", [True, 2]),
    # JSON
    ("let out = JSON.stringify({a: [1, \"x\", null], b: true});", '{"a":[1,"x",null],"b":true}'),
    ("let out = JSON.parse('{\"a\": [1, 2]}').a[1];", 2),
    ("let out = JSON.stringify(undefined);", None),
    # update / compound assignment
    ("let i = 5; i += 2; i *= 3; let out = i;", 21),
    ("let i = 1; let out = [i++, i, ++i, i];", [1, 2, 3, 3]),
    ("let o = {n: 1}; o.n ??= 9; o.m ??= 9; let out = o;", {"n": 1, "m": 9}),
    ("let a = [0, 1]; a[0] ||= 5; a[1] ||= 5; let out = a;", [5, 1]),
    # misc
    ("let out = encodeURIComponent(\"a b&c\");", "a%20b%26c"),
    ("let out = decodeURIComponent(\"a%20b\");", "a b"),
    ("let out = [NaN, Infinity, -Infinity].map(String);", ["NaN", "Infinity", "-Infinity"]),
    ("let out = String(1.0) + \"|\" + String(1.5) + \"|\" + String(0.1 + 0.2);", "1|1.5|0.30000000000000004"),
    ("let out = [1, 2] + \"\";", "1,2"),
    ("let out = void 0 === undefined;", True),
    ("let x = 5; { let x = 6; } let out = x;", 5),
]


@pytest.mark.parametrize("src,expected", CASES,
                         ids=[c[0][:60] for c in CASES])
def test_lang_case(src, expected):
    assert run(src) == expected


class TestAsync:
    def test_await_resolved_promise(self):
        assert run("""
            async function f() { return 5; }
            let out;
            async function main() { out = (await f()) + 1; }
            main();
        """) == 6

    def test_promise_then_chain(self):
        assert run("""
            let out = [];
            Promise.resolve(1).then(v => v + 1).then(v => { out.push(v); });
        """) == [2]

    def test_settimeout_ordering(self):
        assert run("""
            let out = [];
            setTimeout(() => out.push("late"), 10);
            setTimeout(() => out.push("early"), 1);
            Promise.resolve().then(() => out.push("micro"));
            out.push("sync");
        """) == ["sync", "micro", "early", "late"]

    def test_async_rejection_caught(self):
        assert run("""
            async function boom() { throw new Error("nope"); }
            let out;
            async function main() {
              try { await boom(); } catch (e) { out = e.message; }
            }
            main();
        """) == "nope"

    def test_promise_all(self):
        assert run("""
            let out;
            Promise.all([Promise.resolve(1), 2, Promise.resolve(3)])
              .then(vs => { out = vs; });
        """) == [1, 2, 3]

    def test_new_promise_executor(self):
        assert run("""
            let out;
            new Promise((resolve) => setTimeout(() => resolve("done"), 5))
              .then(v => { out = v; });
        """) == "done"

    def test_await_deadlock_detected(self):
        with pytest.raises(Exception, match="deadlock"):
            run("""
                let out;
                async function main() { out = await new Promise(() => {}); }
                main();
            """)


class TestModules:
    def test_import_export(self, tmp_path):
        (tmp_path / "util.js").write_text(
            "export function twice(x) { return x * 2; }\n"
            "export const NAME = \"util\";\n")
        (tmp_path / "main.js").write_text(
            "import {twice, NAME} from \"./util.js\";\n"
            "export const out = twice(4) + NAME.length;\n")
        rt = Runtime()
        exports = rt.load_module(tmp_path / "main.js")
        assert from_js(exports["out"]) == 12

    def test_namespace_and_alias_import(self, tmp_path):
        (tmp_path / "m.js").write_text("export const a = 1; export const b = 2;\n")
        (tmp_path / "main.js").write_text(
            "import * as M from \"./m.js\";\n"
            "import {a as alpha} from \"./m.js\";\n"
            "export const out = M.b + alpha;\n")
        rt = Runtime()
        assert from_js(rt.load_module(tmp_path / "main.js")["out"]) == 3

    def test_missing_export_fails_loud(self, tmp_path):
        (tmp_path / "m.js").write_text("export const a = 1;\n")
        (tmp_path / "main.js").write_text("import {ghost} from \"./m.js\";\n")
        rt = Runtime()
        with pytest.raises(JSThrow, match="ghost"):
            rt.load_module(tmp_path / "main.js")


class TestFailLoud:
    def test_unsupported_syntax_raises(self):
        with pytest.raises(JSSyntaxError):
            run("function* gen() { yield 1; }")  # generators: out of subset

    def test_labeled_loops_supported(self):
        assert run("""
            let out = [];
            outer: for (let i = 0; i < 3; i++) {
              for (let j = 0; j < 3; j++) {
                if (j === 1) { continue outer; }
                if (i === 2) { break outer; }
                out.push([i, j]);
              }
            }
        """) == [[0, 0], [1, 0]]

    def test_missing_semicolon_rejected(self):
        with pytest.raises(JSSyntaxError, match="semicolon"):
            run("let a = 1\nlet b = 2;")

    def test_undefined_member_read_throws(self):
        with pytest.raises(JSThrow):
            run("let a; let out = a.b;")

    def test_const_reassignment_throws(self):
        with pytest.raises(JSThrow):
            run("const a = 1; a = 2;")
