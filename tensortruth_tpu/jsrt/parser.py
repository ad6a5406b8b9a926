"""Recursive-descent parser for the jsrt ES subset (see lexer.py header).

AST = plain tuples, first element is the node kind. Unsupported syntax
raises JSSyntaxError at parse time — loud beats wrong for a CI runtime.
"""

from __future__ import annotations

from tensortruth_tpu.jsrt.lexer import JSSyntaxError, Tok, tokenize

ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=",
              "&&=", "||=", "??=", "<<=", ">>=", "**="}

_BIN_LEVELS = [
    {"??"},
    {"||"},
    {"&&"},
    {"|"},
    {"^"},
    {"&"},
    {"==", "!=", "===", "!=="},
    {"<", ">", "<=", ">=", "instanceof", "in"},
    {"<<", ">>", ">>>"},
    {"+", "-"},
    {"*", "/", "%"},
]


class Parser:
    def __init__(self, toks: list[Tok], filename: str = "<js>"):
        self.toks = toks
        self.i = 0
        self.filename = filename

    # -- token helpers -------------------------------------------------------

    def peek(self, off=0) -> Tok:
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at(self, kind, value=None, off=0) -> bool:
        t = self.peek(off)
        return t.kind == kind and (value is None or t.value == value)

    def at_punct(self, *vals) -> bool:
        t = self.peek()
        return t.kind == "punct" and t.value in vals

    def eat(self, kind, value=None):
        if self.at(kind, value):
            return self.next()
        return None

    def expect(self, kind, value=None) -> Tok:
        t = self.peek()
        if not self.at(kind, value):
            self.err(f"expected {value or kind}, got {t.kind} {t.value!r}")
        return self.next()

    def err(self, msg):
        raise JSSyntaxError(f"{self.filename}:{self.peek().line}: {msg}")

    # -- program -------------------------------------------------------------

    def parse_module(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.statement())
        return ("module", stmts)

    # -- statements ----------------------------------------------------------

    def statement(self):
        t = self.peek()
        if t.kind == "punct":
            if t.value == "{":
                return self.block()
            if t.value == ";":
                self.next()
                return ("empty",)
        if t.kind == "ident" and self.at("punct", ":", 1):
            name = self.next().value
            self.next()
            return ("label", name, self.statement())
        if t.kind == "keyword":
            kw = t.value
            if kw in ("let", "const", "var"):
                s = self.var_decl()
                self.semi()
                return s
            if kw == "function":
                return self.func_decl(is_async=False)
            if kw == "async" and self.at("keyword", "function", 1):
                self.next()
                return self.func_decl(is_async=True)
            if kw == "class":
                return self.class_decl()
            if kw == "if":
                return self.if_stmt()
            if kw == "for":
                return self.for_stmt()
            if kw == "while":
                self.next()
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                return ("while", cond, self.statement())
            if kw == "do":
                self.next()
                body = self.statement()
                self.expect("keyword", "while")
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                self.semi()
                return ("dowhile", body, cond)
            if kw == "switch":
                return self.switch_stmt()
            if kw == "try":
                return self.try_stmt()
            if kw == "return":
                self.next()
                if self.at_punct(";", "}") or self.at("eof") \
                        or self.peek().line != t.line:
                    self.semi()
                    return ("ret", None)
                e = self.expression()
                self.semi()
                return ("ret", e)
            if kw == "throw":
                self.next()
                e = self.expression()
                self.semi()
                return ("throw", e)
            if kw == "break":
                self.next()
                label = None
                if self.at("ident") and self.peek().line == t.line:
                    label = self.next().value
                self.semi()
                return ("brk", label)
            if kw == "continue":
                self.next()
                label = None
                if self.at("ident") and self.peek().line == t.line:
                    label = self.next().value
                self.semi()
                return ("cont", label)
            if kw == "import":
                return self.import_stmt()
            if kw == "export":
                return self.export_stmt()
        e = self.expression()
        self.semi()
        return ("expr", e)

    def semi(self):
        if not self.eat("punct", ";"):
            # tolerate ASI only where it is unambiguous: before `}` / EOF
            if not (self.at_punct("}") or self.at("eof")):
                self.err("missing semicolon (jsrt requires semicolons)")

    def block(self):
        self.expect("punct", "{")
        stmts = []
        while not self.at_punct("}"):
            if self.at("eof"):
                self.err("unterminated block")
            stmts.append(self.statement())
        self.next()
        return ("block", stmts)

    def var_decl(self):
        kind = self.next().value
        decls = []
        while True:
            target = self.binding_target()
            init = None
            if self.eat("punct", "="):
                init = self.assignment()
            decls.append((target, init))
            if not self.eat("punct", ","):
                break
        return ("var", kind, decls)

    def binding_target(self):
        if self.at("ident") or self.at("keyword", "of") or self.at("keyword", "from") \
                or self.at("keyword", "get") or self.at("keyword", "set") \
                or self.at("keyword", "static") or self.at("keyword", "async"):
            return ("pid", self.next().value)
        if self.at_punct("["):
            return self.array_pattern()
        if self.at_punct("{"):
            return self.object_pattern()
        self.err("expected binding target")

    def array_pattern(self):
        self.expect("punct", "[")
        elts, rest = [], None
        while not self.at_punct("]"):
            if self.at_punct(","):
                self.next()
                elts.append(None)  # hole
                continue
            if self.at_punct("..."):
                self.next()
                rest = self.binding_target()
                break
            p = self.binding_target()
            if self.eat("punct", "="):
                p = ("pdef", p, self.assignment())
            elts.append(p)
            if not self.at_punct("]"):
                self.expect("punct", ",")
        self.expect("punct", "]")
        return ("parr", elts, rest)

    def object_pattern(self):
        self.expect("punct", "{")
        props, rest = [], None
        while not self.at_punct("}"):
            if self.at_punct("..."):
                self.next()
                rest = self.binding_target()
                break
            key = self.next().value  # ident / keyword / str
            if self.eat("punct", ":"):
                p = self.binding_target()
            else:
                p = ("pid", key)
            if self.eat("punct", "="):
                p = ("pdef", p, self.assignment())
            props.append((key, p))
            if not self.at_punct("}"):
                self.expect("punct", ",")
        self.expect("punct", "}")
        return ("pobj", props, rest)

    def func_decl(self, is_async):
        self.expect("keyword", "function")
        name = self.expect("ident").value
        params = self.param_list()
        body = self.block()
        return ("func", name, params, body, is_async)

    def param_list(self):
        self.expect("punct", "(")
        params = []
        while not self.at_punct(")"):
            if self.at_punct("..."):
                self.next()
                params.append(("prest", self.binding_target()))
            else:
                p = self.binding_target()
                if self.eat("punct", "="):
                    p = ("pdef", p, self.assignment())
                params.append(p)
            if not self.at_punct(")"):
                self.expect("punct", ",")
        self.next()
        return params

    def class_decl(self):
        self.expect("keyword", "class")
        name = self.expect("ident").value
        parent = None
        if self.eat("keyword", "extends"):
            parent = self.unary()
        self.expect("punct", "{")
        methods = []  # (name, params, body, is_static, is_async, kind)
        while not self.at_punct("}"):
            if self.eat("punct", ";"):
                continue
            is_static = bool(self.at("keyword", "static")
                             and self.peek(1).kind in ("ident", "keyword")) and \
                bool(self.eat("keyword", "static"))
            is_async = bool(self.at("keyword", "async")
                            and not self.at("punct", "(", 1)) and \
                bool(self.eat("keyword", "async"))
            kind = "method"
            if self.at("keyword", "get") and not self.at("punct", "(", 1):
                self.next()
                kind = "getter"
            elif self.at("keyword", "set") and not self.at("punct", "(", 1):
                self.next()
                kind = "setter"
            mt = self.next()
            mname = mt.value
            params = self.param_list()
            body = self.block()
            methods.append((mname, params, body, is_static, is_async, kind))
        self.next()
        return ("class", name, parent, methods)

    def if_stmt(self):
        self.expect("keyword", "if")
        self.expect("punct", "(")
        cond = self.expression()
        self.expect("punct", ")")
        then = self.statement()
        other = None
        if self.eat("keyword", "else"):
            other = self.statement()
        return ("if", cond, then, other)

    def for_stmt(self):
        self.expect("keyword", "for")
        self.expect("punct", "(")
        init = None
        if self.at_punct(";"):
            self.next()
        else:
            if self.at("keyword", "let") or self.at("keyword", "const") \
                    or self.at("keyword", "var"):
                init = self.var_decl()
            else:
                init = ("expr", self.expression(no_in=True))
            if self.at("keyword", "of") or self.at("keyword", "in"):
                mode = self.next().value
                iterable = self.expression()
                self.expect("punct", ")")
                body = self.statement()
                if init[0] == "var":
                    target = init[2][0][0]
                    decl_kind = init[1]
                else:
                    target, decl_kind = _expr_to_pattern(init[1]), None
                return ("forof" if mode == "of" else "forin",
                        decl_kind, target, iterable, body)
            self.expect("punct", ";")
        cond = None if self.at_punct(";") else self.expression()
        self.expect("punct", ";")
        step = None if self.at_punct(")") else self.expression()
        self.expect("punct", ")")
        return ("for", init, cond, step, self.statement())

    def switch_stmt(self):
        self.expect("keyword", "switch")
        self.expect("punct", "(")
        disc = self.expression()
        self.expect("punct", ")")
        self.expect("punct", "{")
        cases = []
        while not self.at_punct("}"):
            if self.eat("keyword", "case"):
                test = self.expression()
            else:
                self.expect("keyword", "default")
                test = None
            self.expect("punct", ":")
            stmts = []
            while not (self.at_punct("}") or self.at("keyword", "case")
                       or self.at("keyword", "default")):
                stmts.append(self.statement())
            cases.append((test, stmts))
        self.next()
        return ("switch", disc, cases)

    def try_stmt(self):
        self.expect("keyword", "try")
        block = self.block()
        param = catch = final = None
        if self.eat("keyword", "catch"):
            if self.eat("punct", "("):
                param = self.binding_target()
                self.expect("punct", ")")
            catch = self.block()
        if self.eat("keyword", "finally"):
            final = self.block()
        return ("try", block, param, catch, final)

    def import_stmt(self):
        self.expect("keyword", "import")
        names = []  # (exported_name, local_name) ; "*" for namespace
        if self.at("str"):
            src = self.next().value  # side-effect import
            self.semi()
            return ("import", names, src)
        if self.at("ident"):  # default import
            names.append(("default", self.next().value))
            self.eat("punct", ",")
        if self.eat("punct", "*"):
            self.expect("ident", "as")
            names.append(("*", self.expect("ident").value))
        elif self.at_punct("{"):
            self.next()
            while not self.at_punct("}"):
                exported = self.next().value
                local = exported
                if self.at("ident", "as"):
                    self.next()
                    local = self.next().value
                names.append((exported, local))
                if not self.at_punct("}"):
                    self.expect("punct", ",")
            self.next()
        self.expect("keyword", "from")
        src = self.expect("str").value
        self.semi()
        return ("import", names, src)

    def export_stmt(self):
        self.expect("keyword", "export")
        if self.at_punct("{"):
            self.next()
            names = []
            while not self.at_punct("}"):
                local = self.next().value
                exported = local
                if self.at("ident", "as"):
                    self.next()
                    exported = self.next().value
                names.append((local, exported))
                if not self.at_punct("}"):
                    self.expect("punct", ",")
            self.next()
            self.semi()
            return ("exportnames", names)
        if self.at("keyword", "default"):
            self.next()
            e = self.expression()
            self.semi()
            return ("exportdefault", e)
        decl = self.statement()
        return ("exportdecl", decl)

    # -- expressions ---------------------------------------------------------

    def expression(self, no_in=False):
        e = self.assignment(no_in=no_in)
        if self.at_punct(","):
            exprs = [e]
            while self.eat("punct", ","):
                exprs.append(self.assignment(no_in=no_in))
            return ("seq", exprs)
        return e

    def assignment(self, no_in=False):
        arrow = self.try_arrow()
        if arrow is not None:
            return arrow
        left = self.conditional(no_in=no_in)
        t = self.peek()
        if t.kind == "punct" and t.value in ASSIGN_OPS:
            op = self.next().value
            right = self.assignment(no_in=no_in)
            return ("assign", op, _expr_to_target(left, self), right)
        return left

    def try_arrow(self):
        """Arrow functions need lookahead: `(a, b) =>`, `a =>`, `async a =>`."""
        start = self.i
        is_async = False
        if self.at("keyword", "async") and (
            self.at("ident", None, 1) or self.at("punct", "(", 1)
        ) and self.peek(1).line == self.peek().line:
            probe = self.i
            self.next()
            if self._arrow_ahead():
                is_async = True
            else:
                self.i = probe
                return None
        if not self._arrow_ahead():
            self.i = start
            return None
        if self.at("ident"):
            params = [("pid", self.next().value)]
        else:
            params = self.param_list()
        self.expect("punct", "=>")
        if self.at_punct("{"):
            body = self.block()
            return ("arrow", params, body, is_async, False)
        return ("arrow", params, self.assignment(), is_async, True)

    def _arrow_ahead(self) -> bool:
        if self.at("ident") and self.at("punct", "=>", 1):
            return True
        if not self.at_punct("("):
            return False
        depth, j = 0, self.i
        while j < len(self.toks):
            t = self.toks[j]
            if t.kind == "punct":
                if t.value == "(":
                    depth += 1
                elif t.value == ")":
                    depth -= 1
                    if depth == 0:
                        nxt = self.toks[j + 1] if j + 1 < len(self.toks) else None
                        return bool(nxt and nxt.kind == "punct" and nxt.value == "=>")
            j += 1
        return False

    def conditional(self, no_in=False):
        cond = self.binary(0, no_in=no_in)
        if self.at_punct("?") and not self.at_punct("?."):
            self.next()
            then = self.assignment()
            self.expect("punct", ":")
            other = self.assignment(no_in=no_in)
            return ("cond", cond, then, other)
        return cond

    def binary(self, level, no_in=False):
        if level >= len(_BIN_LEVELS):
            return self.exponent()
        left = self.binary(level + 1, no_in=no_in)
        ops = _BIN_LEVELS[level]
        while True:
            t = self.peek()
            name = t.value if t.kind in ("punct", "keyword") else None
            if name not in ops or (no_in and name == "in"):
                return left
            self.next()
            right = self.binary(level + 1, no_in=no_in)
            kind = "logic" if name in ("&&", "||", "??") else "bin"
            left = (kind, name, left, right)

    def exponent(self):
        base = self.unary()
        if self.at_punct("**"):
            self.next()
            return ("bin", "**", base, self.exponent())
        return base

    def unary(self):
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "~", "+", "-"):
            self.next()
            return ("un", t.value, self.unary())
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, _expr_to_target(self.unary(), self), True)
        if t.kind == "keyword" and t.value in ("typeof", "void", "delete"):
            self.next()
            return ("un", t.value, self.unary())
        if t.kind == "keyword" and t.value == "await":
            self.next()
            return ("await", self.unary())
        if t.kind == "keyword" and t.value == "new":
            self.next()
            callee = self.member_chain(self.primary(), no_call=True)
            args = []
            if self.at_punct("("):
                args = self.arg_list()
            return self.member_chain(("new", callee, args))
        return self.postfix()

    def postfix(self):
        e = self.member_chain(self.primary())
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--") and t.line == self.toks[self.i - 1].line:
            self.next()
            return ("update", t.value, _expr_to_target(e, self), False)
        return e

    def member_chain(self, e, no_call=False):
        # optional flag: 0 = plain, 1 = `?.` link, 2 = plain link AFTER a
        # `?.` in the same chain (short-circuits when the chain head was
        # nullish — JS optional chains cut the WHOLE tail)
        chained = False
        while True:
            tail = 2 if chained else 0
            if self.at_punct("."):
                self.next()
                e = ("member", e, self.next().value, tail)
            elif self.at_punct("?."):
                chained = True
                self.next()
                if self.at_punct("("):
                    e = ("call", e, self.arg_list(), 1)
                elif self.at_punct("["):
                    self.next()
                    idx = self.expression()
                    self.expect("punct", "]")
                    e = ("index", e, idx, 1)
                else:
                    e = ("member", e, self.next().value, 1)
            elif self.at_punct("["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx, tail)
            elif self.at_punct("(") and not no_call:
                e = ("call", e, self.arg_list(), tail)
            else:
                return e

    def arg_list(self):
        self.expect("punct", "(")
        args = []
        while not self.at_punct(")"):
            if self.at_punct("..."):
                self.next()
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if not self.at_punct(")"):
                self.expect("punct", ",")
        self.next()
        return args

    def primary(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            return ("num", t.value)
        if t.kind == "str":
            self.next()
            return ("str", t.value)
        if t.kind == "regex":
            self.next()
            return ("regex", t.value, t.flags)
        if t.kind == "template":
            self.next()
            parts = []
            for k, part in enumerate(t.parts):
                if k % 2 == 0:
                    parts.append(("lit", part))
                else:
                    sub = Parser(part + [Tok("eof", None, t.line)], self.filename)
                    parts.append(("expr", sub.expression()))
            return ("tmpl", parts)
        if t.kind == "ident":
            self.next()
            return ("ident", t.value)
        if t.kind == "ident" and self.at("punct", ":", 1):
            name = self.next().value
            self.next()
            return ("label", name, self.statement())
        if t.kind == "keyword":
            kw = t.value
            if kw == "true" or kw == "false":
                self.next()
                return ("bool", kw == "true")
            if kw == "null":
                self.next()
                return ("null",)
            if kw == "undefined":
                self.next()
                return ("undef",)
            if kw == "this":
                self.next()
                return ("this",)
            if kw == "super":
                self.next()
                return ("super",)
            if kw == "function":
                self.next()
                name = self.eat("ident")
                params = self.param_list()
                body = self.block()
                return ("funcexpr", name.value if name else None, params, body, False)
            if kw == "async" and self.at("keyword", "function", 1):
                self.next()
                self.next()
                name = self.eat("ident")
                params = self.param_list()
                body = self.block()
                return ("funcexpr", name.value if name else None, params, body, True)
            if kw == "class":
                return self.class_decl()
            # contextual keywords used as plain identifiers (get/set/of/from…)
            if kw in ("get", "set", "of", "from", "static", "async", "in"):
                self.next()
                return ("ident", kw)
        if t.kind == "punct":
            if t.value == "(":
                self.next()
                e = self.expression()
                self.expect("punct", ")")
                return e
            if t.value == "[":
                self.next()
                elts = []
                while not self.at_punct("]"):
                    if self.at_punct(","):
                        self.next()
                        elts.append(("undef",))
                        continue
                    if self.at_punct("..."):
                        self.next()
                        elts.append(("spread", self.assignment()))
                    else:
                        elts.append(self.assignment())
                    if not self.at_punct("]"):
                        self.expect("punct", ",")
                self.next()
                return ("arr", elts)
            if t.value == "{":
                return self.object_literal()
        self.err(f"unexpected token {t.kind} {t.value!r}")

    def object_literal(self):
        self.expect("punct", "{")
        props = []
        while not self.at_punct("}"):
            if self.at_punct("..."):
                self.next()
                props.append(("spread", self.assignment()))
            elif self.at_punct("["):
                self.next()
                key = self.assignment()
                self.expect("punct", "]")
                self.expect("punct", ":")
                props.append(("cprop", key, self.assignment()))
            else:
                is_async = bool(
                    self.at("keyword", "async")
                    and self.peek(1).kind in ("ident", "keyword", "str")
                ) and bool(self.eat("keyword", "async"))
                kt = self.next()
                key = kt.value if kt.kind != "num" else _num_key(kt.value)
                if self.at_punct("("):  # method shorthand
                    params = self.param_list()
                    body = self.block()
                    props.append(("prop", key,
                                  ("funcexpr", key, params, body, is_async)))
                elif self.eat("punct", ":"):
                    props.append(("prop", key, self.assignment()))
                else:  # shorthand {a}
                    props.append(("prop", key, ("ident", key)))
            if not self.at_punct("}"):
                self.expect("punct", ",")
        self.next()
        return ("obj", props)


def _num_key(v: float) -> str:
    return str(int(v)) if v == int(v) else repr(v)


def _expr_to_target(e, parser=None):
    """Assignment targets: identifiers, members, indexes, and destructuring
    array/object literals reinterpreted as patterns."""
    if e[0] in ("ident", "member", "index"):
        return e
    if e[0] == "arr":
        return _expr_to_pattern(e)
    if e[0] == "obj":
        return _expr_to_pattern(e)
    if parser:
        parser.err(f"invalid assignment target {e[0]}")
    raise JSSyntaxError(f"invalid assignment target {e[0]}")


def _expr_to_pattern(e):
    if e[0] == "ident":
        return ("pid", e[1])
    if e[0] in ("member", "index"):
        return ("ptarget", e)  # assign into existing object member
    if e[0] == "arr":
        elts, rest = [], None
        for el in e[1]:
            if el[0] == "spread":
                rest = _expr_to_pattern(el[1])
            elif el == ("undef",):
                elts.append(None)
            else:
                elts.append(_expr_to_pattern(el))
        return ("parr", elts, rest)
    if e[0] == "obj":
        props, rest = [], None
        for p in e[1]:
            if p[0] == "spread":
                rest = _expr_to_pattern(p[1])
            else:
                props.append((p[1], _expr_to_pattern(p[2])))
        return ("pobj", props, rest)
    raise JSSyntaxError(f"cannot destructure {e[0]}")


def parse(src: str, filename: str = "<js>"):
    return Parser(tokenize(src, filename), filename).parse_module()
