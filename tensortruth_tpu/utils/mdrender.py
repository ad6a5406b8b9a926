"""Python twin of the SPA renderer (static/assets/js/lib/{markdown,tex,highlight}.js).

The CI image has no JavaScript runtime or browser, so the browser renderer
cannot execute under pytest. This module is a line-faithful port of the three
JS files — same function structure, same regexes, same symbol tables — and is
the executable conformance surface: tests/integration/test_spa_render.py runs
every golden case in static/assets/markdown_cases.json against it, and a
table-sync test parses the JS sources to assert the symbol tables and case
lists haven't drifted. static/conformance.html executes the same cases in a
real browser when one is available (verify-skill live drive).

It also serves as the server-side markdown renderer (session export preview).

Reference parity: covers the rendering surface of the reference's
MemoizedMarkdown.tsx (react-markdown + remark-gfm + rehype-katex +
rehype-highlight — reference frontend/package.json:37,48-49).
"""

from __future__ import annotations

import re

# --------------------------------------------------------------------- esc


def escape_html(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


def safe_url(u: str) -> str | None:
    u = u.strip()
    if re.match(r"^https?://", u, re.I):
        return u
    if re.match(r"^/(?!/)", u):
        return u
    return None


# ===================================================================== tex

GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ", "epsilon": "ϵ",
    "varepsilon": "ε", "zeta": "ζ", "eta": "η", "theta": "θ", "vartheta": "ϑ",
    "iota": "ι", "kappa": "κ", "lambda": "λ", "mu": "μ", "nu": "ν", "xi": "ξ",
    "pi": "π", "varpi": "ϖ", "rho": "ρ", "varrho": "ϱ", "sigma": "σ",
    "varsigma": "ς", "tau": "τ", "upsilon": "υ", "phi": "ϕ", "varphi": "φ",
    "chi": "χ", "psi": "ψ", "omega": "ω",
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ", "Xi": "Ξ",
    "Pi": "Π", "Sigma": "Σ", "Upsilon": "Υ", "Phi": "Φ", "Psi": "Ψ",
    "Omega": "Ω",
}

SYMS = {
    "infty": "∞", "partial": "∂", "nabla": "∇", "pm": "±", "mp": "∓",
    "times": "×", "cdot": "⋅", "div": "÷", "ast": "∗", "star": "⋆",
    "bullet": "∙", "circ": "∘",
    "oplus": "⊕", "ominus": "⊖", "otimes": "⊗", "oslash": "⊘", "odot": "⊙",
    "leq": "≤", "le": "≤", "geq": "≥", "ge": "≥", "neq": "≠", "ne": "≠",
    "approx": "≈", "equiv": "≡", "sim": "∼", "simeq": "≃", "cong": "≅",
    "propto": "∝", "ll": "≪", "gg": "≫",
    "prec": "≺", "succ": "≻", "preceq": "⪯", "succeq": "⪰", "asymp": "≍",
    "doteq": "≐",
    "in": "∈", "notin": "∉", "ni": "∋", "subset": "⊂", "supset": "⊃",
    "subseteq": "⊆", "supseteq": "⊇", "sqsubseteq": "⊑", "sqsupseteq": "⊒",
    "cup": "∪", "cap": "∩", "sqcup": "⊔", "sqcap": "⊓", "setminus": "∖",
    "uplus": "⊎",
    "wedge": "∧", "land": "∧", "vee": "∨", "lor": "∨", "neg": "¬",
    "lnot": "¬",
    "forall": "∀", "exists": "∃", "nexists": "∄", "emptyset": "∅",
    "varnothing": "∅",
    "top": "⊤", "bot": "⊥", "vdash": "⊢", "dashv": "⊣", "models": "⊨",
    "perp": "⊥", "parallel": "∥", "mid": "∣", "nmid": "∤", "angle": "∠",
    "triangle": "△",
    "rightarrow": "→", "to": "→", "leftarrow": "←", "gets": "←",
    "leftrightarrow": "↔", "Rightarrow": "⇒", "implies": "⇒",
    "Leftarrow": "⇐", "Leftrightarrow": "⇔", "iff": "⇔", "mapsto": "↦",
    "longrightarrow": "⟶", "longleftarrow": "⟵", "Longrightarrow": "⟹",
    "Longleftarrow": "⟸", "longmapsto": "⟼",
    "uparrow": "↑", "downarrow": "↓", "updownarrow": "↕", "Uparrow": "⇑",
    "Downarrow": "⇓", "nearrow": "↗", "searrow": "↘", "swarrow": "↙",
    "nwarrow": "↖", "hookrightarrow": "↪", "hookleftarrow": "↩",
    "rightharpoonup": "⇀",
    "dots": "…", "ldots": "…", "cdots": "⋯", "vdots": "⋮", "ddots": "⋱",
    "prime": "′", "hbar": "ℏ", "ell": "ℓ", "Re": "ℜ", "Im": "ℑ",
    "aleph": "ℵ", "wp": "℘", "imath": "ı", "jmath": "ȷ", "dagger": "†",
    "ddagger": "‡", "S": "§", "P": "¶", "copyright": "©", "pounds": "£",
    "checkmark": "✓",
    "langle": "⟨", "rangle": "⟩", "lceil": "⌈", "rceil": "⌉",
    "lfloor": "⌊", "rfloor": "⌋",
    "lvert": "|", "rvert": "|", "lVert": "‖", "rVert": "‖", "Vert": "‖",
    "vert": "|", "backslash": "\\", "lbrace": "{", "rbrace": "}",
    "lbrack": "[", "rbrack": "]",
    "surd": "√", "degree": "°", "flat": "♭", "sharp": "♯", "natural": "♮",
    "therefore": "∴", "because": "∵", "coloneqq": "≔", "triangleq": "≜",
}

FUNCS = ["sin", "cos", "tan", "cot", "sec", "csc", "arcsin", "arccos",
         "arctan", "sinh", "cosh", "tanh", "coth", "log", "ln", "lg", "exp",
         "det", "dim", "ker", "deg", "gcd", "hom", "arg", "Pr", "tr", "rank",
         "sgn"]

BIGOPS = {
    "sum": "∑", "prod": "∏", "coprod": "∐", "int": "∫", "oint": "∮",
    "iint": "∬", "iiint": "∭", "bigcup": "⋃", "bigcap": "⋂",
    "bigoplus": "⨁", "bigotimes": "⨂", "bigodot": "⨀", "bigvee": "⋁",
    "bigwedge": "⋀", "bigsqcup": "⨆",
}

LIMFUNCS = ["lim", "limsup", "liminf", "max", "min", "sup", "inf",
            "argmax", "argmin"]

ALPHABETS = {
    "mathbb": (0x1D538, 0x1D552, 0x1D7D8,
               {"C": "ℂ", "H": "ℍ", "N": "ℕ", "P": "ℙ", "Q": "ℚ", "R": "ℝ",
                "Z": "ℤ"}),
    "mathcal": (0x1D49C, 0x1D4B6, None,
                {"B": "ℬ", "E": "ℰ", "F": "ℱ", "H": "ℋ", "I": "ℐ", "L": "ℒ",
                 "M": "ℳ", "R": "ℛ", "e": "ℯ", "g": "ℊ", "o": "ℴ"}),
    "mathfrak": (0x1D504, 0x1D51E, None,
                 {"C": "ℭ", "H": "ℌ", "I": "ℑ", "R": "ℜ", "Z": "ℨ"}),
    "mathscr": (0x1D49C, 0x1D4B6, None,
                {"B": "ℬ", "E": "ℰ", "F": "ℱ", "H": "ℋ", "I": "ℐ", "L": "ℒ",
                 "M": "ℳ", "R": "ℛ", "e": "ℯ", "g": "ℊ", "o": "ℴ"}),
}


def _map_alphabet(kind: str, text: str) -> str:
    up, lo, dig, exc = ALPHABETS[kind]
    out = []
    for ch in text:
        if exc and ch in exc:
            out.append(exc[ch])
        elif "A" <= ch <= "Z":
            out.append(chr(up + ord(ch) - 65))
        elif "a" <= ch <= "z":
            out.append(chr(lo + ord(ch) - 97))
        elif dig and "0" <= ch <= "9":
            out.append(chr(dig + ord(ch) - 48))
        else:
            out.append(ch)
    return "".join(out)


ACCENTS = {
    "hat": "\u0302", "widehat": "\u0302", "bar": "\u0304", "overline": None,
    "vec": "\u20d7", "tilde": "\u0303", "widetilde": "\u0303",
    "dot": "\u0307", "ddot": "\u0308", "check": "\u030c", "breve": "\u0306",
    "acute": "\u0301", "grave": "\u0300", "mathring": "\u030a",
}

SPACES = {",": " ", ":": " ", ";": " ", "!": "", " ": " ",
          "quad": " ", "qquad": "  ", "enspace": " "}

_REL_RE = re.compile(
    r"arrow|Arrow|leq|geq|neq|equiv|approx|sim|in$|subset|supset|models"
    r"|vdash|mapsto|to$|propto|cong|prec|succ|iff|implies")


def _tex_tokenize(tex: str):
    toks = []
    i = 0
    n = len(tex)
    while i < n:
        c = tex[i]
        if c == "\\":
            m = re.match(r"\\([a-zA-Z]+)\s*", tex[i:])
            if m:
                toks.append(("cs", m.group(1)))
                i += m.end()
            else:
                toks.append(("cs", tex[i + 1] if i + 1 < n else ""))
                i += 2
        elif c == "{":
            toks.append(("{", None)); i += 1
        elif c == "}":
            toks.append(("}", None)); i += 1
        elif c in "^_&":
            toks.append((c, None)); i += 1
        elif c.isspace():
            i += 1
        else:
            toks.append(("ch", c)); i += 1
    return toks


class _TexParser:
    def __init__(self, toks):
        self.toks = toks
        self.p = 0

    def peek(self):
        return self.toks[self.p] if self.p < len(self.toks) else None

    def next(self):
        t = self.toks[self.p]
        self.p += 1
        return t

    def done(self):
        return self.p >= len(self.toks)

    def parse_arg(self):
        tk = self.peek()
        if tk is None:
            return {"k": "group", "body": []}
        if tk[0] == "{":
            self.next()
            return {"k": "group", "body": self.parse_list("}")}
        atom = self.parse_atom()
        return atom or {"k": "group", "body": []}

    def parse_opt(self):
        tk = self.peek()
        if tk and tk[0] == "ch" and tk[1] == "[":
            self.next()
            body = []
            while not self.done():
                t = self.peek()
                if t[0] == "ch" and t[1] == "]":
                    self.next()
                    break
                a = self.parse_atom()
                if a:
                    body.append(a)
                else:
                    self.next()
            return {"k": "group", "body": body}
        return None

    def parse_list(self, closer, stop_cs=None):
        out = []
        while not self.done():
            tk = self.peek()
            if closer and tk[0] == closer:
                self.next()
                break
            if stop_cs and tk[0] == "cs" and tk[1] in stop_cs:
                break
            if tk[0] == "&" or (tk[0] == "cs" and tk[1] == "\\"):
                break
            atom = self.parse_atom_with_scripts()
            if atom:
                out.append(atom)
            else:
                self.next()
        return out

    def parse_atom_with_scripts(self):
        base = self.parse_atom()
        if not base:
            return None
        sup = sub = None
        while not self.done():
            tk = self.peek()
            if tk[0] == "^":
                self.next()
                sup = self.parse_arg()
            elif tk[0] == "_":
                self.next()
                sub = self.parse_arg()
            elif tk[0] == "ch" and tk[1] == "'":
                self.next()
                primes = "′"
                while (self.peek() and self.peek()[0] == "ch"
                       and self.peek()[1] == "'"):
                    self.next()
                    primes += "′"
                sup = ({"k": "group", "body": [sup, {"k": "ord", "v": primes}]}
                       if sup else {"k": "ord", "v": primes})
            else:
                break
        if sup or sub:
            return {"k": "scripts", "base": base, "sup": sup, "sub": sub}
        return base

    def parse_atom(self):
        tk = self.peek()
        if tk is None:
            return None
        if tk[0] == "{":
            self.next()
            return {"k": "group", "body": self.parse_list("}")}
        if tk[0] == "}":
            return None
        if tk[0] == "ch":
            self.next()
            c = tk[1]
            if re.match(r"[0-9.]", c):
                num = c
                while (self.peek() and self.peek()[0] == "ch"
                       and re.match(r"[0-9.]", self.peek()[1])):
                    num += self.next()[1]
                return {"k": "str", "v": num, "cls": "tex-mn"}
            if re.match(r"[a-zA-Z]", c):
                return {"k": "ord", "v": c}
            if c in "+−-*/=<>":
                return {"k": "bin", "v": "−" if c == "-" else c}
            if c in ",;:!?()[]|":
                return {"k": "str", "v": c, "cls": "tex-mo"}
            return {"k": "str", "v": c, "cls": ""}
        if tk[0] == "cs":
            return self.parse_command()
        return None

    def parse_command(self):  # noqa: C901 — mirrors the JS switch 1:1
        name = self.next()[1]
        if name in GREEK:
            return {"k": "ord", "v": GREEK[name]}
        if name in SYMS:
            rel = bool(_REL_RE.search(name))
            return {"k": "rel" if rel else "str", "v": SYMS[name],
                    "cls": "" if rel else "tex-mo"}
        if name in BIGOPS:
            return {"k": "op", "v": BIGOPS[name],
                    "limits": name not in ("int", "oint", "iint", "iiint")}
        if name in FUNCS:
            return {"k": "str", "v": name, "cls": "tex-fn"}
        if name in LIMFUNCS:
            disp = {"argmax": "arg max", "argmin": "arg min",
                    "limsup": "lim sup", "liminf": "lim inf"}.get(name, name)
            return {"k": "op", "v": disp, "limits": True, "fn": True}
        if name in SPACES:
            return {"k": "space", "v": SPACES[name]}
        if name in ACCENTS:
            body = self.parse_arg()
            if name == "overline":
                return {"k": "ov", "body": body}
            return {"k": "accent", "ch": ACCENTS[name], "body": body}
        if name in ("frac", "dfrac", "tfrac", "cfrac"):
            return {"k": "frac", "num": self.parse_arg(),
                    "den": self.parse_arg()}
        if name in ("binom", "dbinom", "tbinom"):
            a = self.parse_arg()
            b = self.parse_arg()
            return {"k": "delim", "left": "(", "right": ")",
                    "body": [{"k": "frac", "num": a, "den": b,
                              "noline": True}]}
        if name == "sqrt":
            idx = self.parse_opt()
            return {"k": "sqrt", "idx": idx, "body": self.parse_arg()}
        if name in ("text", "textrm", "textnormal", "mbox", "textit",
                    "textbf", "texttt"):
            cls = {"textit": "tex-textit", "textbf": "tex-textbf",
                   "texttt": "tex-tt"}.get(name, "tex-text")
            return {"k": "str", "v": self.read_raw_group(), "cls": cls}
        if name == "operatorname":
            return {"k": "str", "v": self.read_raw_group(), "cls": "tex-fn"}
        if name == "mathrm":
            return {"k": "style", "cls": "tex-rm", "body": self.parse_arg()}
        if name in ("mathbf", "boldsymbol", "bm"):
            return {"k": "style", "cls": "tex-bf", "body": self.parse_arg()}
        if name == "mathit":
            return {"k": "style", "cls": "tex-it", "body": self.parse_arg()}
        if name == "mathsf":
            return {"k": "style", "cls": "tex-sf", "body": self.parse_arg()}
        if name == "mathtt":
            return {"k": "style", "cls": "tex-tt", "body": self.parse_arg()}
        if name in ALPHABETS:
            raw = self.read_raw_group()
            return {"k": "str", "v": _map_alphabet(name, raw), "cls": "tex-rm"}
        if name == "underline":
            return {"k": "un", "body": self.parse_arg()}
        if name == "overbrace":
            return {"k": "ov", "body": self.parse_arg(), "brace": "⏞"}
        if name == "underbrace":
            return {"k": "un", "body": self.parse_arg(), "brace": "⏟"}
        if name == "overrightarrow":
            return {"k": "ov", "body": self.parse_arg(), "brace": "→"}
        if name in ("stackrel", "overset"):
            over = self.parse_arg()
            base = self.parse_arg()
            return {"k": "scripts", "base": base, "sup": over, "sub": None,
                    "over": True}
        if name == "underset":
            under = self.parse_arg()
            base = self.parse_arg()
            return {"k": "scripts", "base": base, "sup": None, "sub": under,
                    "over": True}
        if name == "left":
            return self.parse_delim()
        if name == "right":
            return None
        if name in ("big", "Big", "bigg", "Bigg", "bigl", "Bigl", "biggl",
                    "Biggl", "bigr", "Bigr", "biggr", "Biggr"):
            d = self.next() if not self.done() else None
            ch = (SYMS.get(d[1], "") if d and d[0] == "cs"
                  else (d[1] if d else ""))
            return {"k": "str", "v": ch or "", "cls": "tex-bigdelim"}
        if name == "begin":
            return self.parse_env()
        if name == "end":
            self.read_raw_group()
            return None
        if name in ("displaystyle", "textstyle", "scriptstyle", "limits",
                    "nolimits"):
            return {"k": "space", "v": ""}
        if name in ("label", "tag", "notag", "nonumber"):
            if self.peek() and self.peek()[0] == "{":
                self.read_raw_group()
            return {"k": "space", "v": ""}
        if name in ("phantom", "hphantom", "vphantom"):
            return {"k": "style", "cls": "tex-phantom",
                    "body": self.parse_arg()}
        if name == "not":
            a = self.parse_arg()
            return {"k": "group",
                    "body": [a, {"k": "str", "v": "\u0338", "cls": ""}]}
        if len(name) == 1 and not re.match(r"[a-zA-Z]", name):
            return {"k": "str", "v": name, "cls": "tex-mo"}
        return {"k": "str", "v": name, "cls": "tex-unknown"}

    def read_raw_group(self):
        tk = self.peek()
        if tk is None:
            return ""
        if tk[0] != "{":
            self.next()
            return tk[1] or ""
        self.next()
        depth = 1
        out = []
        while not self.done():
            t = self.next()
            if t[0] == "{":
                depth += 1
                out.append("{")
            elif t[0] == "}":
                depth -= 1
                if not depth:
                    break
                out.append("}")
            elif t[0] == "cs":
                out.append("\\" + t[1] + (" " if len(t[1]) > 1 else ""))
            elif t[0] == "ch":
                out.append(t[1])
            else:
                out.append(t[0])
        return "".join(out)

    def _delim_char(self, tok):
        if tok is None:
            return ""
        if tok[0] == "cs":
            return SYMS.get(tok[1], "" if tok[1] == "." else tok[1])
        return "" if tok[1] == "." else tok[1]

    def parse_delim(self):
        open_ = self.next() if not self.done() else None
        left = self._delim_char(open_)
        body = []
        right = ""
        depth = 0
        while not self.done():
            tk = self.peek()
            if tk[0] == "cs" and tk[1] == "left":
                depth += 1
            if tk[0] == "cs" and tk[1] == "right":
                if depth == 0:
                    self.next()
                    close = self.next() if not self.done() else None
                    right = self._delim_char(close)
                    break
                depth -= 1
            atom = self.parse_atom_with_scripts()
            if atom:
                body.append(atom)
            elif not self.done() and not (self.peek()[0] == "cs"
                                          and self.peek()[1] == "right"):
                self.next()
        return {"k": "delim", "left": left, "right": right, "body": body}

    def parse_env(self):
        name = re.sub(r"\*$", "", self.read_raw_group())
        rows = [[[]]]
        while not self.done():
            tk = self.peek()
            if tk[0] == "cs" and tk[1] == "end":
                self.next()
                self.read_raw_group()
                break
            if tk[0] == "cs" and tk[1] == "\\":
                self.next()
                rows.append([[]])
                continue
            if tk[0] == "&":
                self.next()
                rows[-1].append([])
                continue
            atom = self.parse_atom_with_scripts()
            if atom:
                rows[-1][-1].append(atom)
            else:
                self.next()
        if len(rows) > 1 and len(rows[-1]) == 1 and not rows[-1][0]:
            rows.pop()
        return {"k": "env", "name": name, "rows": rows}


def _tex_render_list(nodes, display):
    return "".join(_tex_render_node(n, display) for n in nodes)


def _tex_render_node(n, display):  # noqa: C901 — mirrors the JS switch 1:1
    if not n:
        return ""
    k = n["k"]
    if k == "ord":
        return f'<span class="tex-mi">{escape_html(n["v"])}</span>'
    if k == "str":
        return f'<span class="{n.get("cls") or "tex-mo"}">{escape_html(n["v"])}</span>'
    if k == "bin":
        return f'<span class="tex-bin">{escape_html(n["v"])}</span>'
    if k == "rel":
        return f'<span class="tex-rel">{escape_html(n["v"])}</span>'
    if k == "space":
        return f'<span class="tex-sp">{escape_html(n["v"])}</span>' if n["v"] else ""
    if k == "group":
        return _tex_render_list(n["body"], display)
    if k == "style":
        return f'<span class="{n["cls"]}">{_tex_render_node(n["body"], display)}</span>'
    if k == "op":
        cls = "tex-fn" if n.get("fn") else "tex-bigop"
        lim = " tex-limits" if display and n.get("limits") else ""
        return f'<span class="{cls}{lim}">{escape_html(n["v"])}</span>'
    if k == "frac":
        line = " tex-noline" if n.get("noline") else ""
        num = n["num"]["body"] if n["num"]["k"] == "group" else [n["num"]]
        den = n["den"]["body"] if n["den"]["k"] == "group" else [n["den"]]
        return (f'<span class="tex-frac"><span class="tex-num">'
                f'{_tex_render_list(num, False)}</span>'
                f'<span class="tex-den{line}">{_tex_render_list(den, False)}'
                f'</span></span>')
    if k == "sqrt":
        idx = (f'<span class="tex-rootidx">'
               f'{_tex_render_list(n["idx"]["body"], False)}</span>'
               if n.get("idx") else "")
        return (f'<span class="tex-sqrt">{idx}<span class="tex-surd">√</span>'
                f'<span class="tex-radicand">'
                f'{_tex_render_node(n["body"], display)}</span></span>')
    if k == "scripts":
        base = _tex_render_node(n["base"], display)
        stacked = n.get("over") or (display and n["base"]
                                    and n["base"].get("k") == "op"
                                    and n["base"].get("limits"))
        if stacked:
            over = (f'<span class="tex-over">'
                    f'{_tex_render_node(n["sup"], False)}</span>'
                    if n.get("sup") else "")
            under = (f'<span class="tex-under">'
                     f'{_tex_render_node(n["sub"], False)}</span>'
                     if n.get("sub") else "")
            return (f'<span class="tex-stack">{over}'
                    f'<span class="tex-stackbase">{base}</span>{under}</span>')
        if n.get("sup") and n.get("sub"):
            scripts = (f'<span class="tex-vscripts"><span class="tex-sup">'
                       f'{_tex_render_node(n["sup"], False)}</span>'
                       f'<span class="tex-sub">'
                       f'{_tex_render_node(n["sub"], False)}</span></span>')
        elif n.get("sup"):
            scripts = (f'<sup class="tex-sup">'
                       f'{_tex_render_node(n["sup"], False)}</sup>')
        elif n.get("sub"):
            scripts = (f'<sub class="tex-sub">'
                       f'{_tex_render_node(n["sub"], False)}</sub>')
        else:
            scripts = ""
        return base + scripts
    if k == "accent":
        inner = _tex_render_node(n["body"], False)
        mark = (f'<span class="tex-accent-mark">{escape_html(n["ch"])}</span>'
                if n.get("ch") else "")
        return f'<span class="tex-accent">{inner}{mark}</span>'
    if k == "ov":
        mark = (f' tex-brace" data-brace="{escape_html(n["brace"])}'
                if n.get("brace") else "")
        return (f'<span class="tex-overline{mark}">'
                f'{_tex_render_node(n["body"], display)}</span>')
    if k == "un":
        mark = (f' tex-brace-under" data-brace="{escape_html(n["brace"])}'
                if n.get("brace") else "")
        return (f'<span class="tex-underline{mark}">'
                f'{_tex_render_node(n["body"], display)}</span>')
    if k == "delim":
        left = (f'<span class="tex-delim">{escape_html(n["left"])}</span>'
                if n["left"] else "")
        right = (f'<span class="tex-delim">{escape_html(n["right"])}</span>'
                 if n["right"] else "")
        return (f'<span class="tex-fenced">{left}'
                f'<span class="tex-fenced-body">'
                f'{_tex_render_list(n["body"], display)}</span>{right}</span>')
    if k == "env":
        return _tex_render_env(n, display)
    return ""


_ENV_FENCES = {
    "pmatrix": ("(", ")"), "bmatrix": ("[", "]"), "Bmatrix": ("{", "}"),
    "vmatrix": ("|", "|"), "Vmatrix": ("‖", "‖"), "matrix": ("", ""),
    "cases": ("{", ""), "array": ("", ""), "aligned": ("", ""),
    "align": ("", ""), "alignat": ("", ""), "gather": ("", ""),
    "split": ("", ""), "smallmatrix": ("", ""),
}


def _tex_render_env(n, display):
    left, right = _ENV_FENCES.get(n["name"], ("", ""))
    aligned = n["name"] in ("aligned", "align", "alignat", "split", "cases")
    rows_html = []
    for cells in n["rows"]:
        cell_html = []
        for i, cell in enumerate(cells):
            cls = ((" tex-aleft" if i % 2 else " tex-aright")
                   if aligned else "")
            cell_html.append(f'<span class="tex-mcell{cls}">'
                             f'{_tex_render_list(cell, display)}</span>')
        rows_html.append(f'<span class="tex-mrow">{"".join(cell_html)}</span>')
    lh = (f'<span class="tex-delim tex-envdelim">{escape_html(left)}</span>'
          if left else "")
    rh = (f'<span class="tex-delim tex-envdelim">{escape_html(right)}</span>'
          if right else "")
    return (f'<span class="tex-fenced">{lh}'
            f'<span class="tex-matrix tex-env-{escape_html(n["name"])}">'
            f'{"".join(rows_html)}</span>{rh}</span>')


def render_tex(tex: str, display: bool = False) -> str:
    """TeX-subset → HTML (twin of tex.js renderTex). Never raises."""
    try:
        parser = _TexParser(_tex_tokenize(tex))
        body = []
        while not parser.done():
            atom = parser.parse_atom_with_scripts()
            if atom:
                body.append(atom)
            else:
                parser.next()
        cls = "tex tex-display" if display else "tex tex-inline"
        return f'<span class="{cls}">{_tex_render_list(body, bool(display))}</span>'
    except Exception:
        return (f'<span class="tex tex-error" title="TeX parse error">'
                f'{escape_html(tex)}</span>')


# =============================================================== highlight

KW = {
    "python": "False None True and as assert async await break class continue def del elif else except finally for from global if import in is lambda nonlocal not or pass raise return try while with yield match case self cls",
    "js": "abstract arguments async await break case catch class const continue debugger default delete do else enum export extends false finally for from function get if implements import in instanceof interface let new null of private protected public return set static super switch this throw true try typeof undefined var void while with yield type",
    "c": "alignas alignof auto bool break case catch char class const constexpr const_cast continue decltype default delete do double dynamic_cast else enum explicit extern false final float for friend goto if inline int long mutable namespace new noexcept nullptr operator override private protected public register reinterpret_cast restrict return short signed sizeof static static_assert static_cast struct switch template this throw true try typedef typeid typename union unsigned using virtual void volatile wchar_t while int8_t int16_t int32_t int64_t uint8_t uint16_t uint32_t uint64_t size_t ssize_t",
    "bash": "if then else elif fi for while until do done case esac function in select time coproc break continue return exit export local readonly declare unset shift source alias echo printf read cd pwd test set trap eval exec wait true false",
    "sql": "select from where insert into values update set delete create table drop alter index join inner left right outer on as and or not null primary key foreign references group by order having limit offset distinct union all exists between like in is count sum avg min max",
    "rust": "as async await break const continue crate dyn else enum extern false fn for if impl in let loop match mod move mut pub ref return self Self static struct super trait true type unsafe use where while",
    "go": "break case chan const continue default defer else fallthrough for func go goto if import interface map package range return select struct switch type var nil true false",
    "java": "abstract assert boolean break byte case catch char class const continue default do double else enum extends final finally float for goto if implements import instanceof int interface long native new package private protected public return short static strictfp super switch synchronized this throw throws transient try void volatile while var record sealed true false null",
}
ALIASES = {
    "py": "python", "python3": "python", "javascript": "js",
    "typescript": "js", "ts": "js", "jsx": "js", "tsx": "js", "node": "js",
    "cpp": "c", "c++": "c", "cc": "c", "h": "c", "hpp": "c", "cuda": "c",
    "sh": "bash", "shell": "bash", "zsh": "bash", "console": "bash",
    "golang": "go", "yml": "yaml",
}
_KWSETS = {k: set(v.split()) for k, v in KW.items()}


def _hl_rules(lang):
    r = []
    if lang == "python":
        r.append((re.compile(r"^(#[^\n]*)"), "hl-com"))
        r.append((re.compile(r'^("""[\s\S]*?"""|\'\'\'[\s\S]*?\'\'\')'), "hl-str"))
        r.append((re.compile(
            r'^([rbfu]{0,2}"(?:\\.|[^"\\\n])*"|[rbfu]{0,2}\'(?:\\.|[^\'\\\n])*\')',
            re.I), "hl-str"))
        r.append((re.compile(r"^(@[A-Za-z_][\w.]*)"), "hl-meta"))
    elif lang in ("js", "c", "rust", "go", "java"):
        r.append((re.compile(r"^(//[^\n]*)"), "hl-com"))
        r.append((re.compile(r"^(/\*[\s\S]*?\*/)"), "hl-com"))
        r.append((re.compile(r"^(`(?:\\.|[^`\\])*`)"), "hl-str"))
        r.append((re.compile(
            r'^("(?:\\.|[^"\\\n])*"|\'(?:\\.|[^\'\\\n])*\')'), "hl-str"))
        if lang == "c":
            r.append((re.compile(r"^(#\s*\w+)"), "hl-meta"))
        if lang in ("rust", "java"):
            r.append((re.compile(r"^(#!?\[[^\]]*\]|@[A-Za-z_][\w.]*)"), "hl-meta"))
    elif lang == "bash":
        r.append((re.compile(r"^(#[^\n]*)"), "hl-com"))
        r.append((re.compile(r'^("(?:\\.|[^"\\])*"|\'[^\']*\')'), "hl-str"))
        r.append((re.compile(r"^(\$\{[^}]*\}|\$\w+)"), "hl-var"))
    elif lang == "sql":
        r.append((re.compile(r"^(--[^\n]*)"), "hl-com"))
        r.append((re.compile(r"^('(?:''|[^'])*')"), "hl-str"))
    elif lang == "yaml":
        r.append((re.compile(r"^(#[^\n]*)"), "hl-com"))
        r.append((re.compile(
            r'^("(?:\\.|[^"\\\n])*"|\'[^\'\n]*\')'), "hl-str"))
        r.append((re.compile(r"^([A-Za-z_][\w\- .]*)(?=:(\s|$))"), "hl-attr"))
        r.append((re.compile(r"^(&\w+|\*\w+|!!\w+)"), "hl-meta"))
    elif lang == "json":
        r.append((re.compile(r'^("(?:\\.|[^"\\])*")(?=\s*:)'), "hl-attr"))
        r.append((re.compile(r'^("(?:\\.|[^"\\])*")'), "hl-str"))
        r.append((re.compile(r"^(true|false|null)\b"), "hl-kw"))
    r.append((re.compile(
        r"^(0[xX][0-9a-fA-F_]+|\d[\d_]*\.?\d*(?:[eE][+-]?\d+)?[fFlLuU]*)"),
        "hl-num"))
    return r


def highlight(code: str, lang: str = "") -> str:
    """Code → token-highlighted HTML (twin of highlight.js highlight())."""
    lang = (lang or "").lower()
    lang = ALIASES.get(lang, lang)
    kws = _KWSETS.get(lang)
    rules = _hl_rules(lang)
    if not kws and lang not in ("json", "yaml"):
        return escape_html(code)

    out = []
    i = 0
    n = len(code)
    word_re = re.compile(r"^[A-Za-z_]\w*", re.A)
    while i < n:
        rest = code[i:]
        matched = False
        for rx, cls in rules:
            m = rx.match(rest)
            if m:
                out.append(f'<span class="{cls}">{escape_html(m.group(1))}</span>')
                i += len(m.group(1))
                matched = True
                break
        if matched:
            continue
        w = word_re.match(rest)
        if w:
            word = w.group(0)
            if kws and word in kws:
                out.append(f'<span class="hl-kw">{escape_html(word)}</span>')
            elif word[0].isupper() and lang in ("python", "js", "c", "rust",
                                                "go", "java"):
                out.append(f'<span class="hl-type">{escape_html(word)}</span>')
            elif i + len(word) < n and code[i + len(word)] == "(":
                out.append(f'<span class="hl-fn">{escape_html(word)}</span>')
            else:
                out.append(escape_html(word))
            i += len(word)
            continue
        out.append(escape_html(code[i]))
        i += 1
    return "".join(out)


# ================================================================ markdown


def _render_inline(text: str) -> str:
    s = escape_html(text)

    def img(m):
        u = safe_url(m.group(2))
        if u:
            return (f'<img src="{u}" alt="{m.group(1)}" '
                    f'style="max-width:100%;border-radius:8px">')
        return m.group(0)

    def link(m):
        u = safe_url(m.group(2))
        if u:
            return (f'<a href="{u}" target="_blank" rel="noopener">'
                    f'{m.group(1)}</a>')
        return m.group(0)

    s = re.sub(r"!\[([^\]]*)\]\(([^)\s]+)(?:\s+[^)]*)?\)", img, s)
    s = re.sub(r"\[([^\]]+)\]\(([^)\s]+)(?:\s+[^)]*)?\)", link, s)
    s = re.sub(r"\*\*\*([^*]+)\*\*\*", r"<strong><em>\1</em></strong>", s)
    s = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", s)
    s = re.sub(r"(^|[^\w*])\*([^*\n]+)\*(?![\w*])", r"\1<em>\2</em>", s,
               flags=re.A)
    s = re.sub(r"(^|[^\w])_([^_\n]+)_(?![\w])", r"\1<em>\2</em>", s,
               flags=re.A)
    s = re.sub(r"~~([^~\n]+)~~", r"<del>\1</del>", s)
    return s


def _collect_list_items(lines, i):
    items = []
    item_re = re.compile(r"^(\s*)([-*+]|\d+[.)])\s+(.*)$")
    while i < len(lines):
        m = item_re.match(lines[i])
        if m:
            items.append({"indent": len(m.group(1)),
                          "ordered": m.group(2)[0].isdigit(),
                          "lines": [m.group(3)]})
            i += 1
        elif not lines[i].strip():
            if (i + 1 < len(lines)
                    and (item_re.match(lines[i + 1])
                         or re.match(r"^\s{2,}\S", lines[i + 1]))):
                i += 1
            else:
                break
        elif items and re.match(r"^\s{2,}\S", lines[i]):
            items[-1]["lines"].append(re.sub(r"^\s{1,4}", "", lines[i]))
            i += 1
        else:
            break
    return items, i


def _build_list(items, i, level):
    ordered = items[i]["ordered"]
    html = "<ol>" if ordered else "<ul>"
    while i < len(items) and items[i]["indent"] >= level:
        if items[i]["indent"] > level:
            sub, i = _build_list(items, i, items[i]["indent"])
            if html.endswith("</li>"):
                html = html[:-5] + sub + "</li>"
            else:
                html += f"<li>{sub}</li>"
            continue
        body = "\n".join(items[i]["lines"])
        cls = ""
        task = re.match(r"^\[([ xX])\]\s+([\s\S]*)$", body)
        if task:
            on = task.group(1) != " "
            cls = ' class="task"'
            checked = " checked" if on else ""
            body = (f'<input type="checkbox" disabled{checked}> '
                    + _render_inline(task.group(2)).replace("\n", "<br>"))
        else:
            body = _render_inline(body).replace("\n", "<br>")
        html += f"<li{cls}>{body}"
        i += 1
        if i < len(items) and items[i]["indent"] > level:
            sub, i = _build_list(items, i, items[i]["indent"])
            html += sub
        html += "</li>"
    return html + ("</ol>" if ordered else "</ul>"), i


def _render_table(lines, i):
    rows = []
    while i < len(lines) and re.match(r"^\s*\|.*\|\s*$", lines[i]):
        rows.append(lines[i].strip())
        i += 1

    def cells(line):
        return [_render_inline(c.strip())
                for c in re.sub(r"^\||\|$", "", line).split("|")]

    head = cells(rows[0])
    body = [cells(r) for r in rows[2:]]
    html = ("<table><thead><tr>"
            + "".join(f"<th>{h}</th>" for h in head)
            + "</tr></thead><tbody>"
            + "".join("<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>"
                      for r in body)
            + "</tbody></table>")
    return html, i


_BLOCK_START = re.compile(r"^(\s*)(#{1,6}\s|>|[-*+]\s|\d+[.)]\s|\|)")
_PLACEHOLDER_LINE = re.compile(r"^\s*(?:\x00MD\d+\x00\s*)+$")


def _parse_blocks(text: str) -> str:
    lines = text.split("\n")
    html = []
    i = 0
    while i < len(lines):
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        if _PLACEHOLDER_LINE.match(line):
            html.append(line.strip())
            i += 1
            continue
        m = re.match(r"^(#{1,6})\s+(.*?)\s*#*\s*$", line)
        if m:
            lvl = len(m.group(1))
            html.append(f"<h{lvl}>{_render_inline(m.group(2))}</h{lvl}>")
            i += 1
            continue
        if re.match(r"^\s*((-\s*){3,}|(\*\s*){3,}|(_\s*){3,})$", line):
            html.append("<hr>")
            i += 1
            continue
        if re.match(r"^\s*>", line):
            buf = []
            while i < len(lines) and (
                    re.match(r"^\s*>", lines[i])
                    or (buf and lines[i].strip()
                        and not _BLOCK_START.match(lines[i]))):
                buf.append(re.sub(r"^\s*> ?", "", lines[i]))
                i += 1
            html.append(f"<blockquote>{_parse_blocks(chr(10).join(buf))}"
                        f"</blockquote>")
            continue
        if (re.match(r"^\s*\|.*\|\s*$", line) and i + 1 < len(lines)
                and re.match(r"^\s*\|[\s:|-]+\|\s*$", lines[i + 1])):
            tbl, i = _render_table(lines, i)
            html.append(tbl)
            continue
        if re.match(r"^(\s*)([-*+]|\d+[.)])\s+", line):
            items, ni = _collect_list_items(lines, i)
            if items:
                lst, _ = _build_list(items, 0, items[0]["indent"])
                html.append(lst)
                i = ni
                continue
        buf = [line]
        i += 1
        while (i < len(lines) and lines[i].strip()
               and not _BLOCK_START.match(lines[i])
               and not _PLACEHOLDER_LINE.match(lines[i])):
            buf.append(lines[i])
            i += 1
        html.append(f'<p>{_render_inline(chr(10).join(buf)).replace(chr(10), "<br>")}</p>')
    return "".join(html)


def _code_block(lang: str, code: str) -> str:
    label = (f'<span class="code-lang">{escape_html(lang)}</span>'
             if lang else "")
    return (f'<pre>{label}<code class="lang-{escape_html(lang or "text")}">'
            f'{highlight(re.sub(chr(10) + "$", "", code), lang)}</code></pre>')


_INLINE_MATH = re.compile(r"\$([^\s$](?:[^$\n]*[^\s$])?)\$(?!\d)")


def render_markdown(src: str) -> str:
    """Markdown → HTML (twin of markdown.js renderMarkdown)."""
    slots: list[str] = []

    def put(html: str) -> str:
        slots.append(html)
        return f"\x00MD{len(slots) - 1}\x00"

    src = re.sub(r"```([\w+#.-]*)[^\S\n]*\n?([\s\S]*?)(?:```|$)",
                 lambda m: put(_code_block(m.group(1), m.group(2))), src)
    src = re.sub(r"`([^`\n]+)`",
                 lambda m: put(f"<code>{escape_html(m.group(1))}</code>"), src)
    src = re.sub(r"\$\$([\s\S]+?)\$\$",
                 lambda m: put(render_tex(m.group(1).strip(), True)), src)
    src = re.sub(r"\\\[([\s\S]+?)\\\]",
                 lambda m: put(render_tex(m.group(1).strip(), True)), src)
    src = re.sub(r"\\\(([\s\S]+?)\\\)",
                 lambda m: put(render_tex(m.group(1).strip(), False)), src)

    def inline_math(m):
        off = m.start()
        if off > 0 and m.string[off - 1] in ("\\", "$"):
            return m.group(0)
        return put(render_tex(m.group(1), False))

    src = _INLINE_MATH.sub(inline_math, src)

    html = _parse_blocks(src)
    for _ in range(8):
        if "\x00" not in html:
            break
        html = re.sub(r"\x00MD(\d+)\x00", lambda m: slots[int(m.group(1))],
                      html)
    return html


# ================================================================ streaming

def split_blocks(src: str) -> list[str]:
    """Twin of mdstream.js splitBlocks: blank-line block split that never
    cuts inside a fenced code block or a multi-line ``$$`` display-math
    region (renderMarkdown's extraction pass needs opener and closer in the
    same string). Used by the SPA's memoized streaming repaint; mirrored
    here so the split invariants are testable without a JS runtime."""
    blocks: list[str] = []
    cur: list[str] = []
    fence = False
    math = False
    for line in src.split("\n"):
        if not math and re.match(r"^\s*```", line):
            fence = not fence
        elif not fence:
            if line.count("$$") % 2 == 1:
                math = not math
        if not fence and not math and re.match(r"^\s*$", line):
            if cur:
                blocks.append("\n".join(cur))
                cur = []
            continue
        cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    return blocks
