"""Tree-walking evaluator for the jsrt ES subset (see lexer.py header).

Value model:
    undefined → UNDEF singleton        null  → Python None
    number    → Python float           bool  → Python bool
    string    → Python str             array → JSArray (list subclass)
    object    → JSObject               function → JSFunction / native callable

``await`` runs cooperatively: awaiting a pending JSPromise pumps the
runtime's job queue (microtasks + timers) until it settles — deterministic
for tests, no host event loop required.
"""

from __future__ import annotations

from tensortruth_tpu.jsrt.parser import parse

# -- values -------------------------------------------------------------------


class JSUndefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = JSUndefined()


class JSArray(list):
    pass


class JSObject:
    __slots__ = ("props", "_class")

    def __init__(self, props=None, _class=None):
        self.props = props if props is not None else {}
        self._class = _class

    def __repr__(self):  # pragma: no cover - debug aid
        return f"JSObject({self.props!r})"


class JSFunction:
    __slots__ = ("name", "params", "body", "env", "this", "is_async",
                 "is_arrow", "is_expr_body", "interp", "home_class",
                 "bound_this", "props")

    def __init__(self, name, params, body, env, interp, this=UNDEF,
                 is_async=False, is_arrow=False, is_expr_body=False,
                 home_class=None):
        self.name = name or ""
        self.params = params
        self.body = body
        self.env = env
        self.this = this
        self.is_async = is_async
        self.is_arrow = is_arrow
        self.is_expr_body = is_expr_body
        self.interp = interp
        self.home_class = home_class
        self.bound_this = None
        self.props = {}


class JSClass:
    __slots__ = ("name", "methods", "statics", "getters", "setters",
                 "parent", "interp", "props")

    def __init__(self, name, methods, statics, getters, setters, parent, interp):
        self.name = name
        self.methods = methods
        self.statics = statics
        self.getters = getters
        self.setters = setters
        self.parent = parent
        self.interp = interp
        self.props = {}  # static data assigned from outside (Cls.x = …)

    def find_method(self, name):
        c = self
        while c is not None:
            if name in c.methods:
                return c.methods[name]
            c = c.parent
        return None

    def find_getter(self, name):
        c = self
        while c is not None:
            if name in c.getters:
                return c.getters[name]
            c = c.parent
        return None

    def find_setter(self, name):
        c = self
        while c is not None:
            if name in c.setters:
                return c.setters[name]
            c = c.parent
        return None


class JsrtError(RuntimeError):
    """Internal runtime failure (deadlock, runaway queue) — NOT a JS throw:
    must surface to the host test, never convert into a promise rejection."""


class JSThrow(Exception):
    def __init__(self, value):
        self.value = value
        super().__init__(repr(value))


class _Break(Exception):
    def __init__(self, label=None):
        self.label = label
        super().__init__(label or "")


class _Continue(Exception):
    def __init__(self, label=None):
        self.label = label
        super().__init__(label or "")


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class JSTypeError(JSThrow):
    def __init__(self, msg):
        from tensortruth_tpu.jsrt import builtins as B

        super().__init__(B.make_error("TypeError", msg))


# -- environments -------------------------------------------------------------


class Env:
    __slots__ = ("vars", "parent", "consts")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent
        self.consts: set = set()

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e
            e = e.parent
        return None

    def get(self, name):
        e = self.lookup(name)
        if e is None:
            raise JSThrow(_ref_error(name))
        return e.vars[name]

    def set(self, name, value):
        e = self.lookup(name)
        if e is None:
            raise JSThrow(_ref_error(name))
        if name in e.consts:
            raise JSTypeError(f"assignment to constant {name}")
        e.vars[name] = value

    def declare(self, name, value, const=False):
        self.vars[name] = value
        if const:
            self.consts.add(name)


def _ref_error(name):
    from tensortruth_tpu.jsrt import builtins as B

    return B.make_error("ReferenceError", f"{name} is not defined")


# -- interpreter --------------------------------------------------------------


class Interp:
    def __init__(self, runtime):
        self.runtime = runtime  # owns globals, job queue, module cache

    # ---- statements ----

    def run_block(self, stmts, env):
        self.hoist(stmts, env)
        for s in stmts:
            self.stmt(s, env)

    def hoist(self, stmts, env):
        for s in stmts:
            if s[0] == "func":
                env.declare(s[1], self.make_function(s, env))
            elif s[0] == "exportdecl" and s[1][0] == "func":
                env.declare(s[1][1], self.make_function(s[1], env))

    def stmt(self, node, env):
        kind = node[0]
        m = getattr(self, "st_" + kind, None)
        if m is None:
            raise JSTypeError(f"jsrt: unsupported statement {kind}")
        return m(node, env)

    def st_module(self, node, env):
        self.run_block(node[1], env)

    def st_empty(self, node, env):
        pass

    def st_expr(self, node, env):
        self.ev(node[1], env)

    def st_block(self, node, env):
        self.run_block(node[1], Env(env))

    def st_var(self, node, env):
        _, kind, decls = node
        for target, init in decls:
            val = UNDEF if init is None else self.ev(init, env)
            self.bind_pattern(target, val, env, declare=kind,
                              const=(kind == "const"))

    def st_func(self, node, env):
        if node[1] not in env.vars:  # hoisted already in run_block
            env.declare(node[1], self.make_function(node, env))

    def st_class(self, node, env):
        env.declare(node[1], self.ev(node, env))

    def st_if(self, node, env):
        from tensortruth_tpu.jsrt.builtins import truthy

        if truthy(self.ev(node[1], env)):
            self.stmt(node[2], env)
        elif node[3] is not None:
            self.stmt(node[3], env)

    def st_while(self, node, env):
        from tensortruth_tpu.jsrt.builtins import truthy

        label = self._take_label()
        while truthy(self.ev(node[1], env)):
            try:
                self.stmt(node[2], env)
            except _Break as b:
                if b.label not in (None, label):
                    raise
                break
            except _Continue as c:
                if c.label not in (None, label):
                    raise
                continue

    def st_dowhile(self, node, env):
        from tensortruth_tpu.jsrt.builtins import truthy

        label = self._take_label()
        while True:
            try:
                self.stmt(node[1], env)
            except _Break as b:
                if b.label not in (None, label):
                    raise
                break
            except _Continue as c:
                if c.label not in (None, label):
                    raise
            if not truthy(self.ev(node[2], env)):
                break

    def st_for(self, node, env):
        from tensortruth_tpu.jsrt.builtins import truthy

        _, init, cond, step, body = node
        label = self._take_label()
        loop_env = Env(env)
        per_iter = []
        if init is not None:
            self.stmt(init, loop_env)
            if init[0] == "var" and init[1] in ("let", "const"):
                # JS gives let/const loop vars a FRESH binding per iteration
                # (closures in the body capture that iteration's value)
                for target, _i in init[2]:
                    per_iter.extend(_pattern_names(target))
        while cond is None or truthy(self.ev(cond, loop_env)):
            if per_iter:
                body_env = Env(env)
                for n in per_iter:
                    body_env.declare(n, loop_env.vars[n])
            else:
                body_env = Env(loop_env)
            try:
                self.stmt(body, body_env)
            except _Break as b:
                if b.label not in (None, label):
                    raise
                break
            except _Continue as c:
                if c.label not in (None, label):
                    raise
            finally:
                if per_iter:  # step must see body mutations of the loop var
                    for n in per_iter:
                        loop_env.vars[n] = body_env.vars[n]
            if step is not None:
                self.ev(step, loop_env)

    def st_forof(self, node, env):
        from tensortruth_tpu.jsrt.builtins import js_iterate

        _, decl_kind, target, iterable, body = node
        label = self._take_label()
        for item in js_iterate(self.ev(iterable, env)):
            it_env = Env(env)
            self.bind_pattern(target, item, it_env,
                              declare=decl_kind or None,
                              const=(decl_kind == "const"))
            try:
                self.stmt(body, it_env)
            except _Break as b:
                if b.label not in (None, label):
                    raise
                break
            except _Continue as c:
                if c.label not in (None, label):
                    raise
                continue

    def st_forin(self, node, env):
        _, decl_kind, target, iterable, body = node
        obj = self.ev(iterable, env)
        if isinstance(obj, JSObject):
            keys = list(obj.props.keys())
        elif isinstance(obj, JSArray):
            keys = [str(i) for i in range(len(obj))]
        elif isinstance(obj, dict):
            keys = list(obj.keys())
        else:
            keys = []
        label = self._take_label()
        for key in keys:
            it_env = Env(env)
            self.bind_pattern(target, key, it_env,
                              declare=decl_kind or None,
                              const=(decl_kind == "const"))
            try:
                self.stmt(body, it_env)
            except _Break as b:
                if b.label not in (None, label):
                    raise
                break
            except _Continue as c:
                if c.label not in (None, label):
                    raise
                continue

    def st_switch(self, node, env):
        from tensortruth_tpu.jsrt.builtins import strict_eq

        _, disc_e, cases = node
        disc = self.ev(disc_e, env)
        sw_env = Env(env)
        matched = False
        try:
            for test, stmts in cases:
                if not matched and test is not None and \
                        strict_eq(disc, self.ev(test, sw_env)):
                    matched = True
                if matched:
                    self.run_block(stmts, sw_env)
            if not matched:
                hit_default = False
                for test, stmts in cases:
                    if test is None:
                        hit_default = True
                    if hit_default:
                        self.run_block(stmts, sw_env)
        except _Break:
            pass

    def st_try(self, node, env):
        _, block, param, catch, final = node
        try:
            try:
                self.stmt(block, env)
            except JSThrow as e:
                if catch is None:
                    raise
                c_env = Env(env)
                if param is not None:
                    self.bind_pattern(param, e.value, c_env, declare="let")
                self.stmt(catch, c_env)
        finally:
            if final is not None:
                self.stmt(final, env)

    def st_ret(self, node, env):
        raise _Return(UNDEF if node[1] is None else self.ev(node[1], env))

    def st_throw(self, node, env):
        raise JSThrow(self.ev(node[1], env))

    def st_brk(self, node, env):
        raise _Break(node[1] if len(node) > 1 else None)

    def st_cont(self, node, env):
        raise _Continue(node[1] if len(node) > 1 else None)

    _pending_label = None

    def st_label(self, node, env):
        _, name, inner = node
        prev = self._pending_label
        self._pending_label = name
        try:
            self.stmt(inner, env)
        except _Break as b:
            if b.label != name:
                raise
        finally:
            self._pending_label = prev

    def _take_label(self):
        label = self._pending_label
        self._pending_label = None
        return label

    def st_import(self, node, env):
        _, names, src = node
        exports = self.runtime.import_module(src)
        for exported, local in names:
            if exported == "*":
                ns = JSObject(dict(exports))
                env.declare(local, ns, const=True)
            else:
                if exported not in exports:
                    raise JSTypeError(f"module {src!r} has no export {exported!r}")
                env.declare(local, exports[exported], const=True)

    def st_exportdecl(self, node, env):
        decl = node[1]
        self.stmt(decl, env)
        if decl[0] == "var":
            for target, _init in decl[2]:
                for name in _pattern_names(target):
                    self.runtime.current_exports[name] = env.get(name)
        elif decl[0] in ("func", "class"):
            self.runtime.current_exports[decl[1]] = env.get(decl[1])

    def st_exportnames(self, node, env):
        for local, exported in node[1]:
            self.runtime.current_exports[exported] = env.get(local)

    def st_exportdefault(self, node, env):
        self.runtime.current_exports["default"] = self.ev(node[1], env)

    # ---- expressions ----

    def ev(self, node, env):
        return _EV[node[0]](self, node, env)

    def ev_num(self, node, env):
        return node[1]

    def ev_str(self, node, env):
        return node[1]

    def ev_bool(self, node, env):
        return node[1]

    def ev_null(self, node, env):
        return None

    def ev_undef(self, node, env):
        return UNDEF

    def ev_ident(self, node, env):
        return env.get(node[1])

    def ev_this(self, node, env):
        e = env.lookup("this")
        return e.vars["this"] if e else UNDEF

    def ev_regex(self, node, env):
        from tensortruth_tpu.jsrt.builtins import JSRegExp

        return JSRegExp(node[1], node[2])

    def ev_tmpl(self, node, env):
        from tensortruth_tpu.jsrt.builtins import js_str

        out = []
        for kind, part in node[1]:
            out.append(part if kind == "lit" else js_str(self.ev(part, env)))
        return "".join(out)

    def ev_arr(self, node, env):
        from tensortruth_tpu.jsrt.builtins import js_iterate

        out = JSArray()
        for el in node[1]:
            if el[0] == "spread":
                out.extend(js_iterate(self.ev(el[1], env)))
            else:
                out.append(self.ev(el, env))
        return out

    def ev_obj(self, node, env):
        from tensortruth_tpu.jsrt.builtins import js_str

        props = {}
        for p in node[1]:
            if p[0] == "prop":
                props[p[1]] = self.ev(p[2], env)
            elif p[0] == "cprop":
                props[js_str(self.ev(p[1], env))] = self.ev(p[2], env)
            elif p[0] == "spread":
                v = self.ev(p[1], env)
                if isinstance(v, JSObject):
                    props.update(v.props)
                elif isinstance(v, dict):
                    props.update(v)
                elif v not in (None, UNDEF):
                    raise JSTypeError("cannot spread non-object into object")
        return JSObject(props)

    def ev_funcexpr(self, node, env):
        return self.make_function(("func", node[1], node[2], node[3], node[4]), env)

    def ev_arrow(self, node, env):
        _, params, body, is_async, is_expr = node
        return JSFunction(None, params, body, env, self, is_async=is_async,
                          is_arrow=True, is_expr_body=is_expr)

    def ev_class(self, node, env):
        _, name, parent_e, method_defs = node
        parent = self.ev(parent_e, env) if parent_e is not None else None
        methods, statics, getters, setters = {}, {}, {}, {}
        for mname, params, body, is_static, is_async, kind in method_defs:
            fn = JSFunction(mname, params, body, env, self, is_async=is_async)
            if is_static:
                statics[mname] = fn
            elif kind == "getter":
                getters[mname] = fn
            elif kind == "setter":
                setters[mname] = fn
            else:
                methods[mname] = fn
        cls = JSClass(name, methods, statics, getters, setters, parent, self)
        for fn in (list(methods.values()) + list(statics.values())
                   + list(getters.values()) + list(setters.values())):
            fn.home_class = cls
        return cls

    def ev_seq(self, node, env):
        out = UNDEF
        for e in node[1]:
            out = self.ev(e, env)
        return out

    def ev_cond(self, node, env):
        from tensortruth_tpu.jsrt.builtins import truthy

        return self.ev(node[2] if truthy(self.ev(node[1], env)) else node[3], env)

    def ev_logic(self, node, env):
        from tensortruth_tpu.jsrt.builtins import truthy

        _, op, l, r = node
        lv = self.ev(l, env)
        if op == "&&":
            return self.ev(r, env) if truthy(lv) else lv
        if op == "||":
            return lv if truthy(lv) else self.ev(r, env)
        return self.ev(r, env) if lv is None or lv is UNDEF else lv  # ??

    def ev_bin(self, node, env):
        from tensortruth_tpu.jsrt import builtins as B

        _, op, l, r = node
        return B.binop(op, self.ev(l, env), self.ev(r, env))

    def ev_un(self, node, env):
        from tensortruth_tpu.jsrt import builtins as B

        _, op, operand = node
        if op == "typeof":
            if operand[0] == "ident" and env.lookup(operand[1]) is None:
                return "undefined"
            return B.js_typeof(self.ev(operand, env))
        if op == "delete":
            if operand[0] == "member":
                obj = self.ev(operand[1], env)
                if isinstance(obj, JSObject):
                    obj.props.pop(operand[2], None)
                return True
            if operand[0] == "index":
                obj = self.ev(operand[1], env)
                key = B.js_str(self.ev(operand[2], env))
                if isinstance(obj, JSObject):
                    obj.props.pop(key, None)
                return True
            return True
        if op == "void":
            self.ev(operand, env)
            return UNDEF
        return B.unop(op, self.ev(operand, env))

    def ev_update(self, node, env):
        from tensortruth_tpu.jsrt.builtins import to_number

        _, op, target, prefix = node
        old = to_number(self.read_target(target, env))
        new = old + (1.0 if op == "++" else -1.0)
        self.write_target(target, new, env)
        return new if prefix else old

    def ev_assign(self, node, env):
        from tensortruth_tpu.jsrt import builtins as B

        _, op, target, value = node
        if op == "=":
            val = self.ev(value, env)
            self.write_target(target, val, env)
            return val
        if op in ("&&=", "||=", "??="):
            cur = self.read_target(target, env)
            do = (B.truthy(cur) if op == "&&=" else
                  not B.truthy(cur) if op == "||=" else
                  cur is None or cur is UNDEF)
            if not do:
                return cur
            val = self.ev(value, env)
            self.write_target(target, val, env)
            return val
        cur = self.read_target(target, env)
        val = B.binop(op[:-1], cur, self.ev(value, env))
        self.write_target(target, val, env)
        return val

    def ev_member(self, node, env):
        from tensortruth_tpu.jsrt.builtins import get_member

        _, obj_e, name, optional = node
        obj = self.ev(obj_e, env)
        if optional and (obj is None or obj is UNDEF):
            return UNDEF
        return get_member(obj, name, self)

    def ev_index(self, node, env):
        from tensortruth_tpu.jsrt.builtins import get_index

        _, obj_e, idx_e, optional = node
        obj = self.ev(obj_e, env)
        if optional and (obj is None or obj is UNDEF):
            return UNDEF
        return get_index(obj, self.ev(idx_e, env), self)

    def ev_call(self, node, env):
        from tensortruth_tpu.jsrt.builtins import get_index, get_member, js_iterate

        _, callee, arg_nodes, optional = node
        this = UNDEF
        if callee[0] == "member":
            obj = self.ev(callee[1], env)
            if callee[3] and (obj is None or obj is UNDEF):
                return UNDEF
            fn = get_member(obj, callee[2], self)
            this = obj
        elif callee[0] == "index":
            obj = self.ev(callee[1], env)
            fn = get_index(obj, self.ev(callee[2], env), self)
            this = obj
        elif callee[0] == "super":
            # super(...) in a constructor
            this_env = env.lookup("this")
            cls_fn = env.get("__class__")
            parent = cls_fn.parent
            args = self._args(arg_nodes, env)
            ctor = parent.find_method("constructor") if parent else None
            if ctor is not None:
                self.call_function(ctor, args, this=this_env.vars["this"])
            return UNDEF
        else:
            fn = self.ev(callee, env)
        if optional and (fn is None or fn is UNDEF):
            return UNDEF
        args = self._args(arg_nodes, env)
        return self.call_any(fn, args, this)

    def _args(self, arg_nodes, env):
        from tensortruth_tpu.jsrt.builtins import js_iterate

        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(js_iterate(self.ev(a[1], env)))
            else:
                args.append(self.ev(a, env))
        return args

    def ev_new(self, node, env):
        _, callee, arg_nodes = node
        cls = self.ev(callee, env)
        args = self._args(arg_nodes, env)
        return self.construct(cls, args)

    def ev_await(self, node, env):
        from tensortruth_tpu.jsrt.builtins import JSPromise

        v = self.ev(node[1], env)
        if isinstance(v, JSPromise):
            return self.runtime.block_on(v)
        return v

    def ev_super(self, node, env):
        return env.get("__superobj__")

    def ev_spread(self, node, env):  # only reached through bad syntax use
        raise JSTypeError("unexpected spread")

    # ---- calls ----

    def call_any(self, fn, args, this=UNDEF):
        from tensortruth_tpu.jsrt.builtins import js_typeof

        if isinstance(fn, JSFunction):
            return self.call_function(fn, args, this)
        if isinstance(fn, JSClass):
            raise JSTypeError(f"class {fn.name} must be called with new")
        if callable(fn):
            return fn(*args)
        raise JSTypeError(f"{js_typeof(fn)} is not a function")

    def call_function(self, fn: JSFunction, args, this=UNDEF):
        from tensortruth_tpu.jsrt.builtins import JSPromise

        env = Env(fn.env)
        if fn.is_arrow:
            pass  # lexical this — nothing declared, lookup falls through
        else:
            use_this = fn.bound_this if fn.bound_this is not None else this
            env.declare("this", use_this)
            if fn.home_class is not None:
                env.declare("__class__", fn.home_class)
                if fn.home_class.parent is not None:
                    env.declare("__superobj__",
                                _SuperProxy(fn.home_class.parent, use_this, self))
        env.declare("arguments", JSArray(args))
        self.bind_params(fn.params, args, env)
        if fn.is_async:
            try:
                result = self._run_body(fn, env)
            except JSThrow as e:
                return JSPromise.rejected(self.runtime, e.value)
            return JSPromise.resolved(self.runtime, result)
        return self._run_body(fn, env)

    def _run_body(self, fn, env):
        if fn.is_expr_body:
            return self.ev(fn.body, env)
        try:
            self.run_block(fn.body[1], env)
        except _Return as r:
            return r.value
        return UNDEF

    def construct(self, cls, args):
        from tensortruth_tpu.jsrt import builtins as B

        if isinstance(cls, JSClass):
            inst = JSObject({}, _class=cls)
            ctor = cls.find_method("constructor")
            if ctor is not None:
                self.call_function(ctor, args, this=inst)
            return inst
        if callable(cls) and getattr(cls, "js_constructor", False):
            return cls(*args)
        if isinstance(cls, JSFunction):
            inst = JSObject({})
            self.call_function(cls, args, this=inst)
            return inst
        raise JSTypeError("not a constructor")

    def make_function(self, node, env):
        _, name, params, body, is_async = node
        return JSFunction(name, params, body, env, self, is_async=is_async)

    # ---- binding ----

    def bind_params(self, params, args, env):
        i = 0
        for p in params:
            if p[0] == "prest":
                env.declare(_single_name(p[1]), JSArray(args[i:]))
                return
            val = args[i] if i < len(args) else UNDEF
            self.bind_pattern(p, val, env, declare="let")
            i += 1

    def bind_pattern(self, pat, value, env, declare=None, const=False):
        from tensortruth_tpu.jsrt.builtins import get_member, js_iterate

        kind = pat[0]
        if kind == "pdef":
            if value is UNDEF:
                value = self.ev(pat[2], env)
            self.bind_pattern(pat[1], value, env, declare, const)
            return
        if kind == "pid":
            if declare:
                env.declare(pat[1], value, const=const)
            else:
                env.set(pat[1], value)
            return
        if kind == "ptarget":
            self.write_target(pat[1], value, env)
            return
        if kind == "parr":
            items = list(js_iterate(value))
            for j, el in enumerate(pat[1]):
                if el is None:
                    continue
                self.bind_pattern(el, items[j] if j < len(items) else UNDEF,
                                  env, declare, const)
            if pat[2] is not None:
                self.bind_pattern(pat[2], JSArray(items[len(pat[1]):]),
                                  env, declare, const)
            return
        if kind == "pobj":
            taken = set()
            for key, sub in pat[1]:
                taken.add(key)
                self.bind_pattern(sub, get_member(value, key, self),
                                  env, declare, const)
            if pat[2] is not None:
                rest = JSObject({
                    k: v for k, v in (value.props if isinstance(value, JSObject) else {}).items()
                    if k not in taken
                })
                self.bind_pattern(pat[2], rest, env, declare, const)
            return
        raise JSTypeError(f"jsrt: unsupported pattern {kind}")

    def read_target(self, target, env):
        from tensortruth_tpu.jsrt.builtins import get_index, get_member

        if target[0] == "ident":
            return env.get(target[1])
        if target[0] == "member":
            return get_member(self.ev(target[1], env), target[2], self)
        if target[0] == "index":
            return get_index(self.ev(target[1], env),
                             self.ev(target[2], env), self)
        raise JSTypeError("invalid read target")

    def write_target(self, target, value, env):
        from tensortruth_tpu.jsrt.builtins import set_index, set_member

        if target[0] == "ident":
            env.set(target[1], value)
        elif target[0] == "member":
            set_member(self.ev(target[1], env), target[2], value)
        elif target[0] == "index":
            set_index(self.ev(target[1], env),
                      self.ev(target[2], env), value)
        elif target[0] in ("parr", "pobj", "pdef"):
            self.bind_pattern(target, value, env, declare=None)
        else:
            raise JSTypeError(f"invalid assignment target {target[0]}")


class _SuperProxy:
    """`super.method(...)` receiver inside class methods."""

    def __init__(self, parent_class, this, interp):
        self.parent_class = parent_class
        self.this = this
        self.interp = interp


def _single_name(pat):
    if pat[0] == "pid":
        return pat[1]
    raise JSTypeError("rest parameter must be an identifier")


def _pattern_names(pat):
    k = pat[0]
    if k == "pid":
        return [pat[1]]
    if k == "pdef":
        return _pattern_names(pat[1])
    if k == "parr":
        out = []
        for el in pat[1]:
            if el is not None:
                out.extend(_pattern_names(el))
        if pat[2] is not None:
            out.extend(_pattern_names(pat[2]))
        return out
    if k == "pobj":
        out = []
        for _key, sub in pat[1]:
            out.extend(_pattern_names(sub))
        if pat[2] is not None:
            out.extend(_pattern_names(pat[2]))
        return out
    return []


# dispatch table built once
_EV = {}
for _name in dir(Interp):
    if _name.startswith("ev_"):
        _EV[_name[3:]] = getattr(Interp, _name)
