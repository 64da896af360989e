"""Restricted-Lua → jnp fast path for per-frame `update` bodies
(VERDICT-r4 next #8 — the particle-compiler trick applied to Lua).

WHY: the Lua interpreter (script/lua/interp.py) is a host-serial
tree-walker — one slow `update` stalls every world in a vmapped batch, and
at 256+ worlds the host loop IS the frame. But most per-frame scripts are
tiny numeric kinematics (the demo's move.lua: `t += dt; this.position =
{pos[1]+cos(t)*3, ...}`). Those compile to pure jnp and run INSIDE the
fused device step — vectorized across every instance of the script and
vmapped across worlds for free.

SUPPORTED SUBSET (anything else falls back to the host interpreter,
per-script, silently — `FastUpdate` is None):
  * chunk-local state: numbers and tables of 2..4 numbers (captured after
    `start()` ran; they become rows of a per-instance f32 state vector)
  * update(dt) bodies made of: local declarations, assignments/compound
    assignments to state/locals/table elements (constant indices),
    `this.position` read/write (root entities only — the device writes
    LOCAL transforms; for parentless entities local == global, the same
    contract the bridge's write_transform applies),
    if/elseif/else with numeric comparisons (compiled to jnp.where merges),
    arithmetic (+ - * / % ^, unary -), and math.* (sin cos tan asin acos
    atan sqrt abs floor ceil exp log min max fmod pow pi huge)
  * no loops, no calls into the engine API, no strings/tables beyond the
    above, no nil checks — those keep the host path.

Host/device ownership: once a script instance compiles, its `update` STOPS
running on the host; its chunk locals live in the device state
(state.modules["script"]) and are written back to the Lua scope by
ScriptModule.load_state (save/editor paths read fresh values).

≙ reference lua_script_system.cpp:1661-1684 (the per-instance update pcall
loop — host-serial there too; this is the TPU-native replacement for the
hot subset).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class Unsupported(Exception):
    pass


_MATH_FNS = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan, "asin": jnp.arcsin,
    "acos": jnp.arccos, "atan": jnp.arctan2, "sqrt": jnp.sqrt,
    "abs": jnp.abs, "floor": jnp.floor, "ceil": jnp.ceil, "exp": jnp.exp,
    "log": jnp.log, "min": jnp.minimum, "max": jnp.maximum,
    "fmod": lambda a, b: a - jnp.trunc(a / b) * b, "pow": jnp.power,
    "rad": jnp.deg2rad, "deg": jnp.rad2deg,
}
_MATH_CONSTS = {"pi": np.pi, "huge": np.inf}

_THIS = ("__this__",)
_MATH = ("__math__",)


@dataclass
class FastUpdate:
    """One compiled script source: state layout + the traced update."""

    source_key: str
    layout: List[Tuple[str, int, int]]        # (name, offset, size)
    nslots: int
    fn: Callable                               # (row [K], pos [3], dt) -> (row', pos')
    entities: List[int] = field(default_factory=list)
    init_rows: List[np.ndarray] = field(default_factory=list)
    envs: List[object] = field(default_factory=list)

    def batched(self):
        """(rows [NI,K], pos [3,NI], dt) -> (rows', pos') over instances."""
        f = self.fn

        def run(rows, pos, dt):
            nr, npos = jax.vmap(lambda r, p: f(r, p, dt))(rows, pos.T)
            return nr, npos.T

        return run


class _Ctx:
    """Trace-time environment: name → ('s', scalar) | ('v', tuple) plus
    the special 'pos' vector and the dt param."""

    def __init__(self, state_vals, pos, dt_name, dt):
        self.vars: Dict[str, tuple] = dict(state_vals)
        self.pos = pos                        # tuple of 3 scalars
        self.state_names = set(state_vals.keys())
        if dt_name:
            self.vars[dt_name] = ("s", dt)
        self.locals: set = set()

    def copy(self):
        c = _Ctx.__new__(_Ctx)
        c.vars = dict(self.vars)
        c.pos = self.pos
        c.state_names = self.state_names
        c.locals = set(self.locals)
        return c


def _scalar(v):
    if isinstance(v, tuple) and v and v[0] == "s":
        return v[1]
    raise Unsupported("expected a number")


def _eval(e, ctx: _Ctx):
    op = e[0]
    if op == "num":
        return ("s", jnp.float32(e[1]))
    if op in ("true", "false"):
        return ("b", op == "true")
    if op == "name":
        n = e[1]
        if n == "this":
            return _THIS
        if n == "math":
            return _MATH
        if n in ctx.vars:
            return ctx.vars[n]
        raise Unsupported(f"unknown name {n!r}")
    if op == "paren":
        return _eval(e[1], ctx)
    if op == "index":
        obj = _eval(e[1], ctx)
        key = e[2]
        if obj is _THIS:
            if key[0] == "str" and key[1] == "position":
                return ("v", ctx.pos)
            raise Unsupported(f"this.{key!r}")
        if obj is _MATH:
            if key[0] == "str" and key[1] in _MATH_CONSTS:
                return ("s", jnp.float32(_MATH_CONSTS[key[1]]))
            raise Unsupported("math value")
        if isinstance(obj, tuple) and obj[0] == "v" and key[0] == "num":
            i = int(key[1]) - 1
            if 0 <= i < len(obj[1]):
                return ("s", obj[1][i])
        raise Unsupported("index")
    if op == "call":
        callee = e[1]
        if callee[0] == "index" and _eval(callee[1], ctx) is _MATH \
                and callee[2][0] == "str" and callee[2][1] in _MATH_FNS:
            args = [_scalar(_eval(a, ctx)) for a in e[2]]
            return ("s", _MATH_FNS[callee[2][1]](*args))
        raise Unsupported("call")
    if op == "binop":
        kind = e[1]
        l, r = _eval(e[2], ctx), _eval(e[3], ctx)
        if kind in ("+", "-", "*", "/", "%", "^", "//"):
            a, b = _scalar(l), _scalar(r)
            if kind == "+":
                return ("s", a + b)
            if kind == "-":
                return ("s", a - b)
            if kind == "*":
                return ("s", a * b)
            if kind == "/":
                return ("s", a / b)
            if kind == "%":
                return ("s", a - jnp.floor(a / b) * b)   # Lua floor-mod
            if kind == "//":
                return ("s", jnp.floor(a / b))
            return ("s", jnp.power(a, b))
        if kind in ("<", ">", "<=", ">=", "==", "~="):
            a, b = _scalar(l), _scalar(r)
            return ("b", {"<": a < b, ">": a > b, "<=": a <= b,
                          ">=": a >= b, "==": a == b, "~=": a != b}[kind])
        raise Unsupported(f"binop {kind}")
    if op == "unop":
        if e[1] == "-":
            return ("s", -_scalar(_eval(e[2], ctx)))
        if e[1] == "not":
            v = _eval(e[2], ctx)
            if v[0] == "b":
                return ("b", jnp.logical_not(v[1]))
        raise Unsupported("unop")
    if op in ("and", "or"):
        l, r = _eval(e[1], ctx), _eval(e[2], ctx)
        if l[0] == "b" and r[0] == "b":
            f = jnp.logical_and if op == "and" else jnp.logical_or
            return ("b", f(l[1], r[1]))
        raise Unsupported("non-boolean and/or")
    if op == "table":
        items = e[1]
        if not (2 <= len(items) <= 4) or any(k is not None for k, _ in items):
            raise Unsupported("table shape")
        return ("v", tuple(_scalar(_eval(v, ctx)) for _, v in items))
    raise Unsupported(f"expr {op}")


def _assign(tgt, val, ctx: _Ctx):
    if tgt[0] == "name":
        n = tgt[1]
        if n in ("this", "math"):
            raise Unsupported("assign builtin")
        if n in ctx.vars:
            cur = ctx.vars[n]
            if cur[0] != val[0] or (cur[0] == "v"
                                    and len(cur[1]) != len(val[1])):
                # allow scalar/vec only if the var is a fresh local
                if n not in ctx.locals:
                    raise Unsupported("state shape change")
            ctx.vars[n] = val
            return
        raise Unsupported(f"assign to unknown {n!r} (global write)")
    if tgt[0] == "index":
        base, key = tgt[1], tgt[2]
        if base[0] == "name" and base[1] == "this":
            if key[0] == "str" and key[1] == "position":
                if val[0] != "v" or len(val[1]) != 3:
                    raise Unsupported("position needs a 3-vector")
                ctx.pos = val[1]
                return
            raise Unsupported("this.* write")
        obj = _eval(base, ctx)
        if isinstance(obj, tuple) and obj[0] == "v" and key[0] == "num":
            i = int(key[1]) - 1
            if 0 <= i < len(obj[1]):
                nv = list(obj[1])
                nv[i] = _scalar(val)
                _assign(base, ("v", tuple(nv)), ctx)
                return
        raise Unsupported("index assign")
    raise Unsupported("assign target")


def _merge(cond, then_ctx: _Ctx, else_ctx: _Ctx, ctx: _Ctx):
    """jnp.where-merge two branch contexts back into ctx."""
    names = set(then_ctx.vars) | set(else_ctx.vars)
    for n in names:
        tv = then_ctx.vars.get(n)
        ev = else_ctx.vars.get(n)
        if tv is None or ev is None:
            if n in ctx.vars:
                raise Unsupported("branch drops a variable")
            continue                          # branch-local: dies here
        if tv is ev:
            continue
        if tv[0] != ev[0]:
            raise Unsupported("branch type mismatch")
        if tv[0] == "s":
            ctx.vars[n] = ("s", jnp.where(cond, tv[1], ev[1]))
        elif tv[0] == "v":
            if len(tv[1]) != len(ev[1]):
                raise Unsupported("branch vec size mismatch")
            ctx.vars[n] = ("v", tuple(jnp.where(cond, a, b)
                                      for a, b in zip(tv[1], ev[1])))
        else:
            raise Unsupported("branch bool merge")
    if then_ctx.pos is not else_ctx.pos:
        ctx.pos = tuple(jnp.where(cond, a, b)
                        for a, b in zip(then_ctx.pos, else_ctx.pos))
    else:
        ctx.pos = then_ctx.pos


def _exec_block(stmts, ctx: _Ctx):
    for i, st in enumerate(stmts):
        op = st[0]
        if op == "local":
            _, names, exprs, _line = st
            vals = [_eval(e, ctx) for e in exprs]
            while len(vals) < len(names):
                vals.append(("s", jnp.float32(0.0)))
            for n, v in zip(names, vals):
                if n in ctx.state_names:
                    raise Unsupported("local shadows state")
                ctx.vars[n] = v
                ctx.locals.add(n)
        elif op == "assign":
            _, targets, exprs, _line = st
            vals = [_eval(e, ctx) for e in exprs]
            if len(vals) != len(targets):
                raise Unsupported("multi-assign arity")
            for t, v in zip(targets, vals):
                _assign(t, v, ctx)
        elif op == "compound":
            _, tgt, kind, rhs, line = st
            cur = _eval(tgt, ctx)
            v = _eval(("binop", kind, tgt, rhs, line), ctx)
            _assign(tgt, v, ctx)
        elif op == "if":
            _, arms, els, _line = st
            def run_arms(k, base):
                if k >= len(arms):
                    out = base.copy()
                    if els:
                        _exec_block(els, out)
                    return out
                cond_v = _eval(arms[k][0], base)
                if cond_v[0] != "b":
                    raise Unsupported("non-boolean if")
                then_ctx = base.copy()
                _exec_block(arms[k][1], then_ctx)
                else_ctx = run_arms(k + 1, base)
                merged = base.copy()
                _merge(cond_v[1], then_ctx, else_ctx, merged)
                return merged
            out = run_arms(0, ctx)
            ctx.vars = out.vars
            ctx.pos = out.pos
            ctx.locals = out.locals
        elif op == "return":
            if st[1] or i != len(stmts) - 1:
                raise Unsupported("early/valued return")
        elif op == "do":
            _exec_block(st[1], ctx)
        else:
            raise Unsupported(f"stmt {op}")


def _collect_names(node, out):
    if isinstance(node, tuple):
        if node and node[0] == "name" and len(node) >= 2 \
                and isinstance(node[1], str):
            out.add(node[1])
        for x in node:
            _collect_names(x, out)
    elif isinstance(node, list):
        for x in node:
            _collect_names(x, out)


def try_compile(env, world) -> Optional[FastUpdate]:
    """Compile one LuaScriptEnv's update() if it fits the subset; None on
    any unsupported construct (the host interpreter keeps the script)."""
    from lumixengine_tpu.script.lua.interp import LuaFunction, LuaTable

    try:
        fn = env.env.get("update")
    except Exception:
        return None
    if not isinstance(fn, LuaFunction) or len(fn.params) > 1 or env.error:
        return None
    e = env.entity
    try:
        if world.get_parent(e) >= 0:
            return None                    # this.position is global; device
    except Exception:                      # writes local — roots only
        return None

    names: set = set()
    _collect_names(fn.body, names)
    dt_name = fn.params[0] if fn.params else None
    state_vals: Dict[str, tuple] = {}
    layout: List[Tuple[str, int, int]] = []
    init: List[float] = []
    off = 0
    for n in sorted(names):
        if n in ("this", "math") or n == dt_name:
            continue
        sc = fn.scope.lookup(n) if fn.scope else None
        if sc is None:
            continue                       # bound locally inside the body
        v = sc.vars[n]
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            layout.append((n, off, 1))
            init.append(float(v))
            off += 1
        elif isinstance(v, LuaTable):
            arr = [v.get(i) for i in range(1, 5)]
            size = 0
            for x in arr:
                if isinstance(x, (int, float)) and not isinstance(x, bool):
                    size += 1
                else:
                    break
            if size < 2 or v.get(size + 1) is not None:
                return None
            layout.append((n, off, size))
            init.extend(float(v.get(i)) for i in range(1, size + 1))
            off += size
        else:
            return None                    # functions/userdata upvalues
    nslots = off

    def run(row, pos, dt):
        vals = {}
        for n, o, s in layout:
            if s == 1:
                vals[n] = ("s", row[o])
            else:
                vals[n] = ("v", tuple(row[o + k] for k in range(s)))
        ctx = _Ctx(vals, tuple(pos[k] for k in range(3)), dt_name, dt)
        _exec_block(fn.body, ctx)
        out = []
        for n, o, s in layout:
            v = ctx.vars[n]
            if v[0] == "s" and s == 1:
                out.append(jnp.reshape(v[1], (1,)))
            elif v[0] == "v" and len(v[1]) == s:
                out.append(jnp.stack(list(v[1])))
            else:
                raise Unsupported("state shape changed across update")
        new_row = (jnp.concatenate(out) if out
                   else jnp.zeros((0,), jnp.float32))
        return new_row.astype(jnp.float32), jnp.stack(list(ctx.pos))

    # dry-trace once to validate the whole body against the subset
    try:
        jax.eval_shape(run, jnp.zeros((nslots,), jnp.float32),
                       jnp.zeros((3,), jnp.float32), jnp.float32(1 / 60))
    except Unsupported:
        return None
    except Exception:
        return None

    fu = FastUpdate(source_key=env.source, layout=layout, nslots=nslots,
                    fn=run)
    fu.entities.append(e)
    fu.init_rows.append(np.asarray(init, np.float32))
    fu.envs.append(env)
    return fu


def write_back(env, layout, row: np.ndarray) -> None:
    """Device state row → the Lua chunk scope (save/editor reads)."""
    from lumixengine_tpu.script.lua.interp import LuaTable

    fn = env.env.get("update")
    if fn is None or getattr(fn, "scope", None) is None:
        return
    for n, o, s in layout:
        sc = fn.scope.lookup(n)
        if sc is None:
            continue
        if s == 1:
            sc.vars[n] = float(row[o])
        else:
            t = sc.vars[n]
            if isinstance(t, LuaTable):
                for k in range(s):
                    t.set(k + 1, float(row[o + k]))
