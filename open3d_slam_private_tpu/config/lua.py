"""Restricted-Lua parameter file loader (no Lua runtime).

The reference configures the SLAM system through Cartographer-style Lua
parameter files (``open3d_slam_lua_io`` / ``lua_parameter_dictionary``,
loaded by ``LuaLoader.cpp``). The shipped ``param_*.lua`` files use a small
declarative subset of Lua:

- ``include "file.lua"`` directives (resolved against the including file's
  directory plus caller-supplied search dirs, like Cartographer's loader),
- global table constructors ``NAME = { key = value, ... }``,
- ``deepcopy(EXPR)`` calls (the helper the defaults file itself defines),
- dotted assignments ``params.a.b.c = value``,
- a trailing ``return params``.

This module interprets exactly that subset with Lua semantics where they
matter: a bare table reference aliases (``init_pose = POSE`` shares the
table), ``deepcopy`` copies, ``function ... end`` definitions are skipped
as blocks. Anything outside the subset raises ``LuaError`` with a line
number instead of silently mis-parsing.

Reference: ``LuaLoader.cpp``, ``param/default/default_parameters.lua``,
``param/default/parameter_structure_definitions.lua``.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional, Tuple

__all__ = ["LuaError", "load_lua", "loads_lua"]


class LuaError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>--\[(?P<ceq>=*)\[.*?\](?P=ceq)\]|--[^\n]*)
    | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<number>\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>==|~=|<=|>=|\.\.\.|\.\.|[{}()\[\];,=\.\-+*/%^#<>])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for", "function",
    "goto", "if", "in", "local", "nil", "not", "or", "repeat", "return",
    "then", "true", "until", "while",
}


def _tokenize(src: str) -> List[Tuple[str, str, int]]:
    """-> [(kind, text, line)]; kinds: string/number/name/keyword/op."""
    out = []
    pos, line = 0, 1
    n = len(src)
    while pos < n:
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise LuaError(f"line {line}: unexpected character {src[pos]!r}")
        text = m.group(0)
        kind = m.lastgroup if m.lastgroup != "ceq" else "comment"
        for g in ("ws", "comment", "string", "number", "name", "op"):
            if m.group(g) is not None:
                kind = g
                break
        if kind not in ("ws", "comment"):
            if kind == "name" and text in _KEYWORDS:
                kind = "keyword"
            out.append((kind, text, line))
        line += text.count("\n")
        pos = m.end()
    out.append(("eof", "", line))
    return out


class _Parser:
    def __init__(self, tokens, env: Dict[str, Any], search_dirs: List[str],
                 include_stack: Tuple[str, ...]):
        self.toks = tokens
        self.i = 0
        self.env = env
        self.search_dirs = search_dirs
        self.include_stack = include_stack
        self.returned: Optional[Any] = None

    # -- token helpers ---------------------------------------------------

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, text=None):
        k, t, line = self.next()
        if k != kind or (text is not None and t != text):
            raise LuaError(f"line {line}: expected {text or kind}, got {t!r}")
        return t

    def err(self, msg):
        _, t, line = self.peek()
        raise LuaError(f"line {line}: {msg} (at {t!r})")

    # -- grammar ---------------------------------------------------------

    def run(self):
        while True:
            kind, text, _line = self.peek()
            if kind == "eof":
                return
            if kind == "op" and text == ";":
                self.next()
                continue
            if kind == "keyword" and text == "return":
                self.next()
                self.returned = self.expr()
                # Nothing meaningful may follow a top-level return.
                return
            if kind == "keyword" and text in ("function", "local"):
                # `local function f() ... end` or `function f() ... end`:
                # definitions (only deepcopy in practice) are skipped; our
                # evaluator provides deepcopy natively.
                self.next()
                if text == "local":
                    self.expect("keyword", "function")
                self.skip_function()
                continue
            if kind == "name" and text == "include":
                self.next()
                k, fname, line = self.next()
                if k != "string":
                    raise LuaError(f"line {line}: include expects a string")
                self.do_include(self._unquote(fname))
                continue
            if kind == "name":
                self.assignment()
                continue
            self.err("unsupported statement")

    def skip_function(self):
        """Skip `name(args) body end` counting block openers
        (function/if/do +1, end -1; for/while close via their own `do`)."""
        # optional function name (possibly dotted), then arg list.
        if self.peek()[0] == "name":
            self.next()
            while self.peek()[1] == ".":
                self.next()
                self.expect("name")
        self.expect("op", "(")
        depth = 1
        while depth:
            k, t, line = self.next()
            if k == "eof":
                raise LuaError(f"line {line}: unterminated function")
            if t == "(":
                depth += 1
            elif t == ")":
                depth -= 1
        depth = 1
        while depth:
            k, t, line = self.next()
            if k == "eof":
                raise LuaError(f"line {line}: unterminated function body")
            if k == "keyword":
                if t in ("function", "if", "do"):
                    depth += 1
                elif t == "end":
                    depth -= 1

    def do_include(self, fname: str):
        for d in self.search_dirs:
            path = os.path.join(d, fname)
            if os.path.isfile(path):
                real = os.path.realpath(path)
                if real in self.include_stack:
                    raise LuaError(f"circular include of {fname}")
                _eval_file(path, self.env, self.search_dirs,
                           self.include_stack + (real,))
                return
        raise LuaError(
            f"include {fname!r} not found in search dirs {self.search_dirs}"
        )

    def assignment(self):
        path = [self.expect("name")]
        while self.peek()[1] == ".":
            self.next()
            path.append(self.expect("name"))
        self.expect("op", "=")
        value = self.expr()
        target = self.env
        for p in path[:-1]:
            if p not in target or not isinstance(target[p], dict):
                self.err(f"assignment into undefined table {'.'.join(path)}")
            target = target[p]
        target[path[-1]] = value

    def expr(self):
        kind, text, line = self.peek()
        if kind == "number":
            self.next()
            return float(text) if ("." in text or "e" in text or "E" in text) else int(text)
        if kind == "op" and text == "-":
            self.next()
            v = self.expr()
            if not isinstance(v, (int, float)):
                raise LuaError(f"line {line}: unary minus on non-number")
            return -v
        if kind == "string":
            self.next()
            return self._unquote(text)
        if kind == "keyword" and text in ("true", "false", "nil"):
            self.next()
            return {"true": True, "false": False, "nil": None}[text]
        if kind == "op" and text == "{":
            return self.table()
        if kind == "name":
            return self.name_expr()
        self.err("unsupported expression")

    def name_expr(self):
        name = self.expect("name")
        if name == "deepcopy" and self.peek()[1] == "(":
            self.next()
            v = self.expr()
            self.expect("op", ")")
            return copy.deepcopy(v)
        if name not in self.env:
            self.err(f"reference to undefined global {name!r}")
        v = self.env[name]
        while self.peek()[1] == ".":
            self.next()
            field = self.expect("name")
            if not isinstance(v, dict) or field not in v:
                self.err(f"no field {field!r} in {name}")
            v = v[field]
        # Lua tables alias on plain reference — return the same object.
        return v

    def table(self):
        self.expect("op", "{")
        out: Dict[str, Any] = {}
        index = 1
        while True:
            kind, text, _ = self.peek()
            if kind == "op" and text == "}":
                self.next()
                return out
            if kind == "name" and self.toks[self.i + 1][1] == "=":
                key = self.expect("name")
                self.expect("op", "=")
                out[key] = self.expr()
            elif kind == "op" and text == "[":
                self.next()
                key = self.expr()
                self.expect("op", "]")
                self.expect("op", "=")
                out[key] = self.expr()
            else:
                out[index] = self.expr()  # array part
                index += 1
            if self.peek()[1] in (",", ";"):
                self.next()

    @staticmethod
    def _unquote(s: str) -> str:
        body = s[1:-1]
        return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t"}.get(m.group(1), m.group(1)), body)


def _eval_file(path: str, env: Dict[str, Any], search_dirs: List[str],
               include_stack: Tuple[str, ...]) -> Optional[Any]:
    with open(path, "r") as f:
        src = f.read()
    dirs = [os.path.dirname(os.path.abspath(path))] + [
        d for d in search_dirs if d != os.path.dirname(os.path.abspath(path))
    ]
    p = _Parser(_tokenize(src), env, dirs, include_stack)
    p.run()
    return p.returned


def load_lua(path: str, search_dirs: Optional[List[str]] = None) -> Dict[str, Any]:
    """Evaluate a reference ``param_*.lua`` file; returns its parameter tree
    (the ``return``ed table, else the ``params`` global, else all globals)."""
    env: Dict[str, Any] = {}
    ret = _eval_file(path, env, list(search_dirs or []),
                     (os.path.realpath(path),))
    if ret is not None:
        return ret
    if "params" in env:
        return env["params"]
    return env


def loads_lua(src: str, search_dirs: Optional[List[str]] = None) -> Dict[str, Any]:
    """Evaluate Lua source text (includes resolved against search_dirs)."""
    env: Dict[str, Any] = {}
    p = _Parser(_tokenize(src), env, list(search_dirs or []), ())
    p.run()
    if p.returned is not None:
        return p.returned
    return env.get("params", env)
