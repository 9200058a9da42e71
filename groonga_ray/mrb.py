"""Minimal mruby expression surface for the ``ruby_eval`` /
``ruby_load`` plugin commands.

Reference: plugins/ruby/eval.c:22-58 runs ``mrb_load_string`` and
converts the mruby result to the command body via
``grn_mrb_obj_to_grn``-style mapping — nil -> null, true/false,
Fixnum/Float -> number, String -> string, Symbol -> ":sym" string, an
unhandled exception -> ``{"exception": {"message": ...}}``; the
``Groonga`` module, ``Groonga::Object`` class and
``Groonga::Context.instance[...]`` object lookup come from the
engine's bundled mruby scripts (lib/mrb/scripts/*.rb, lib/mrb/
mrb_ctx.c ``Context#[]``). ``ruby_load`` (plugins/ruby/load.c:22-57)
resolves the path against the engine's ruby scripts directory
(grn_mrb_load, lib/mrb.c:120-170) and errors with a ``fopen`` syscall
message when the file is missing.

This is NOT a Ruby interpreter: it evaluates exactly the literal /
constant / context-lookup grammar the reference's command suite
exercises, and raises for anything else so unsupported input is an
honest error rather than a wrong answer.
"""

from __future__ import annotations

import os
import re

# the engine's "ruby scripts" directory (stands in for
# lib/mrb/scripts/, which ships test/empty.rb with the reference)
SCRIPTS_DIR = os.path.join(os.path.dirname(__file__), "mrb_scripts")

# built-in constants the bundled scripts define (lib/mrb/scripts/
# *.rb class/module tree). Value = the path itself; `.to_s` on a
# class/module renders its qualified name.
_BUILTIN_CONSTANTS = {
    "Groonga",
    "Groonga::Object",
    "Groonga::Context",
    "Groonga::Database",
    "Groonga::Table",
    "Groonga::Column",
}

_NUM_RE = re.compile(r"-?\d+(\.\d+)?")
_STR_RE = re.compile(r"'((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\"")
_SYM_RE = re.compile(r":[A-Za-z_][A-Za-z0-9_]*[?!]?")
_CONST_RE = re.compile(r"[A-Z][A-Za-z0-9_]*(::[A-Z][A-Za-z0-9_]*)*")


class MrbError(Exception):
    """A raised mruby exception (rendered as {"exception": ...})."""


class _Const:
    def __init__(self, path: str):
        self.path = path


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def eval_expr(expr: str, server) -> object:
    """Evaluate one expression; returns the mruby value converted to
    its JSON form (mrb_to_grn conversion, plugins/ruby/eval.c:40-56).
    Raises MrbError for ``raise``, ValueError for unsupported syntax.
    """
    expr = expr.strip()
    if not expr:
        return None

    # raise 'message' — uncaught exception
    m = re.fullmatch(r"raise\s+(.+)", expr)
    if m:
        lit = _STR_RE.fullmatch(m.group(1).strip())
        if lit:
            raise MrbError(_unescape(lit.group(1) or lit.group(2) or ""))
        raise MrbError(m.group(1).strip())

    # literals
    if expr == "nil":
        return None
    if expr == "true":
        return True
    if expr == "false":
        return False
    if _NUM_RE.fullmatch(expr):
        return float(expr) if "." in expr else int(expr)
    m = _STR_RE.fullmatch(expr)
    if m:
        return _unescape(m.group(1) or m.group(2) or "")
    if _SYM_RE.fullmatch(expr):
        # Symbol#to_json renders ":sym" (eval.c symbol branch)
        return expr

    # receiver chain: Const[::Const...][.instance]['key'][.method]...
    return _eval_chain(expr, server)


def _eval_chain(expr: str, server) -> object:
    m = _CONST_RE.match(expr)
    if not m:
        raise ValueError(f"mruby: unsupported expression: {expr!r}")
    recv: object = _resolve_const(m.group(0))
    rest = expr[m.end():]
    while rest:
        mm = re.match(r"\.([a-z_][A-Za-z0-9_]*[?!]?)", rest)
        if mm:
            recv = _call_method(recv, mm.group(1), server)
            rest = rest[mm.end():]
            continue
        mm = re.match(r"\[\s*(?:'((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\")\s*\]", rest)
        if mm:
            key = _unescape(mm.group(1) or mm.group(2) or "")
            recv = _index_lookup(recv, key, server)
            rest = rest[mm.end():]
            continue
        raise ValueError(f"mruby: unsupported expression tail: {rest!r}")
    if isinstance(recv, _Const):
        raise ValueError(f"mruby: bare constant has no JSON form: {recv.path}")
    return recv


def _resolve_const(path: str) -> _Const:
    if path not in _BUILTIN_CONSTANTS:
        raise MrbError(f"uninitialized constant {path}")
    return _Const(path)


class _CatalogObject:
    """A named DB object (table or column) from Context#[]."""

    def __init__(self, name: str):
        self.name = name


def _call_method(recv: object, meth: str, server) -> object:
    if isinstance(recv, _Const):
        if meth == "to_s":
            # Module#to_s / Class#to_s: the qualified constant path
            return recv.path
        if meth == "instance" and recv.path == "Groonga::Context":
            return ("context",)
        if meth == "name":
            return recv.path
    if isinstance(recv, _CatalogObject):
        if meth == "name":
            return recv.name
        if meth == "to_s":
            return recv.name
    if recv is None and meth == "nil?":
        return True
    if isinstance(recv, _CatalogObject) and meth == "nil?":
        return False
    raise ValueError(f"mruby: unsupported method .{meth} on {recv!r}")


def _index_lookup(recv: object, key: str, server) -> object:
    if recv != ("context",):
        raise ValueError(f"mruby: unsupported [] on {recv!r}")
    # Context#[name]: resolve a table or "Table.column" path in the DB
    # (mrb_ctx.c ctx_array_reference -> grn_ctx_get)
    if "." in key:
        tname, cname = key.split(".", 1)
        for c in server._ddl_cols:
            if c["table"] == tname and c["name"] == cname:
                return _CatalogObject(f"{tname}.{cname}")
        return None
    if key in server.pending or key in server.tables:
        return _CatalogObject(key)
    return None


def load_file(path: str, server) -> object:
    """``ruby_load``: run a script file from the scripts dir
    (grn_mrb_load's expand-path + fopen, lib/mrb.c:120-170)."""
    full = path if os.path.isabs(path) else os.path.join(SCRIPTS_DIR, path)
    if not os.path.exists(full):
        raise ValueError(
            f"syscall error 'fopen: failed to open mruby script file: "
            f"<{path}>' (No such file or directory)"
        )
    with open(full) as fh:
        src = fh.read()
    result: object = None
    for line in src.splitlines():
        line = line.split("#", 1)[0].strip()
        if line:
            result = eval_expr(line, server)
    return result
