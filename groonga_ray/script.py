"""Script-syntax (``--filter``) expression subset.

The reference compiles an ECMAScript-ish grammar to stack bytecode run
by an expression VM (lib/grn_ecmascript.lemon, grn_expr_exec
lib/expr.c:2330-2780). Here the supported subset — comparisons,
arithmetic, &&/||/!, parentheses, column refs, literals, and the
``@`` match operator plus selector functions ``between(col, min, max)``
/ ``in_values(col, v...)`` (lib/proc.c:5570, 6161) — is parsed with a
small recursive-descent parser and evaluated VECTORIZED per batch with
pyarrow.compute (the planner analogue of scan_info_build routing
match predicates to the index and the rest to a column scan,
lib/expr.c:4360).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class FilterPlan:
    """Split of a filter into index-capable match terms and a residual
    columnar predicate (mirrors scan_info units)."""

    matches: list[tuple[str, str]]          # (column, query_text) from `col @ "text"`
    predicate: object | None                # AST for columnar evaluation
    subqueries: list[tuple[str, str]] = None  # query("cols","q") units (lib/proc.c:5138)
    regexps: list[tuple[str, str]] = None   # (column, pattern) from `col @~ "pat"`
    sub_filters: list[tuple[str, str]] = None  # sub_filter(col, "f") (lib/proc.c:5168-5293)
    geo: list[tuple] = None  # index-capable geo selector units (lib/geo.c:687)
    conjunctive: bool = True

    def __post_init__(self):
        if self.subqueries is None:
            self.subqueries = []
        if self.regexps is None:
            self.regexps = []
        if self.sub_filters is None:
            self.sub_filters = []
        if self.geo is None:
            self.geo = []


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def peek(self, k=1):
        return self.s[self.i : self.i + k]

    def eat(self, tok: str) -> bool:
        self.ws()
        if self.s[self.i : self.i + len(tok)] == tok:
            self.i += len(tok)
            return True
        return False

    def parse(self):
        node = self.parse_ternary()
        self.ws()
        if self.i < len(self.s):
            raise ValueError(f"trailing filter input: {self.s[self.i:]!r}")
        return node

    # precedence (low -> high), mirroring the reference grammar
    # (grn_ecmascript.lemon:96-386): ?: < || < &&/&! < | < ^ < & <
    # ==/!= < relational/@-matches/in < <</>> < +- < */% < unary < atom
    def parse_ternary(self):
        cond = self.parse_or()
        self.ws()
        if self.peek() == "?":
            self.i += 1
            a = self.parse_ternary()
            self.ws()
            if not self.eat(":"):
                raise ValueError("ternary missing ':'")
            b = self.parse_ternary()
            return ("?:", cond, a, b)
        return cond

    def parse_or(self):
        left = self.parse_and()
        while self.eat("||"):
            left = ("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_bitor()
        while True:
            self.ws()
            if self.peek(2) == "&&":
                self.i += 2
                left = ("and", left, self.parse_bitor())
            elif self.peek(2) == "&!":
                self.i += 2
                left = ("and_not", left, self.parse_bitor())
            else:
                return left

    def parse_bitor(self):
        left = self.parse_bitxor()
        while True:
            self.ws()
            if self.peek() == "|" and self.peek(2) != "||":
                self.i += 1
                left = ("bitor", left, self.parse_bitxor())
            else:
                return left

    def parse_bitxor(self):
        left = self.parse_bitand()
        while True:
            self.ws()
            if self.peek() == "^":
                self.i += 1
                left = ("bitxor", left, self.parse_bitand())
            else:
                return left

    def parse_bitand(self):
        left = self.parse_not()
        while True:
            self.ws()
            if self.peek() == "&" and self.peek(2) not in ("&&", "&!"):
                self.i += 1
                left = ("bitand", left, self.parse_not())
            else:
                return left

    def parse_not(self):
        self.ws()
        if self.peek(2) != "!=" and self.eat("!"):
            return ("not", self.parse_not())
        return self.parse_eq()

    def parse_eq(self):
        left = self.parse_cmp()
        while True:
            self.ws()
            if self.peek(2) == "==":
                self.i += 2
                left = ("==", left, self.parse_cmp())
            elif self.peek(2) == "!=":
                self.i += 2
                left = ("!=", left, self.parse_cmp())
            else:
                return left

    def parse_cmp(self):
        left = self.parse_shift()
        self.ws()
        for op in ("<=", ">=", "@^", "@$", "@~", "@", "*N", "*S", "*T"):
            if self.eat(op):
                return (op, left, self.parse_shift())
        # single-char < > must not swallow << >>
        if self.peek() and self.peek() in "<>" and self.peek(2) not in ("<<", ">>"):
            op = self.s[self.i]
            self.i += 1
            return (op, left, self.parse_shift())
        save = self.i
        self.ws()
        if (
            self.s[self.i : self.i + 2] == "in"
            and (self.i + 2 >= len(self.s) or not (self.s[self.i + 2].isalnum() or self.s[self.i + 2] == "_"))
        ):
            self.i += 2
            return ("in", left, self.parse_shift())
        self.i = save
        return left

    def parse_shift(self):
        left = self.parse_add()
        while True:
            self.ws()
            if self.peek(2) == "<<":
                self.i += 2
                left = ("<<", left, self.parse_add())
            elif self.peek(3) == ">>>":
                self.i += 3
                left = (">>>", left, self.parse_add())
            elif self.peek(2) == ">>":
                self.i += 2
                left = (">>", left, self.parse_add())
            else:
                return left

    def parse_add(self):
        left = self.parse_mul()
        while True:
            self.ws()
            if self.peek() == "+" and self.peek(2) != "+=":
                self.i += 1
                left = ("+", left, self.parse_mul())
            elif self.peek() == "-":
                self.i += 1
                left = ("-", left, self.parse_mul())
            else:
                return left

    def parse_mul(self):
        left = self.parse_unary()
        while True:
            self.ws()
            if self.peek(2) in ("*N", "*S", "*T") and not (
                self.i + 2 < len(self.s)
                and (self.s[self.i + 2].isalnum() or self.s[self.i + 2] == "_")
            ):
                # match-mode operators (NEAR/SIMILAR/TERM_EXTRACT,
                # lib/expr.c query ops) — comparison precedence, leave
                # for parse_cmp
                return left
            if self.peek() == "*":
                self.i += 1
                left = ("*", left, self.parse_unary())
            elif self.peek() == "/":
                self.i += 1
                left = ("/", left, self.parse_unary())
            elif self.peek() == "%":
                self.i += 1
                left = ("%", left, self.parse_unary())
            else:
                return left

    def parse_unary(self):
        self.ws()
        if self.eat("-"):
            return ("neg", self.parse_unary())
        return self.parse_atom()

    def parse_atom(self):
        self.ws()
        c = self.peek()
        if c == "(":
            self.i += 1
            node = self.parse_ternary()
            if not self.eat(")"):
                raise ValueError("unbalanced ( in filter")
            return node
        if c == "[":
            self.i += 1
            items = []
            while True:
                self.ws()
                if self.eat("]"):
                    break
                items.append(self.parse_ternary())
                self.ws()
                self.eat(",")
            return ("list", items)
        if c in "\"'":
            quote = c
            self.i += 1
            buf = []
            while self.i < len(self.s) and self.s[self.i] != quote:
                ch = self.s[self.i]
                if ch == "\\" and self.i + 1 < len(self.s):
                    # JS-style string escapes (grn_expr string literal
                    # parsing): \\ \" \' \n \t; unknown escapes drop
                    # the backslash
                    nxt = self.s[self.i + 1]
                    buf.append({"n": "\n", "t": "\t"}.get(nxt, nxt))
                    self.i += 2
                    continue
                buf.append(ch)
                self.i += 1
            self.i += 1
            return ("str", "".join(buf))
        # number or identifier / function call
        start = self.i
        while self.i < len(self.s) and (self.s[self.i].isalnum() or self.s[self.i] in "._"):
            self.i += 1
        word = self.s[start : self.i]
        if not word:
            raise ValueError(f"unexpected char in filter at {self.i}: {self.s[self.i:]!r}")
        try:
            return ("num", float(word) if "." in word else int(word))
        except ValueError:
            pass
        self.ws()
        if self.peek() == "(":
            self.i += 1
            args = []
            while True:
                self.ws()
                if self.eat(")"):
                    break
                if self.i >= len(self.s):
                    raise ValueError(f"unterminated call args for {word}()")
                args.append(self.parse_ternary())
                self.ws()
                self.eat(",")
            return ("call", word, args)
        if word == "true":
            return ("num", True)
        if word == "false":
            return ("num", False)
        if word == "null":
            return ("num", None)
        node = ("col", word)
        # vector element access: tags[1] (GRN_OP_GET_MEMBER,
        # lib/expr.c:4840 accessor compilation)
        while self.peek() == "[":
            self.i += 1
            idx = self.parse_ternary()
            self.ws()
            if not self.eat("]"):
                raise ValueError("unbalanced [ in filter subscript")
            node = ("subscript", node, idx)
        return node


def parse_filter(s: str):
    return _P(s).parse()


def parse_assignment(s: str) -> tuple[str, str, object]:
    """Parse an assignment expression ``target op rhs`` (op one of
    ``= += -= *= /=``) — the reference VM's GRN_OP_ASSIGN family
    (lib/expr.c:2330-2780) as used by ``--scorer``. Returns
    ``(target, op, rhs_ast)``."""
    p = _P(s)
    p.ws()
    start = p.i
    while p.i < len(p.s) and (p.s[p.i].isalnum() or p.s[p.i] in "._"):
        p.i += 1
    target = p.s[start : p.i]
    if not target:
        raise ValueError(f"assignment needs a target: {s!r}")
    p.ws()
    for op in (
        ">>>=", "<<=", ">>=", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "=",
    ):
        if p.s[p.i : p.i + len(op)] == op and p.s[p.i : p.i + 2] != "==":
            p.i += len(op)
            rhs = p.parse_ternary()
            p.ws()
            if p.i < len(p.s):
                raise ValueError(f"trailing input after assignment: {p.s[p.i:]!r}")
            return target, op, rhs
    raise ValueError(f"not an assignment: {s!r}")


def split_filter(ast, geo_columns: set | frozenset = frozenset()) -> FilterPlan:
    """Route top-level AND-ed `col @ "text"` terms to the index; keep
    the rest as a columnar predicate (scan_info_build analogue).
    Non-AND shapes fall back entirely to the columnar scan.

    ``geo_columns``: columns with a geo index — top-level
    ``geo_in_rectangle(col, tl, br)`` / ``geo_in_circle(col, c, r)``
    conjuncts (bare or ``... > 0``) on those columns become geo
    scan-info units served by the mesh-cover index scan (the selector
    path grn_geo_select_in_rectangle, lib/geo.c:687-1016; scan_info
    routing lib/expr.c:4360-4660). Other columns keep the sequential
    kernel."""
    matches: list[tuple[str, str]] = []
    subqueries: list[tuple[str, str]] = []
    regexps: list[tuple[str, str]] = []
    sub_filters: list[tuple[str, str]] = []
    geo: list[tuple] = []

    def geo_unit(n):
        """Recognize an index-capable geo selector call; return the geo
        scan-info tuple or None. A BARE geo call (no ``> 0`` wrapper)
        is the selector-only form and REQUIRES the index — the
        reference errors rc -22 "index column is missing" without one
        (grn_geo_select_* selector registration, lib/proc.c:4696-4788;
        the ``> 0`` form falls back to sequential evaluation)."""
        bare = n[0] == "call"
        if n[0] == ">" and n[2] == ("num", 0):
            n = n[1]  # `geo_fn(...) > 0` — the sequential-form wrapper
        if n[0] != "call" or not isinstance(n[2], list):
            return None
        args = n[2]
        if n[1] in ("geo_in_rectangle", "geo_in_circle") and args and (
            args[0][0] == "col" and args[0][1] not in geo_columns
        ):
            if bare:
                raise ValueError(f"{n[1]}(): index column is missing")
            return None
        if (
            n[1] == "geo_in_rectangle" and len(args) == 3
            and args[0][0] == "col" and args[0][1] in geo_columns
            and args[1][0] == "str" and args[2][0] == "str"
        ):
            return ("rect", args[0][1], args[1][1], args[2][1])
        if (
            n[1] == "geo_in_circle" and len(args) in (3, 4)
            and args[0][0] == "col" and args[0][1] in geo_columns
            and args[1][0] == "str" and args[2][0] in ("num", "str")
        ):
            approx = "rectangle"
            if len(args) == 4 and args[3][0] == "str":
                approx = args[3][1]
            # radius: meters, or a rim GeoPoint string (resolved at
            # evaluation time, geo.geo_radius)
            return ("circle", args[0][1], args[1][1], args[2][1], approx)
        return None

    def walk(n):
        if n[0] == "and":
            left = walk(n[1])
            right = walk(n[2])
            if left is None:
                return right
            if right is None:
                return left
            return ("and", left, right)
        if n[0] == "@" and n[1][0] == "col" and n[2][0] == "str":
            matches.append((n[1][1], n[2][1], "match"))
            return None
        if n[0] in ("*N", "*S", "*T") and n[1][0] == "col" and n[2][0] == "str":
            # match-mode operators: NEAR / SIMILAR / TERM_EXTRACT
            # (grn_table_select index path, lib/expr.c:4360)
            mode = {"*N": "near", "*S": "similar", "*T": "term_extract"}[n[0]]
            matches.append((n[1][1], n[2][1], mode))
            return None
        if n[0] == "@~" and n[1][0] == "col" and n[2][0] == "str":
            regexps.append((n[1][1], n[2][1]))
            return None
        if (
            n[0] == "call" and n[1] == "query" and len(n[2]) in (2, 3)
            and all(a[0] in ("str", "col") for a in n[2])
            and n[2][0][0] == "str" and n[2][1][0] == "str"
        ):
            # (match_columns, query[, query_expander]) —
            # lib/proc.c:5138 func_query
            expander = n[2][2][1] if len(n[2]) == 3 else None
            subqueries.append((n[2][0][1], n[2][1][1], False, expander))
            return None
        if (
            n[0] == "==" and n[2] == ("num", True)
            and n[1][0] == "call" and n[1][1] == "query"
            and len(n[1][2]) == 2
            and n[1][2][0][0] == "str" and n[1][2][1][0] == "str"
        ):
            # `query(...) == true` is the bare query() predicate in a
            # BOOLEAN context: membership only, score 1 (the comparison
            # result, not the query's accumulated score)
            subqueries.append((n[1][2][0][1], n[1][2][1][1], True))
            return None
        if (
            n[0] == "call" and n[1] == "sub_filter" and len(n[2]) == 2
            and n[2][0][0] == "col" and n[2][1][0] == "str"
        ):
            sub_filters.append((n[2][0][1], n[2][1][1]))
            return None
        g = geo_unit(n)
        if g is not None:
            geo.append(g)
            return None
        return n

    residual = walk(ast)
    return FilterPlan(matches, residual, subqueries, regexps, sub_filters, geo)


def _geo_arg(ev, node):
    """A GeoPoint argument: string literal stays a scalar string,
    anything else evaluates to a column."""
    if node[0] == "str":
        return node[1]
    return ev(node)


def unsigned_shift_right(a, b):
    """``a >>> b``: logical shift on a's type width — an int16 -16
    becomes 0xFFF0 (65520) before the shift, like the reference's
    typed VM registers."""
    width = 64
    t = getattr(a, "type", None)
    if t is not None and pa.types.is_integer(t):
        width = t.bit_width
    def _np(v):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return v.to_numpy(zero_copy_only=False).astype(np.int64)
        if isinstance(v, pa.Scalar):
            return np.asarray(int(v.as_py()), np.int64)
        return np.asarray(v, np.int64)

    av, bv = _np(a), _np(b)
    mask = np.uint64(2**width - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    return ((av.astype(np.uint64) & mask) >> bv.astype(np.uint64)).astype(np.int64)


def _is_stringy(v) -> bool:
    if isinstance(v, str):
        return True
    t = getattr(v, "type", None)
    return t is not None and (pa.types.is_string(t) or pa.types.is_large_string(t))


def _as_string(v, peer):
    """Cast an operand of string-+ to a string array, broadcasting
    scalars to the peer's length."""
    if isinstance(v, str):
        n = len(peer) if hasattr(peer, "__len__") else 1
        return pa.array([v] * n, pa.string())
    if isinstance(v, pa.Scalar):
        n = len(peer) if hasattr(peer, "__len__") else 1
        return pa.array([str(v.as_py())] * n, pa.string())
    if _is_stringy(v):
        return v.cast(pa.string()) if not pa.types.is_string(v.type) else v
    return v.cast(pa.string())


def _coerce_cmp(a, b):
    """Comparison-operand casts the reference VM performs on typed
    registers (lib/expr.c:2330-2780): a datetime TEXT literal compared
    against a numeric (Time) column parses via grn_str2timeval
    (localtime, lib/str.c:2889); a plain numeric string parses as a
    number."""
    from .utils import parse_time_text

    def _num_type(x):
        t = getattr(x, "type", None)
        return t is not None and (pa.types.is_integer(t) or pa.types.is_floating(t))

    def _cast_lit(lit, other):
        if not isinstance(lit, pa.Scalar) or not pa.types.is_string(lit.type):
            return lit
        if not _num_type(other):
            return lit
        s = lit.as_py()
        try:
            return pa.scalar(float(s))
        except (TypeError, ValueError):
            t = parse_time_text(s) if isinstance(s, str) else None
            return lit if t is None else pa.scalar(t)

    return _cast_lit(a, b), _cast_lit(b, a)


def _scalar_truthy(s: pa.Scalar) -> bool:
    """ECMAScript truthiness of a scalar operand (null/false/0/"" are
    falsy — lib/expr_executor.c grn_obj_is_true)."""
    v = s.as_py()
    return bool(v)


def _truthy_arr(a):
    """Per-row ECMAScript truthiness of an array operand."""
    t = getattr(a, "type", None)
    if t is not None and pa.types.is_boolean(t):
        return pc.fill_null(a, False)
    if t is not None and (pa.types.is_string(t) or pa.types.is_large_string(t)):
        return pc.and_(pc.is_valid(a), pc.not_equal(a, ""))
    if t is not None and (pa.types.is_integer(t) or pa.types.is_floating(t)):
        return pc.and_(pc.is_valid(a), pc.not_equal(a, 0))
    if _is_listy(a):
        return pa.array([True] * len(a))
    return pc.is_valid(a)


def _norm_query(q: str) -> str:
    """NormalizerAuto on a sequential-operator query literal
    (lib/operator.c:773 normalizes the query side too; flags=0 keeps
    blanks — only the target side we lower with utf8_lower keeps its
    blanks, so the query side must too)."""
    import unicodedata

    return unicodedata.normalize("NFKC", q).lower()


def _is_listy(v) -> bool:
    t = getattr(v, "type", None)
    return t is not None and (pa.types.is_list(t) or pa.types.is_large_list(t))


def _list_at(arr, i: int):
    """Element i of every list, null where the list is shorter
    (GRN_OP_GET_MEMBER on a vector column)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    import numpy as np

    offs = arr.offsets.to_numpy()
    lens = offs[1:] - offs[:-1]
    valid = lens > i
    take_idx = np.where(valid, offs[:-1] + i, 0)
    vals = arr.values.take(pa.array(take_idx))
    return pc.if_else(pa.array(valid), vals, pa.scalar(None, arr.type.value_type))


def eval_filter(ast, batch: pa.Table):
    """Evaluate a filter AST against a record batch -> BooleanArray /
    value array, fully vectorized."""

    def _bool(v):
        # a vector operand in boolean context is TRUE (grn_obj_is_true
        # on a vector bulk, lib/expr_executor.c)
        if _is_listy(v):
            return pa.array([True] * len(v))
        return v

    def ev(n):
        kind = n[0]
        if kind == "col":
            return batch.column(n[1])
        if kind in ("num", "str"):
            return pa.scalar(n[1])
        if kind == "list":
            return pa.scalar([v[1] for v in n[1]])
        if kind == "subscript":
            base = ev(n[1])
            if _is_listy(base):
                return _list_at(base, int(n[2][1]))
            return base
        if kind == "and":
            a = ev(n[1])
            if isinstance(a, pa.Scalar):
                # ECMAScript && returns an OPERAND (output-columns
                # expressions render the value; falsy renders false —
                # select/filter/logical_operation)
                return ev(n[2]) if _scalar_truthy(a) else pa.scalar(False)
            return pc.and_kleene(_bool(a), _bool(ev(n[2])))
        if kind == "or":
            a = ev(n[1])
            if isinstance(a, pa.Scalar):
                if _scalar_truthy(a):
                    return a
                b = ev(n[2])
                if isinstance(b, pa.Scalar) and not _scalar_truthy(b):
                    # a fully-falsy || chain renders false (null and
                    # false both print as false in the envelope)
                    return pa.scalar(False)
                return b
            b = ev(n[2])
            if _is_listy(a) or _is_listy(b):
                return pc.or_kleene(_bool(a), _bool(b))
            at, bt = getattr(a, "type", None), getattr(b, "type", None)
            if at is not None and not pa.types.is_boolean(at):
                # value-returning ||: per-row pick the first truthy
                # operand (ECMAScript semantics over columns)
                mask = _truthy_arr(a)
                if isinstance(b, pa.Scalar):
                    b = pa.array([b.as_py()] * len(a)).cast(at)
                return pc.if_else(mask, a, b)
            if bt is not None and not pa.types.is_boolean(bt):
                mask = pc.invert(_bool(a))
                a_f = pa.array([None] * len(b)).cast(bt)
                return pc.if_else(mask, b, a_f)
            return pc.or_kleene(_bool(a), _bool(b))
        if kind == "and_not":
            return pc.and_kleene(_bool(ev(n[1])), pc.invert(_bool(ev(n[2]))))
        if kind == "not":
            return pc.invert(_bool(ev(n[1])))
        if kind == "neg":
            v = ev(n[1])
            t = getattr(v, "type", None)
            if t is not None and pa.types.is_unsigned_integer(t):
                # promote so -uint doesn't wrap (the reference negates
                # into a signed register); a UInt64 beyond INT64_MAX
                # has no signed inverse (grn arithmetic error)
                try:
                    v = v.cast(pa.int64())
                except pa.ArrowInvalid:
                    big = pc.min_max(v)["max"].as_py()
                    raise ValueError(
                        f"too large UInt64 value to inverse sign: <{big}>"
                    )
            return pc.negate(v)
        if kind in ("==", "!=", "<", ">", "<=", ">="):
            fn = {
                "==": pc.equal, "!=": pc.not_equal, "<": pc.less,
                ">": pc.greater, "<=": pc.less_equal, ">=": pc.greater_equal,
            }[kind]
            a, b = ev(n[1]), ev(n[2])
            if kind in ("==", "!=") and (_is_listy(a) or _is_listy(b)):
                # vector comparison semantics (select/filter/vector):
                # == a vector literal never matches (unsupported in the
                # reference, evaluates false); == "" is true for an
                # empty/unset vector; != mirrors with "initialized" as
                # the truth source
                a_col = _is_listy(a) and not isinstance(a, pa.Scalar)
                vec = a if a_col else b
                other = b if a_col else a
                if isinstance(vec, pa.Scalar):
                    vec, other = other, vec
                size = pc.list_value_length(
                    vec.combine_chunks() if isinstance(vec, pa.ChunkedArray) else vec
                )
                empty_lit = (
                    isinstance(other, pa.Scalar)
                    and pa.types.is_string(other.type)
                    and other.as_py() == ""
                )
                if empty_lit:
                    res = pc.equal(size, 0)
                else:
                    res = pa.array([False] * len(vec))
                return res if kind == "==" else pc.and_(
                    pc.invert(res), pc.greater(size, 0)
                )
            a, b = _coerce_cmp(a, b)
            return fn(a, b)
        if kind in ("+", "-", "*", "/", "%"):
            a, b = ev(n[1]), ev(n[2])
            if kind == "+" and (_is_stringy(a) or _is_stringy(b)):
                # string + is concatenation (grn_operator OP_PLUS on
                # text operands, lib/expr.c arithmetic dispatch)
                return pc.binary_join_element_wise(
                    _as_string(a, b), _as_string(b, a), ""
                )
            at = getattr(a, "type", None)
            bt = getattr(b, "type", None)
            if (
                kind == "/"
                and at is not None and pa.types.is_signed_integer(at)
                and (
                    (bt is not None and pa.types.is_integer(bt))
                    or isinstance(b, int)
                )
            ):
                # C-style integer division: truncate toward zero and
                # wrap at the LEFT operand's width (INT32_MIN / -1 ==
                # INT32_MIN — the reference's typed registers,
                # lib/operator.c arithmetic dispatch). numpy path keeps
                # INT64_MIN / -1 off Arrow's overflow check.
                w = at.bit_width

                def _npv(v):
                    if isinstance(v, (pa.Array, pa.ChunkedArray)):
                        return v.to_numpy(zero_copy_only=False).astype(
                            np.int64
                        )
                    if isinstance(v, pa.Scalar):
                        return np.asarray(int(v.as_py()), np.int64)
                    return np.asarray(int(v), np.int64)

                av, bv = _npv(a), _npv(b)
                if not np.all(bv != 0):
                    return pc.divide(a, b)  # raise like the reference
                with np.errstate(over="ignore"):
                    q = (np.abs(av) // np.abs(bv)) * (
                        np.sign(av) * np.sign(bv)
                    )
                q = q.astype(object)
                q = ((q + (1 << (w - 1))) % (1 << w)) - (1 << (w - 1))
                if q.ndim == 0:
                    return pa.scalar(int(q), at)
                return pa.array([int(x) for x in q], at)
            fn = {
                "+": pc.add, "-": pc.subtract, "*": pc.multiply,
                "/": pc.divide, "%": lambda a, b: pc.subtract(a, pc.multiply(pc.floor(pc.divide(a, b)), b)),
            }[kind]
            return fn(a, b)
        if kind == "?:":
            return pc.if_else(ev(n[1]), ev(n[2]), ev(n[3]))
        if kind in ("bitand", "bitor", "bitxor"):
            fn = {
                "bitand": pc.bit_wise_and, "bitor": pc.bit_wise_or,
                "bitxor": pc.bit_wise_xor,
            }[kind]
            return fn(ev(n[1]), ev(n[2]))
        if kind in ("<<", ">>"):
            fn = pc.shift_left if kind == "<<" else pc.shift_right
            return fn(ev(n[1]), ev(n[2]))
        if kind == ">>>":
            # unsigned (logical) right shift at the operand's declared
            # width (GRN_OP_SHIFTRR, lib/operator.c)
            a, b = ev(n[1]), ev(n[2])
            return pa.array(unsigned_shift_right(a, b))
        if kind == "in":
            vals = n[2]
            if vals[0] != "list":
                raise ValueError("`in` expects a [list] literal on the right")
            return pc.is_in(ev(n[1]), value_set=pa.array([v[1] for v in vals[1]]))
        if kind == "in_set":
            # synthesized by the engine (sub_filter resolution): value
            # set precomputed from the referenced table's sub-select
            vs = n[2]
            if not isinstance(vs, (pa.Array, pa.ChunkedArray)):
                vs = pa.array(vs)
            tgt = ev(n[1])
            if _is_listy(tgt):
                # vector reference column: ANY element in the key set
                # matches (grn_accessor_resolve over a vector,
                # lib/proc.c:5269)
                if isinstance(tgt, pa.ChunkedArray):
                    tgt = tgt.combine_chunks()
                hit = pc.is_in(pc.list_flatten(tgt), value_set=vs)
                parents = pc.list_parent_indices(tgt).to_numpy()
                out = np.zeros(len(tgt), bool)
                np.logical_or.at(
                    out, parents, hit.to_numpy(zero_copy_only=False).astype(bool)
                )
                return pa.array(out)
            return pc.is_in(tgt, value_set=vs)
        if kind == "@~":
            # sequential regexp scan fallback (REGEXP mode's index-
            # assisted path lives in the engine; reference
            # lib/ii.c:6049-6118). No normalization (operator.c:766:
            # GRN_OP_REGEXP skips the NormalizerAuto pass); Onigmo
            # anchors \A/\z map to RE2 ^/$
            pat = n[2][1].replace(r"\A", "^").replace(r"\z", "$")
            return pc.match_substring_regex(ev(n[1]), pat)
        if kind == "@":
            # unindexed substring match fallback (sequential scan,
            # grn_table_select_sequential analogue). On a numeric
            # column GRN_OP_MATCH degenerates to equality (the range
            # index match path, lib/ii.c grn_ii_select on a non-text
            # lexicon → key equality)
            if n[2][0] == "col":
                # the match argument must be a constant (the reference
                # rejects a column operand — grn_table_select
                # "invalid argument" on GRN_OP_MATCH, lib/expr.c)
                raise ValueError(
                    f"invalid match argument: column <{n[2][1]}>"
                )
            lhs = ev(n[1])
            base_type = getattr(lhs, "type", None)
            if base_type is not None and not (
                pa.types.is_string(base_type) or pa.types.is_large_string(base_type)
                or pa.types.is_list(base_type) or pa.types.is_large_list(base_type)
            ):
                rhs = n[2][1]
                if isinstance(rhs, str):
                    rhs = float(rhs) if pa.types.is_floating(base_type) else int(
                        float(rhs)
                    )
                return pc.equal(lhs, rhs)
            if base_type is not None and (
                pa.types.is_list(base_type) or pa.types.is_large_list(base_type)
            ):
                # vector column match: ANY element matches (grn_ii over
                # a vector source — element-level lexicon hits)
                if isinstance(lhs, pa.ChunkedArray):
                    lhs = lhs.combine_chunks()
                flat = pc.list_flatten(lhs)
                hit = pc.match_substring(
                    pc.utf8_lower(flat), _norm_query(n[2][1])
                ).to_numpy(zero_copy_only=False)
                lens = pc.list_value_length(lhs).fill_null(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                parent = np.repeat(np.arange(len(lens)), lens)
                out = np.zeros(len(lens), bool)
                if len(parent):
                    np.logical_or.at(out, parent, hit.astype(bool))
                return pa.array(out)
            return pc.match_substring(pc.utf8_lower(lhs), _norm_query(n[2][1]))
        if kind == "@^":
            # sequential text operators normalize BOTH sides with
            # NormalizerAuto (exec_text_operator_raw_text_raw_text,
            # lib/operator.c:745-800) — utf8_lower approximates the
            # target side vectorized; the query literal gets the full
            # normalizer
            return pc.starts_with(pc.utf8_lower(ev(n[1])), _norm_query(n[2][1]))
        if kind == "@$":
            return pc.ends_with(pc.utf8_lower(ev(n[1])), _norm_query(n[2][1]))
        if kind == "call":
            name, args = n[1], n[2]
            if name == "between":
                # between(col, min[, min_border], max[, max_border])
                # (lib/proc.c:5570-5960): borders are "include"/"exclude"
                # strings; string bounds cast to the column's type
                # (grn_obj_cast semantics — "20" vs Int32, time text vs
                # Time)
                col = ev(args[0])
                if len(args) >= 5:
                    lo, lo_b = ev(args[1]), str(args[2][1])
                    hi, hi_b = ev(args[3]), str(args[4][1])
                else:
                    lo, lo_b = ev(args[1]), "include"
                    hi, hi_b = ev(args[2]), "include"

                def _bound(v, ct):
                    if isinstance(v, pa.Scalar) and pa.types.is_string(v.type):
                        v = v.as_py()
                    if not isinstance(v, str):
                        return v
                    if pa.types.is_integer(ct):
                        return int(float(v))
                    if pa.types.is_floating(ct):
                        from .utils import parse_time_text

                        t = parse_time_text(v)
                        if t is not None:
                            return t
                        return float(v)
                    if pa.types.is_timestamp(ct):
                        from .utils import parse_time_text

                        t = parse_time_text(v)
                        if t is not None:
                            return pa.scalar(
                                int(t * 1e6), pa.timestamp("us")
                            )
                    return v

                ct = col.type if hasattr(col, "type") else None
                if ct is not None:
                    lo, hi = _bound(lo, ct), _bound(hi, ct)
                ge = pc.greater if lo_b == "exclude" else pc.greater_equal
                le = pc.less if hi_b == "exclude" else pc.less_equal
                return pc.and_(ge(col, lo), le(col, hi))
            if name in ("max", "min"):
                # N-ary element-wise max/min (lib/proc.c:4586-4678);
                # zero args -> 0 (the reference leaves _score at the
                # GRN_INT32_INIT default)
                if not args:
                    return pa.array(np.zeros(batch.num_rows, np.int64))
                vals = [ev(a) for a in args]
                fn = pc.max_element_wise if name == "max" else pc.min_element_wise
                return vals[0] if len(vals) == 1 else fn(*vals)
            if name == "in_values":
                col = ev(args[0])
                vals = pa.array([a[1] for a in args[1:]])
                return pc.is_in(col, value_set=vals)
            if name == "all_records":
                return pa.array(np.ones(batch.num_rows, bool))
            if name == "vector_size":
                return pc.list_value_length(ev(args[0]))
            if name == "edit_distance":
                return pa.array(edit_distance_batch(ev(args[0]), ev(args[1])))
            if name == "html_untag":
                from .functions import html_untag

                return html_untag(ev(args[0]))
            if name == "geo_distance":
                from .geo import geo_distance

                approx = args[2][1] if len(args) > 2 else "rectangle"
                return pa.array(
                    geo_distance(_geo_arg(ev, args[0]), _geo_arg(ev, args[1]), approx)
                )
            if name == "geo_in_rectangle":
                from .geo import geo_in_rectangle

                return pa.array(
                    geo_in_rectangle(
                        _geo_arg(ev, args[0]), _geo_arg(ev, args[1]), _geo_arg(ev, args[2])
                    )
                )
            if name == "geo_in_circle":
                from .geo import geo_in_circle

                approx = args[3][1] if len(args) > 3 else "rectangle"
                return pa.array(
                    geo_in_circle(
                        _geo_arg(ev, args[0]), _geo_arg(ev, args[1]), args[2][1], approx
                    )
                )
            from .functions import CUSTOM_FUNCTIONS

            if name in CUSTOM_FUNCTIONS:
                return CUSTOM_FUNCTIONS[name](*[ev(a) for a in args])
            raise ValueError(f"unknown filter function {name}")
        raise ValueError(f"unknown filter node {n!r}")

    return ev(ast)


def edit_distance_batch(a, b) -> np.ndarray:
    """Levenshtein distance (lib/proc.c:4790-4828 DP), per row.
    Accepts column vs column or column vs scalar."""

    def dist(x: str, y: str) -> int:
        if x is None or y is None:
            return 0
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i] + [0] * len(y)
            for j, cy in enumerate(y, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy))
            prev = cur
        return prev[-1]

    if isinstance(a, pa.Scalar):
        a_list = None
    if isinstance(b, pa.Scalar):
        bs = b.as_py()
        return np.array([dist(x, bs) for x in a.to_pylist()], np.int64)
    if isinstance(a, pa.Scalar):
        as_ = a.as_py()
        return np.array([dist(as_, y) for y in b.to_pylist()], np.int64)
    return np.array([dist(x, y) for x, y in zip(a.to_pylist(), b.to_pylist())], np.int64)
