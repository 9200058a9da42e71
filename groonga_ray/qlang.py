"""Query-syntax parser (the reference's ``--query`` language).

Grammar reimplemented from get_op/get_word/parse_query
(lib/expr.c:5723-5970): space-separated terms with a default connective
(AND for select), ``OR`` keyword, ``+term`` (AND), ``-term`` (AND_NOT),
``~term`` (ADJUST), parenthesised groups, ``"quoted phrase"``,
``col:value`` (exact), ``col:@value`` (match), ``col:^value`` (prefix),
``col:<,>,<=,>=,! value`` (range/NE filters, evaluated against scalar
columns), trailing ``*`` on a bare word = prefix match.

Also parses ``match_columns`` specs: ``content``,
``title*2||content`` (section weights, lib/expr.c:4039-4180), and
``scorer_tf_idf(content)`` (pluggable scorer surface).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ------------------------------------------------------------------ AST

@dataclass
class TermNode:
    text: str
    mode: str = "match"            # match | prefix | suffix | regexp
    section: str | None = None     # col:... override
    explicit: bool = False         # col:@v (explicit match op) vs col:v


class NoMatchNode:
    """An expression that selects nothing (e.g. a trailing OR leaves
    the reference's expression stack with a missing operand and the
    select returns 0 hits)."""


@dataclass
class PhraseNode:
    text: str
    section: str | None = None


@dataclass
class RangeNode:                   # col:<v etc. — scalar column filter
    column: str
    op: str                        # < > <= >= == !=
    value: str


@dataclass
class AndNode:
    children: list = field(default_factory=list)


@dataclass
class OrNode:
    children: list = field(default_factory=list)


@dataclass
class NotNode:                     # a AND_NOT b
    positive: object = None
    negative: object = None


@dataclass
class AdjustNode:                  # a ADJUST b (score bump, no filtering)
    base: object = None
    adjust: object = None


class QueryParseError(ValueError):
    pass


@dataclass
class NearNode:
    """``*N"w1 w2"`` — ordered proximity match (GRN_OP_NEAR,
    grn_ecmascript.lemon:199 `*N`); optional digits set max_interval
    (DEFAULT_NEAR_MAX_INTERVAL=10, lib/expr.c)."""

    text: str
    max_interval: int = 10


@dataclass
class SimilarNode:
    """``*S"document text"`` — similar-document match (GRN_OP_SIMILAR,
    grn_ecmascript.lemon:203); ``*S2"..."`` sets similarity_threshold
    (the number of rare tokens used)."""

    text: str
    threshold: int = 0


@dataclass
class QueryPragma:
    """Leading ``*X`` pragmas (get_pragma, lib/expr.c:5593-5639):
    ``*E<n>[,decay]`` sets the match-escalation threshold, ``*D<op>``
    the default logical operator for unprefixed terms."""

    escalation_threshold: int | None = None
    default_op: str | None = None       # "and" | "or" | "and_not" | "adjust"


class _Parser:
    def __init__(
        self,
        s: str,
        allow_column: bool = True,
        default_op: str = "and",
        allow_leading_not: bool = False,
    ):
        self.s = s
        self.i = 0
        self.allow_column = allow_column
        self.default_op = default_op
        self.allow_leading_not = allow_leading_not

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def parse(self):
        node = self.parse_or()
        self.skip_ws()
        if self.i < len(self.s):
            raise QueryParseError(f"trailing input at {self.i}: {self.s[self.i:]!r}")
        return node

    def parse_or(self):
        left = self.parse_and()
        while True:
            save = self.i
            self.skip_ws()
            if self.s[self.i : self.i + 2] == "OR" and (
                self.i + 2 >= len(self.s) or self.s[self.i + 2].isspace() or self.s[self.i + 2] == "("
            ):
                self.i += 2
                try:
                    right = self.parse_and()
                except QueryParseError:
                    self.skip_ws()
                    if self.i < len(self.s):
                        self.i = save
                        return left
                    # trailing OR with no right operand: the whole
                    # expression selects NOTHING (the reference's
                    # expression stack ends up with a missing operand
                    # and the select returns 0 hits)
                    return NoMatchNode()
                if isinstance(left, OrNode):
                    left.children.append(right)
                else:
                    left = OrNode([left, right])
            else:
                self.i = save
                return left

    def parse_and(self):
        result = None
        while True:
            self.skip_ws()
            if self.i >= len(self.s) or self.peek() == ")":
                break
            save = self.i
            if self.s[self.i : self.i + 2] == "OR" and (
                self.i + 2 >= len(self.s) or self.s[self.i + 2].isspace() or self.s[self.i + 2] == "("
            ):
                self.i = save
                break
            op = self.default_op
            explicit_op = False
            c = self.peek()
            nxt = self.s[self.i + 1 : self.i + 2]
            if c in "+-~" and not nxt:
                # a trailing bare +/-/~ is a TERM
                pass
            elif c == "+":
                op = "and"
                explicit_op = True
                self.i += 1
            elif c == "-":
                op = "not"
                explicit_op = True
                self.i += 1
            elif c == "~":
                op = "adjust"
                explicit_op = True
                self.i += 1
            self.skip_ws()  # "Ruby - groonga": operator binds across spaces
            unit = self.parse_unit()
            if result is None:
                if op == "not":
                    if explicit_op and not self.allow_leading_not:
                        # an explicit leading -term is a syntax error
                        # unless ALLOW_LEADING_NOT (GRN_SYNTAX_ERROR,
                        # select/query/invalid/leading_not)
                        raise QueryParseError("leading NOT has no left operand")
                    # *D- default: NOT against the (implicit) whole set
                    result = NotNode(None, unit)
                elif op == "adjust":
                    result = AdjustNode(None, unit)
                else:
                    result = unit
            elif op == "or":
                if isinstance(result, OrNode):
                    result.children.append(unit)
                else:
                    result = OrNode([result, unit])
            elif op == "and":
                if isinstance(result, AndNode):
                    result.children.append(unit)
                else:
                    result = AndNode([result, unit])
            elif op == "not":
                result = NotNode(result, unit)
            else:
                result = AdjustNode(result, unit)
        if result is None:
            raise QueryParseError("empty query")
        return result

    def parse_unit(self):
        c = self.peek()
        if c == "(":
            self.i += 1
            node = self.parse_or()
            self.skip_ws()
            if self.peek() != ")":
                raise QueryParseError("unbalanced parenthesis")
            self.i += 1
            return node
        if c == "*" and self.s[self.i + 1 : self.i + 2] in ("N", "S"):
            kind = self.s[self.i + 1]
            self.i += 2
            num = ""
            while self.peek().isdigit():
                num += self.s[self.i]
                self.i += 1
            if self.peek() == '"':
                self.i += 1
                start = self.i
                while self.i < len(self.s) and self.s[self.i] != '"':
                    self.i += 1
                text = self.s[start : self.i]
                if self.peek() == '"':
                    self.i += 1
                if kind == "N":
                    return NearNode(text, int(num) if num else 10)
                return SimilarNode(text, int(num) if num else 0)
            raise QueryParseError(f"*{kind} expects a quoted phrase at {self.i}")
        if c == '"':
            self.i += 1
            start = self.i
            while self.i < len(self.s) and self.s[self.i] != '"':
                self.i += 1
            text = self.s[start : self.i]
            if self.peek() == '"':
                self.i += 1
            return PhraseNode(text)
        # bare word or col:op-value; backslash escapes make specials
        # literal term characters (get_word, lib/expr.c:5723-5831)
        start = self.i
        buf: list[str] = []
        esc: list[bool] = []
        while self.i < len(self.s):
            ch = self.s[self.i]
            if ch == "\\" and self.i + 1 < len(self.s):
                buf.append(self.s[self.i + 1])
                esc.append(True)
                self.i += 2
                continue
            if ch == '"' and ":" in "".join(buf):
                # col:@"multi word" / col:~"pattern": the quoted text
                # joins the operand (get_word consumes the quoted
                # block after a column op, lib/expr.c:5723)
                self.i += 1
                while self.i < len(self.s) and self.s[self.i] != '"':
                    buf.append(self.s[self.i])
                    esc.append(False)
                    self.i += 1
                self.i += 1
                continue
            if ch.isspace() or ch in '()"':
                break
            buf.append(ch)
            esc.append(False)
            self.i += 1
        word = "".join(buf)
        raw = self.s[start : self.i]
        if not word:
            raise QueryParseError(f"expected term at {start}")
        if self.allow_column and ":" in raw:
            col_r, rest_r = raw.split(":", 1)
            if rest_r.startswith("~") and "\\" not in col_r:
                # col:~regexp — the pattern keeps its backslashes
                # verbatim (REGEXP mode, lib/ii.c:6049)
                pat = rest_r[1:]
                if len(pat) >= 2 and pat[0] == '"' and pat[-1] == '"':
                    pat = pat[1:-1]
                return TermNode(pat, "regexp", col_r)
        if any(esc):
            # escaped chars are literal: no col:/prefix interpretation
            # except a trailing UNESCAPED *
            if word.endswith("*") and not esc[-1] and len(word) > 1:
                return TermNode(word[:-1], "prefix")
            return TermNode(word)
        if word == "*":
            return TermNode(word)  # a lone * is a literal symbol term
        if ":" in word and self.allow_column:
            col, rest = word.split(":", 1)
            if rest.startswith("@"):
                return TermNode(rest[1:], "match", col, explicit=True)
            if rest.startswith("^"):
                return TermNode(rest[1:], "prefix", col)
            if rest.startswith("$"):
                # col:$value — SUFFIX search mode (grn query syntax
                # QUERY_SYNTAX suffix op, lib/expr.c:5723)
                return TermNode(rest[1:], "suffix", col)
            if rest.startswith("~"):
                # col:~pattern — REGEXP mode (lib/ii.c:6049-6118)
                return TermNode(rest[1:], "regexp", col)
            for op_s, op in (("<=", "<="), (">=", ">="), ("<", "<"), (">", ">"), ("!", "!=")):
                if rest.startswith(op_s):
                    return RangeNode(col, op, rest[len(op_s) :])
            return TermNode(rest, "match", col)
        if word.endswith("*") and len(word) > 1:
            return TermNode(word[:-1], "prefix")
        return TermNode(word)


def parse_query(
    s: str,
    *,
    allow_column: bool = True,
    default_op: str = "and",
    allow_leading_not: bool = False,
):
    """Parse a --query string into the boolean AST."""
    return _Parser(
        s,
        allow_column=allow_column,
        default_op=default_op,
        allow_leading_not=allow_leading_not,
    ).parse()


def strip_pragmas(s: str) -> tuple[str, QueryPragma]:
    """Consume leading ``*E``/``*D`` pragmas (get_pragma,
    lib/expr.c:5593-5639); returns (rest_of_query, pragma)."""
    p = QueryPragma()
    i = 0
    while i < len(s) and s[i] == "*":
        j = i + 1
        if j >= len(s):
            break
        kind = s[j]
        j += 1
        if kind == "E":
            k = j
            if k < len(s) and s[k] == "-":
                k += 1
            while k < len(s) and s[k].isdigit():
                k += 1
            if k > j:
                p.escalation_threshold = int(s[j:k])
            if k < len(s) and s[k] == ",":
                k += 1
                while k < len(s) and (s[k].isdigit() or s[k] == "-"):
                    k += 1          # decay step accepted, unused
            i = j = k
        elif kind == "D":
            ops = {"O": "or", "+": "and", "-": "not", ">": "adjust"}
            if j < len(s) and s[j] in ops:
                p.default_op = ops[s[j]]
                j += 1
            i = j
        else:
            break
        i = j
    return s[i:].lstrip(), p


def parse_query_flags(flags: str | None) -> tuple[bool, bool, bool]:
    """(allow_pragma, allow_column, allow_leading_not) from a
    ``--query_flags`` string (grn_parse_query_flags, lib/expr.c:413-
    460). Default matches the reference's select default
    ALLOW_PRAGMA|ALLOW_COLUMN."""
    if not flags:
        return True, True, False
    parts = {f.strip() for f in flags.replace("|", " ").split()}
    if "NONE" in parts:
        return False, False, False
    return (
        "ALLOW_PRAGMA" in parts,
        "ALLOW_COLUMN" in parts,
        "ALLOW_LEADING_NOT" in parts,
    )


# ------------------------------------------------------- match_columns

@dataclass
class MatchSpec:
    sections: list[tuple[str, float, str | None]]  # (column, weight, scorer override)
    scorer: str = "default"             # default | tf_idf | bm25
    escalation_threshold: int = 0       # grn_ctx match_escalation_threshold


def _split_depth0(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren depth 0 (scorer calls carry commas and
    the ``||`` combinator can join scorer calls, lib/expr.c parser)."""
    parts, depth, start, i = [], 0, 0, 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and s.startswith(sep, i):
            parts.append(s[start:i])
            i += len(sep)
            start = i
            continue
        i += 1
    parts.append(s[start:])
    return parts


def _parse_scorer_call(part: str) -> tuple[str, str] | None:
    """``scorer_xxx(col, args...)`` → (column-expr, scorer tag), or
    None if ``part`` is not a scorer call (grn_scorer lookup on the
    match_columns function form, lib/expr.c:6103)."""
    m = re.match(r"^(\w+)\((.*)\)$", part, re.S)
    if not m:
        return None
    name, inner = m.group(1), m.group(2)
    args = [a.strip() for a in _split_depth0(inner, ",")]
    if name == "scorer_tf_at_most" and len(args) == 2:
        # scorer_tf_at_most(col, max) — lib/scorers.c:54-88
        return args[0], f"tf_at_most:{float(args[1])}"
    if name in ("scorer_tf_idf", "scorer_bm25", "bm25"):
        return args[0], ("tf_idf" if name == "scorer_tf_idf" else "bm25")
    # registered custom scorers are callable by name, with or without
    # the conventional scorer_ prefix (grn_scorer_register names are
    # used verbatim in match_columns, scorer.h:86)
    from .search import CUSTOM_SCORERS

    stripped = name[len("scorer_"):] if name.startswith("scorer_") else name
    if name in CUSTOM_SCORERS:
        return args[0], name
    if stripped in CUSTOM_SCORERS:
        return args[0], stripped
    return None


def parse_match_columns(spec: str) -> MatchSpec:
    """``colA * 2 || scorer_tf_at_most(colB, 3.0) * 10 || ...`` — each
    ``||`` branch is a column (or index-column accessor) with an
    optional weight and an optional per-branch scorer function
    (match_columns expression, lib/expr.c:6050-6160)."""
    sections: list[tuple[str, float, str | None]] = []
    scorers_seen: set[str] = set()
    for part in _split_depth0(spec.strip(), "||"):
        part = part.strip()
        if not part:
            continue
        weight = 1.0
        # the weight multiplier binds to the whole branch: depth-0 '*'
        star = _split_depth0(part, "*")
        if len(star) > 1 and re.fullmatch(r"\s*-?\d+(\.\d+)?\s*", star[-1]):
            weight = float(star[-1])
            part = "*".join(star[:-1]).strip()
        sec_scorer: str | None = None
        call = _parse_scorer_call(part)
        if call is not None:
            part, sec_scorer = call
            scorers_seen.add(sec_scorer)
        sections.append((part, weight, sec_scorer))
    if not sections:
        raise QueryParseError(f"empty match_columns: {spec!r}")
    # a single scorer across every branch also sets the spec-level
    # scorer (back-compat for phrase/near paths that read spec.scorer)
    scorer = scorers_seen.pop() if len(scorers_seen) == 1 and all(
        s is not None for _, _, s in sections
    ) else "default"
    return MatchSpec(sections, scorer)
