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

from dataclasses import dataclass, field


# ------------------------------------------------------------------ AST

@dataclass
class TermNode:
    text: str
    mode: str = "match"            # match | prefix
    section: str | None = None     # col:... override


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


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

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
                right = self.parse_and()
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
            op = "and"
            c = self.peek()
            if c == "+":
                self.i += 1
            elif c == "-":
                op = "not"
                self.i += 1
            elif c == "~":
                op = "adjust"
                self.i += 1
            unit = self.parse_unit()
            if result is None:
                if op == "not":
                    # leading -term: NOT against the (implicit) whole set
                    result = NotNode(None, unit)
                elif op == "adjust":
                    result = AdjustNode(None, unit)
                else:
                    result = unit
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
        if c == '"':
            self.i += 1
            start = self.i
            while self.i < len(self.s) and self.s[self.i] != '"':
                self.i += 1
            text = self.s[start : self.i]
            if self.peek() == '"':
                self.i += 1
            return PhraseNode(text)
        # bare word or col:op-value
        start = self.i
        while self.i < len(self.s) and not self.s[self.i].isspace() and self.s[self.i] not in '()"':
            self.i += 1
        word = self.s[start : self.i]
        if not word:
            raise QueryParseError(f"expected term at {start}")
        if ":" in word:
            col, rest = word.split(":", 1)
            if rest.startswith("@"):
                return TermNode(rest[1:], "match", col)
            if rest.startswith("^"):
                return TermNode(rest[1:], "prefix", col)
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


def parse_query(s: str):
    """Parse a --query string into the boolean AST."""
    return _Parser(s).parse()


# ------------------------------------------------------- match_columns

@dataclass
class MatchSpec:
    sections: list[tuple[str, float]]   # (column, weight)
    scorer: str = "default"             # default | tf_idf | bm25


def parse_match_columns(spec: str) -> MatchSpec:
    spec = spec.strip()
    scorer = "default"
    if spec.startswith("scorer_tf_at_most(") and spec.endswith(")"):
        # scorer_tf_at_most(col, max) — lib/scorers.c:54-88
        inner = spec[len("scorer_tf_at_most(") : -1]
        cols, mx = inner.rsplit(",", 1)
        scorer = f"tf_at_most:{float(mx)}"
        spec = cols
    for name in ("scorer_tf_idf", "scorer_bm25", "bm25"):
        if spec.startswith(name + "(") and spec.endswith(")"):
            scorer = "tf_idf" if name == "scorer_tf_idf" else "bm25"
            spec = spec[len(name) + 1 : -1]
            break
    sections = []
    for part in spec.split("||"):
        part = part.strip()
        if not part:
            continue
        if "*" in part:
            col, w = part.split("*", 1)
            sections.append((col.strip(), float(w)))
        else:
            sections.append((part, 1.0))
    if not sections:
        raise QueryParseError(f"empty match_columns: {spec!r}")
    return MatchSpec(sections, scorer)
