"""Output-column / scalar functions (SURVEY.md §2.7).

Each is a vectorized batch function over Arrow arrays; the ones the
reference exposes as selectors (between, in_values, edit_distance) are
also callable from the filter language (script.py).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .script import edit_distance_batch  # re-export (lib/proc.c:4790)

__all__ = [
    "edit_distance_batch",
    "snippet_html",
    "highlight_html",
    "html_untag",
    "rand_column",
    "now_column",
    "max_element_wise",
    "min_element_wise",
    "vector_size",
]


def _norm_map(text: str) -> tuple[str, list[int], list[int]]:
    """Per-char NFKC+lower view for keyword matching (the reference's
    snip/highlight engines run over the normalizer's output and map
    hits back through the checks array, lib/snip.c:133-248). Returns
    ``(normalized, src_start, src_end)``: normalized char i came from
    source span [src_start[i], src_end[i])."""
    import unicodedata

    chars: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for si, ch in enumerate(text):
        mapped = unicodedata.normalize("NFKC", ch).lower() or ch
        for mch in mapped:
            chars.append(mch)
            starts.append(si)
            ends.append(si + 1)
    return "".join(chars), starts, ends


def _norm_keyword(k: str) -> str:
    import unicodedata

    return "".join(unicodedata.normalize("NFKC", c).lower() for c in k)


def _keyword_spans(text: str, keywords: list[str]) -> list[tuple[int, int]]:
    """Merged source-char spans of normalized keyword occurrences."""
    norm, starts, ends = _norm_map(text)
    spans: list[tuple[int, int]] = []
    for k in keywords:
        nk = _norm_keyword(k)
        if not nk:
            continue
        at = norm.find(nk)
        while at != -1:
            spans.append((starts[at], ends[at + len(nk) - 1]))
            at = norm.find(nk, at + 1)
    spans.sort()
    merged: list[tuple[int, int]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _wrap_spans(text: str, spans: list[tuple[int, int]], offset: int = 0) -> str:
    """HTML-escape ``text`` with the given absolute source spans
    (shifted by ``offset``) wrapped in the keyword tag."""
    out: list[str] = []
    pos = 0
    for s, e in spans:
        s, e = s - offset, e - offset
        if e <= 0 or s >= len(text):
            continue
        s, e = max(0, s), min(len(text), e)
        out.append(_esc(text[pos:s]))
        out.append(f'<span class="keyword">{_esc(text[s:e])}</span>')
        pos = e
    out.append(_esc(text[pos:]))
    return "".join(out)


def _byte_hits(text: str, keywords: list[str]) -> list[list[tuple[int, int]]]:
    """Per keyword: source-BYTE spans of its occurrences in the
    NFKC+lower, blank-removed view (grn_string WITH_CHECKS +
    REMOVEBLANK is what grn_snip_exec searches over, snip.c:590)."""
    import unicodedata

    chars: list[str] = []
    bstart: list[int] = []
    bend: list[int] = []
    bpos = 0
    for ch in text:
        blen = len(ch.encode("utf-8"))
        if ch.isspace() or ch == "\x00":
            bpos += blen
            continue
        mapped = unicodedata.normalize("NFKC", ch).lower() or ch
        for mch in mapped:
            chars.append(mch)
            bstart.append(bpos)
            bend.append(bpos + blen)
        bpos += blen
    norm = "".join(chars)
    hits: list[list[tuple[int, int]]] = []
    for k in keywords:
        nk = "".join(
            c
            for ch in k
            if not (ch.isspace() or ch == "\x00")
            for c in (__import__("unicodedata").normalize("NFKC", ch).lower() or ch)
        )
        spans: list[tuple[int, int]] = []
        if nk:
            at = norm.find(nk)
            while at != -1:
                spans.append((bstart[at], bend[at + len(nk) - 1]))
                at = norm.find(nk, at + len(nk))  # BM search resumes past the hit
        hits.append(spans)
    return hits


def _snip_exec(
    text: str, hits: list[list[tuple[int, int]]], width: int, max_results: int
) -> list[tuple[int, int, list[tuple[int, int]]]]:
    """grn_snip_exec (lib/snip.c:585-745) over precomputed hit spans:
    returns [(win_start, win_end, [tag spans])] in source bytes."""
    tb = text.encode("utf-8")
    n = len(tb)
    # char boundary byte offsets (grn_snip_find_firstbyte)
    bounds = [0]
    for ch in text:
        bounds.append(bounds[-1] + len(ch.encode("utf-8")))
    import bisect

    def fwd(off):   # first char boundary >= off
        i = bisect.bisect_left(bounds, off)
        return bounds[i] if i < len(bounds) else n

    def back(off):  # last char boundary <= off
        i = bisect.bisect_right(bounds, off) - 1
        return bounds[max(0, i)]

    NONSTOP, STOP, ACROSS = 0, 1, 2
    conds = [
        {"spans": s, "i": 0, "count": 0, "flag": NONSTOP if s else STOP}
        for s in hits
    ]

    def cur(c):
        return c["spans"][c["i"]] if c["i"] < len(c["spans"]) else None

    def advance(c):
        c["i"] += 1
        if c["i"] >= len(c["spans"]):
            c["flag"] = STOP

    unfound = len(conds)
    results = []
    last_last_end = 0
    while True:
        tags: list[tuple[int, int]] = []
        found = False
        snip_start = 0
        last_tag_end = 0
        last_end = 0
        while True:
            cand = None
            for c in conds:
                h = cur(c) if c["flag"] == NONSTOP else None
                if h and (
                    cand is None
                    or h[0] < cur(cand)[0]
                    or (h[0] == cur(cand)[0] and h[1] > cur(cand)[1])
                ):
                    cand = c
            if cand is None:
                break
            h = cur(cand)
            if not tags:
                if max_results - len(results) <= unfound and cand["count"] > 0:
                    exclude = all(
                        not (
                            c is not cand and c["flag"] != STOP and cur(c)
                            and cur(c)[1] <= h[0] + width and c["count"] == 0
                        )
                        for c in conds
                    )
                    if exclude:
                        advance(cand)
                        continue
                snip_start = h[0]
            else:
                if h[0] >= snip_start + width:
                    break
                if h[0] < last_tag_end:
                    advance(cand)
                    continue
            if h[1] > snip_start + width:
                cand["flag"] = ACROSS
                advance(cand)
            else:
                found = True
                if cand["count"] == 0:
                    unfound -= 1
                cand["count"] += 1
                last_end = h[1]
                tags.append(h)
                last_tag_end = h[1]
                advance(cand)
        if not found:
            break
        if snip_start + last_end < width:
            start = 0
        else:
            start = max(min((snip_start + last_end - width) // 2, n - width), last_last_end)
        start = fwd(start)
        end = start + width
        end = back(end) if end < n else n
        last_last_end = end
        results.append((start, end, tags))
        if len(results) == max_results:
            break
        for c in conds:
            if c["flag"] == ACROSS:
                c["flag"] = NONSTOP if cur(c) else STOP
        if all(c["flag"] == STOP for c in conds):
            break
    return results


def snippet_html(
    texts: pa.Array, keywords: list[str], width: int = 200, max_results: int = 3
) -> pa.Array:
    """snippet_html (lib/proc.c:4905, engine lib/snip.c): per document,
    up to 3 windows of 200 source BYTES (char-boundary snapped) chosen
    by grn_snip_exec's sweep, keyword hits wrapped, null when nothing
    matched. Matching is over the NFKC+lower blank-removed view with
    offsets mapped back to the source (WITH_CHECKS model)."""
    out = []
    for t in texts.to_pylist():
        if t is None:
            out.append(None)
            continue
        wins = _snip_exec(t, _byte_hits(t, keywords), width, max_results)
        if not wins:
            out.append(None)
            continue
        tb = t.encode("utf-8")
        snips = []
        for s, e, tags in wins:
            frag = tb[s:e].decode("utf-8")
            ctags = [
                (len(tb[s:ts].decode("utf-8")), len(tb[s:te].decode("utf-8")))
                for ts, te in tags
                if ts >= s and te <= e
            ]
            snips.append(_wrap_spans(frag, ctags))
        out.append(snips)
    return pa.array(out, type=pa.list_(pa.string()))


def highlight_html(texts: pa.Array, keywords: list[str]) -> pa.Array:
    """highlight_html (lib/proc.c:5961): whole text HTML-escaped with
    all (normalization-aware) keyword occurrences wrapped."""
    out = []
    for t in texts.to_pylist():
        if t is None:
            out.append(None)
            continue
        out.append(_wrap_spans(t, _keyword_spans(t, keywords)))
    return pa.array(out, type=pa.string())


def parse_call_args(argstr: str) -> list[tuple[str, object]]:
    """Split a function-call argument string on top-level commas and
    classify each: ('str', unescaped) | ('bool', b) | ('num', n) |
    ('ident', name)."""
    parts: list[str] = []
    depth = 0
    quote = None
    cur: list[str] = []
    i = 0
    while i < len(argstr):
        ch = argstr[i]
        if quote:
            cur.append(ch)
            if ch == "\\" and i + 1 < len(argstr):
                cur.append(argstr[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    out: list[tuple[str, object]] = []
    for p in parts:
        if not p:
            continue
        if p[0] in "'\"" and p[-1] == p[0] and len(p) >= 2:
            body = p[1:-1]
            unesc: list[str] = []
            j = 0
            while j < len(body):
                if body[j] == "\\" and j + 1 < len(body):
                    unesc.append(body[j + 1])
                    j += 2
                else:
                    unesc.append(body[j])
                    j += 1
            out.append(("str", "".join(unesc)))
        elif p in ("true", "false"):
            out.append(("bool", p == "true"))
        else:
            try:
                out.append(("num", float(p) if "." in p else int(p)))
            except ValueError:
                out.append(("ident", p))
    return out


def highlight_full(
    texts: pa.Array,
    normalizer: str,
    use_html_escape: bool,
    keyword_specs: list[tuple[str, str, str]],
) -> pa.Array:
    """highlight_full (lib/proc.c:5684-5960): per-keyword open/close
    tags, optional HTML escaping of the untagged text, keyword matching
    through the named normalizer (empty = exact bytes). Leftmost-
    longest, non-overlapping."""
    specs = sorted(
        range(len(keyword_specs)),
        key=lambda i: -len(keyword_specs[i][0]),
    )
    out = []
    for t in texts.to_pylist():
        if t is None:
            out.append(None)
            continue
        if normalizer:
            norm, starts, ends = _norm_map(t)
            nkws = [_norm_keyword(keyword_specs[i][0]) for i in range(len(keyword_specs))]
        else:
            norm = t
            starts = list(range(len(t)))
            ends = list(range(1, len(t) + 1))
            nkws = [k for k, _, _ in keyword_specs]
        spans: list[tuple[int, int, int]] = []
        i = 0
        n = len(norm)
        while i < n:
            hit = None
            for ki in specs:
                nk = nkws[ki]
                if nk and norm.startswith(nk, i):
                    hit = (ki, len(nk))
                    break
            if hit:
                ki, ln = hit
                spans.append((starts[i], ends[i + ln - 1], ki))
                i += ln
            else:
                i += 1
        esc = _esc if use_html_escape else (lambda s: s)
        parts: list[str] = []
        pos = 0
        for s, e, ki in spans:
            parts.append(esc(t[pos:s]))
            _, open_tag, close_tag = keyword_specs[ki]
            parts.append(open_tag + esc(t[s:e]) + close_tag)
            pos = e
        parts.append(esc(t[pos:]))
        out.append("".join(parts))
    return pa.array(out, type=pa.string())


_TAG = re.compile(r"<[^>]*>")


def html_untag(texts: pa.Array) -> pa.Array:
    """html_untag (lib/proc.c:5294): strip tags, vectorized via
    replace_substring_regex; non-text operands are cast to text first
    (grn_obj_cast semantics for scalar types)."""
    t = getattr(texts, "type", None)
    if t is not None and not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        texts = texts.cast(pa.string())
    return pc.replace_substring_regex(texts, pattern=_TAG.pattern, replacement="")


def rand_column(n: int, max_value: int | None = None, seed: int = 42) -> pa.Array:
    """rand() (lib/proc.c:4368) — test-seeded for determinism."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, max_value if max_value else 2**31 - 1, size=n)
    return pa.array(vals, pa.int64())


def now_column(n: int, at: int | None = None) -> pa.Array:
    """now() (lib/proc.c:4385) — Time is int64 microseconds
    (GRN_TIME_PACK, groonga.h:1513); pass ``at`` for determinism."""
    import time as _time

    t = at if at is not None else int(_time.time() * 1_000_000)
    return pa.array(np.full(n, t, np.int64), pa.timestamp("us"))


def max_element_wise(*cols) -> pa.Array:
    return pc.max_element_wise(*cols)


def min_element_wise(*cols) -> pa.Array:
    return pc.min_element_wise(*cols)


def vector_size(col: pa.Array) -> pa.Array:
    """vector_size (plugins/functions/vector.c:80)."""
    return pc.list_value_length(col)


# ------------------------------------------------------------ registry

CUSTOM_FUNCTIONS: dict[str, object] = {}


def register_function(name: str, fn) -> None:
    """Plugin surface (grn_proc_create PROC_FUNCTION,
    include/groonga/groonga.h:486): ``fn(*evaluated_args) -> Arrow
    array/scalar`` becomes callable from --filter / --scorer script
    expressions by name."""
    CUSTOM_FUNCTIONS[name] = fn
