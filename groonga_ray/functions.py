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


def snippet_html(
    texts: pa.Array, keywords: list[str], width: int = 200, max_results: int = 3
) -> pa.Array:
    """KWIC snippets with <span class="keyword"> tags (lib/proc.c:4905,
    engine lib/snip.c): per document, up to ``max_results`` windows of
    ``width`` chars centred on keyword hits, keywords highlighted."""
    pats = [re.compile(re.escape(k), re.IGNORECASE) for k in keywords]
    out = []
    for t in texts.to_pylist():
        if t is None:
            out.append(None)
            continue
        snips = []
        for p in pats:
            for m in p.finditer(t):
                if len(snips) >= max_results:
                    break
                a = max(0, m.start() - width // 2)
                b = min(len(t), m.end() + width // 2)
                frag = t[a:b]
                for q in pats:
                    frag = q.sub(lambda mm: f'<span class="keyword">{mm.group(0)}</span>', frag)
                snips.append(frag)
            if len(snips) >= max_results:
                break
        out.append(snips)
    return pa.array(out, type=pa.list_(pa.string()))


def highlight_html(texts: pa.Array, keywords: list[str]) -> pa.Array:
    """highlight_html (lib/proc.c:5961): whole text with keywords
    wrapped, HTML-escaped first."""
    pats = [re.compile(re.escape(k), re.IGNORECASE) for k in keywords]
    out = []
    for t in texts.to_pylist():
        if t is None:
            out.append(None)
            continue
        s = t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        for p in pats:
            s = p.sub(lambda m: f'<span class="keyword">{m.group(0)}</span>', s)
        out.append(s)
    return pa.array(out, type=pa.string())


_TAG = re.compile(r"<[^>]*>")


def html_untag(texts: pa.Array) -> pa.Array:
    """html_untag (lib/proc.c:5294): strip tags, vectorized via
    replace_substring_regex."""
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
