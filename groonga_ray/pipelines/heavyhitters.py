"""Frequent-term operators (cf. "Top-K Frequent Term Queries on
Streaming Data", ICDE'19 — PAPERS.md).

* :func:`top_terms` — EXACT corpus-wide top-k terms by frequency.
  Each batch ships its LOCAL term counts (dictionary-encode +
  bincount), one groupby-sum co-locates per-term partials, and the
  final top-k is a tiny driver heap. The exchange carries unique
  (term, count) partials — a hot term contributes one row per batch,
  never one per occurrence (same skew-safety argument as
  ngram_key_dedup). SQL-exact.
* :func:`frequent_terms_sketch` — Misra-Gries heavy hitters: bounded
  memory m counters per batch, partial sketches merged on the driver
  (merge = counter add + decrement-by-(m+1)th). Guarantees
  true_count - n/m <= est <= true_count; every term with frequency
  > n/m is present. One pass, no shuffle — the 100 TB path when the
  vocabulary itself is too large to exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..tokenize import WordTokenizer


def _local_counts(batch: pa.Table, text_col: str, wt: WordTokenizer) -> pa.Table:
    tb = wt.tokenize_column(batch.column(text_col).cast(pa.large_string()))
    if len(tb.row_idx) == 0:
        return pa.schema([("term", pa.large_string()), ("c", pa.int64())]).empty_table()
    terms = tb.terms.combine_chunks() if isinstance(tb.terms, pa.ChunkedArray) else tb.terms
    enc = pc.dictionary_encode(terms)
    counts = np.bincount(
        enc.indices.to_numpy(zero_copy_only=False), minlength=len(enc.dictionary)
    )
    return pa.table(
        {"term": enc.dictionary, "c": pa.array(counts.astype(np.int64), pa.int64())}
    )


def top_terms(
    ds: "ray.data.Dataset", k: int = 20, text_col: str = "text"
) -> pa.Table:
    """Exact top-k (term, count), ordered by count desc then term asc."""
    from ray.data.aggregate import Sum

    wt = WordTokenizer()
    agg = (
        ds.map_batches(
            lambda b: _local_counts(b, text_col, wt), batch_format="pyarrow"
        )
        .groupby("term")
        .aggregate(Sum("c", alias_name="n"))
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "term" not in batch.schema.names:
            return pa.schema([("term", pa.large_string()), ("n", pa.int64())]).empty_table()
        n = batch.column("n").to_numpy(zero_copy_only=False)
        t = batch.column("term").to_pylist()
        order = sorted(range(len(n)), key=lambda i: (-n[i], t[i]))[:k]
        return pa.table(
            {"term": pa.array([t[i] for i in order], pa.large_string()),
             "n": pa.array([int(n[i]) for i in order], pa.int64())}
        )

    # per-block top-k, then a tiny driver merge (<= k x blocks rows)
    rows = agg.map_batches(partial_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["n"], r["term"]))
    rows = rows[:k]
    return pa.table(
        {"term": pa.array([r["term"] for r in rows], pa.large_string()),
         "n": pa.array([r["n"] for r in rows], pa.int64())}
    )


def frequent_terms_sketch(
    ds: "ray.data.Dataset", m: int = 256, text_col: str = "text"
) -> pa.Table:
    """Misra-Gries sketch -> (term, est) for up to m candidate heavy
    hitters, est within n/m of the true count (one-sided under-count)."""

    wt = WordTokenizer()

    def partial(batch: pa.Table) -> pa.Table:
        counts = _local_counts(batch, text_col, wt)
        if counts.num_rows <= m:
            return counts
        # local Misra-Gries reduction to m counters: keep top-m after
        # subtracting the (m+1)-th largest count (the classic batched
        # decrement — Berinde et al.)
        c = counts.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(-c, kind="stable")
        thresh = c[order[m]]
        keep = order[:m]
        kept = (c[keep] - thresh)
        pos = kept > 0
        return pa.table(
            {"term": counts.column("term").take(pa.array(keep[pos])),
             "c": pa.array(kept[pos].astype(np.int64), pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict[str, int] = {}
    for p in parts:
        merged[p["term"]] = merged.get(p["term"], 0) + p["c"]
    if len(merged) > m:
        # merge-side decrement to m counters
        thresh = sorted(merged.values(), reverse=True)[m]
        merged = {t: c - thresh for t, c in merged.items() if c - thresh > 0}
    items = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table(
        {"term": pa.array([t for t, _ in items], pa.large_string()),
         "est": pa.array([c for _, c in items], pa.int64())}
    )
