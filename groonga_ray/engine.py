"""The ``select`` surface: query → match → score → sort/limit →
projection → drilldown, mirroring grn_select's stage order
(lib/proc.c:876-1195, parameter surface proc.c:6758-6783).

An :class:`IndexedTable` bundles a built index with its document store
(the source Parquet files). Query evaluation happens driver-side over
decoded posting arrays (the result-set scale is top-k / matched docs,
not the corpus); document fetch and drilldowns column-prune the source
Parquet. Batch query evaluation over a query *table* is
:func:`run_query_batch` — an actor-pool map_batches where each actor
holds the IndexReader once (the stateful-stage pattern).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import codec, score as score_mod
from .index import IndexReader, open_index
from .qlang import (
    AdjustNode,
    AndNode,
    MatchSpec,
    NotNode,
    OrNode,
    PhraseNode,
    RangeNode,
    TermNode,
    parse_match_columns,
    parse_query,
)
from .search import (
    MatchResult,
    op_adjust,
    op_and,
    op_and_not,
    op_or,
    term_match,
    top_k,
)
from .tokenize import WordTokenizer


@dataclass
class IndexedTable:
    index_dir: str
    source_files: list[str]
    docid_column: str | None = None   # None -> docid = 1-based rank in file order

    def reader(self) -> IndexReader:
        return open_index(self.index_dir)


# ------------------------------------------------------------- match eval

def _eval_match_node(node, reader: IndexReader, spec: MatchSpec) -> MatchResult:
    """One term/phrase node across all match sections, scores summed
    (WITH_SECTION accumulation, lib/db.c:2136-2158)."""
    results = []
    for col, weight in spec.sections:
        if isinstance(node, (TermNode, PhraseNode)) and getattr(node, "section", None):
            if node.section != col:
                continue
        si = reader.section(col)
        kw = dict(
            n_docs=reader.n_docs,
            avgdl=reader.avgdl(col),
            doclens=reader.doclens(col),
            weight=weight,
        )
        if isinstance(node, TermNode):
            tokens = _query_tokens(node.text)
            if not tokens:
                continue
            m = term_match(
                reader.section(col), tokens, spec.scorer,
                prefix_last=(node.mode == "prefix"), **kw,
            )
        else:  # PhraseNode
            tokens = _query_tokens(node.text)
            if not tokens:
                continue
            m = term_match(reader.section(col), tokens, spec.scorer, **kw)
        results.append(m)
    # explicit col: override searched a section not in match_columns
    if isinstance(node, (TermNode, PhraseNode)) and getattr(node, "section", None):
        sec = node.section
        if sec in reader.sections and all(c != sec for c, _ in spec.sections):
            si = reader.section(sec)
            kw = dict(
                n_docs=reader.n_docs, avgdl=reader.avgdl(sec),
                doclens=reader.doclens(sec), weight=1.0,
            )
            tokens = _query_tokens(node.text)
            m = term_match(
                si, tokens, spec.scorer,
                prefix_last=(isinstance(node, TermNode) and node.mode == "prefix"),
                **kw,
            )
            results.append(m)
    if not results:
        return MatchResult.empty()
    acc = results[0]
    for m in results[1:]:
        acc = op_or(acc, m)
    return acc


_WT = WordTokenizer()


def _query_tokens(text: str) -> list[tuple[str, int]]:
    """GET-mode tokenization of query text (word tokenizer)."""
    return [(t, i) for i, t in enumerate(_WT.tokenize_text(text))]


def _eval_node(node, reader, spec, table: "IndexedTable") -> MatchResult:
    if isinstance(node, (TermNode, PhraseNode)):
        return _eval_match_node(node, reader, spec)
    if isinstance(node, AndNode):
        parts = [_eval_node(c, reader, spec, table) for c in node.children]
        parts.sort(key=lambda m: m.nhits)
        acc = parts[0]
        for m in parts[1:]:
            acc = op_and(acc, m)
        return acc
    if isinstance(node, OrNode):
        acc = MatchResult.empty()
        for c in node.children:
            acc = op_or(acc, _eval_node(c, reader, spec, table))
        return acc
    if isinstance(node, NotNode):
        neg = _eval_node(node.negative, reader, spec, table)
        if node.positive is None:
            pos = _all_docs(reader)
        else:
            pos = _eval_node(node.positive, reader, spec, table)
        return op_and_not(pos, neg)
    if isinstance(node, AdjustNode):
        adj = _eval_node(node.adjust, reader, spec, table)
        if node.base is None:
            return adj
        base = _eval_node(node.base, reader, spec, table)
        return op_adjust(base, adj)
    if isinstance(node, RangeNode):
        return _range_filter(node, reader, table)
    raise TypeError(f"unknown node {node!r}")


def _all_docs(reader: IndexReader) -> MatchResult:
    dl = reader.doclens()
    docids = np.flatnonzero(dl > 0).astype(np.uint64)
    # docs with zero tokens still exist; include all known docids
    return MatchResult(docids, np.zeros(len(docids), np.float64))


def _range_filter(node: RangeNode, reader: IndexReader, table: "IndexedTable") -> MatchResult:
    """Scalar-column predicate evaluated against the doc store
    (sequential fallback, grn_table_select_sequential analogue)."""
    tbl = _read_source(table, [c for c in (table.docid_column, node.column) if c])
    col = tbl.column(node.column)
    try:
        value: object = float(node.value)
        if float(node.value).is_integer() and "." not in node.value:
            value = int(node.value)
    except ValueError:
        value = node.value
    fn = {
        "<": pc.less, ">": pc.greater, "<=": pc.less_equal,
        ">=": pc.greater_equal, "==": pc.equal, "!=": pc.not_equal,
    }[node.op]
    mask = fn(col, pa.scalar(value)).to_numpy(zero_copy_only=False)
    docids = _source_docids(table, tbl)[mask]
    order = np.argsort(docids)
    return MatchResult(docids[order].astype(np.uint64), np.zeros(int(mask.sum()), np.float64))


# ------------------------------------------------------------- doc store

def _read_source(table: IndexedTable, columns: list[str] | None = None) -> pa.Table:
    cols = None
    if columns:
        cols = sorted(set(columns))
    parts = [pq.read_table(f, columns=cols) for f in sorted(table.source_files)]
    return pa.concat_tables(parts)


def _source_docids(table: IndexedTable, tbl: pa.Table) -> np.ndarray:
    if table.docid_column:
        return tbl.column(table.docid_column).to_numpy(zero_copy_only=False).astype(np.uint64)
    return np.arange(1, tbl.num_rows + 1, dtype=np.uint64)


def fetch_docs(table: IndexedTable, docids: np.ndarray, columns: list[str]) -> pa.Table:
    """Fetch document rows by docid, column-pruned, preserving the
    order of ``docids``."""
    need = [c for c in columns if c != "_id" and c != "_score"]
    src_cols = need + ([table.docid_column] if table.docid_column else [])
    tbl = _read_source(table, src_cols or None)
    all_ids = _source_docids(table, tbl)
    # positional lookup: docid -> row
    order = np.argsort(all_ids)
    pos = order[np.searchsorted(all_ids[order], docids)]
    return tbl.take(pa.array(pos)).select(need) if need else pa.table({})


# ------------------------------------------------------------------ select

def select(
    table: IndexedTable,
    query: str | None = None,
    match_columns: str | None = None,
    scorer: str | None = None,
    sortby: str = "-_score",
    output_columns: tuple[str, ...] = ("_id", "_score"),
    offset: int = 0,
    limit: int = 10,
    drilldown: str | None = None,
    drilldown_limit: int = 10,
) -> dict:
    """Returns {"hits": int, "rows": pa.Table, "drilldown": pa.Table?}.

    ``limit=-1`` returns all rows (the reference's negative-limit wrap,
    lib/util.c:37-80).
    """
    reader = table.reader()
    spec = parse_match_columns(match_columns) if match_columns else MatchSpec(
        [(reader.meta["sections"][0], 1.0)]
    )
    if scorer:
        spec.scorer = scorer

    if query:
        ast = parse_query(query)
        result = _eval_node(ast, reader, spec, table)
    else:
        result = _all_docs(reader)

    nhits = result.nhits
    if limit < 0:
        limit = nhits
    # ---- sort
    if sortby in ("-_score", ""):
        docids, scores = top_k(result, limit, offset)
    elif sortby == "_id":
        order = np.argsort(result.docids)[offset : offset + limit]
        docids, scores = result.docids[order], result.scores[order]
    elif sortby == "-_id":
        order = np.argsort(result.docids)[::-1][offset : offset + limit]
        docids, scores = result.docids[order], result.scores[order]
    else:
        # column sort spec "-col, col2" — fetch keys then lexsort
        keys = [k.strip() for k in sortby.split(",")]
        cols = [k.lstrip("+-") for k in keys]
        doc_tbl = fetch_docs(table, result.docids, cols)
        sort_keys = [
            (c, "descending" if k.startswith("-") else "ascending")
            for k, c in zip(keys, cols)
        ]
        order = pc.sort_indices(doc_tbl, sort_keys=sort_keys).to_numpy()[
            offset : offset + limit
        ]
        docids, scores = result.docids[order], result.scores[order]

    # ---- projection
    out: dict[str, pa.Array] = {}
    doc_cols = [c for c in output_columns if c not in ("_id", "_score", "_score_int")]
    fetched = fetch_docs(table, docids, doc_cols) if doc_cols else None
    for c in output_columns:
        if c == "_id":
            out["_id"] = pa.array(docids, pa.uint64())
        elif c == "_score":
            out["_score"] = pa.array(scores, pa.float64())
        elif c == "_score_int":
            out["_score_int"] = pa.array(score_mod.score_int32(scores), pa.int32())
        else:
            out[c] = fetched.column(c)
    rows = pa.table(out)

    result_dict = {"hits": nhits, "rows": rows}
    if drilldown:
        # group the FULL result set by a doc column (grn_table_group)
        dd_tbl = fetch_docs(table, result.docids, [drilldown])
        grouped = (
            dd_tbl.append_column("_one", pa.array(np.ones(dd_tbl.num_rows, np.int64)))
            .group_by(drilldown)
            .aggregate([("_one", "sum")])
            .rename_columns([drilldown, "_nsubrecs"])
        )
        order = pc.sort_indices(
            grouped, sort_keys=[("_nsubrecs", "descending"), (drilldown, "ascending")]
        )
        result_dict["drilldown"] = grouped.take(order).slice(0, drilldown_limit)
    return result_dict


# ------------------------------------------------------------- token dump

def dump_tokens(index_dir: str, section: str):
    """The whole index exploded back to (docid, term, pos) rows — a Ray
    Dataset pipeline over the posting files (used by the conformance
    gate: must equal the SQL tokenization of the source)."""
    import ray.data

    files = sorted(
        glob.glob(os.path.join(index_dir, f"sec={section}", "postings", "bucket=*", "part.parquet"))
    )

    def explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.large_string()),
                 "pos": pa.array([], pa.int64())}
            )
        order = np.arange(batch.num_rows)
        docids, tfs, positions, row_offsets = codec.bulk_decode_rows(
            batch, order, with_positions=True
        )
        tf64 = tfs.astype(np.int64)
        terms = batch.column("term")
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        df = np.diff(row_offsets)
        term_per_posting = np.repeat(np.arange(batch.num_rows), df)
        term_per_token = term_per_posting.repeat(tf64)
        doc_per_token = np.repeat(docids, tf64)
        return pa.table(
            {
                "doc_id": pa.array(doc_per_token.astype(np.int64)),
                "term": terms.take(pa.array(term_per_token)),
                "pos": pa.array(positions.astype(np.int64) + 1),  # 1-based for SQL parity
            }
        )

    return ray.data.read_parquet(files, partitioning=None).map_batches(
        explode, batch_format="pyarrow"
    )
