"""End-to-end corpus curation: quality filter -> exact dedup ->
stratified domain mixing -> token budget, as ONE streaming pipeline.

This is the composition a pre-training data pipeline actually runs,
built from the repo's individual operators, with the column-pruning a
100 TB corpus demands: the FIRST map computes every per-document
scalar (quality metrics, BPE token count, 128-bit content fingerprint)
and DROPS the text column, so the dedup shuffle and join move ~40
bytes/doc instead of documents. Stages:

1. quality gate  — alpha_ratio / stop_ratio thresholds (textstats
   formulas; vectorized, no shuffle)
2. exact dedup   — survivors grouped by content fingerprint, keep the
   min doc_id (one groupby + one hash join, both over scalar rows)
3. domain mixing — deterministic md5-hash stratified sampling by a
   group column (pure function of doc_id; sample.py)
4. output        — (doc_id, group, n_bpe_tokens), ready for token
   accounting

Every stage is SQL-expressible, so the whole pipeline is checked
EXACTLY against a DuckDB oracle (gate ``curation``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..tokenize import WordTokenizer
from ..utils import fnv1a
from .sample import _id_fraction
from .textstats import BPE_PATTERN, STOPWORDS


class _Stage1:
    """quality metrics + BPE count + content fingerprint; drops text."""

    def __init__(self, text_col, id_col, group_col, min_alpha, max_stop):
        self.text_col = text_col
        self.id_col = id_col
        self.group_col = group_col
        self.min_alpha = float(min_alpha)
        self.max_stop = float(max_stop)
        self.wt = WordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col).cast(pa.large_string())
        n = batch.num_rows
        tb = self.wt.tokenize_column(col)
        n_tok = len(tb.row_idx)
        is_stop = (
            pc.is_in(tb.terms, value_set=pa.array(sorted(STOPWORDS))).to_numpy(
                zero_copy_only=False
            )
            if n_tok else np.zeros(0, bool)
        )
        stop_cnt = np.bincount(tb.row_idx[is_stop], minlength=n) if n_tok else np.zeros(n)
        tok_cnt = np.maximum(tb.n_tokens_per_row, 1)
        word_chars = np.zeros(n, np.int64)
        if n_tok:
            lens = pc.utf8_length(tb.terms).to_numpy(zero_copy_only=False)
            np.add.at(word_chars, tb.row_idx, lens)
        total_chars = np.maximum(pc.utf8_length(col).to_numpy(zero_copy_only=False), 1)
        alpha = word_chars / total_chars
        stop = stop_cnt / tok_cnt
        ok = (alpha >= self.min_alpha) & (stop <= self.max_stop)

        bpe = pc.count_substring_regex(col, BPE_PATTERN).cast(pa.int64())

        # content fingerprints are ephemeral (grouping keys for this
        # run only) — prefer the fast polars native hash like
        # dedup.exact_dedup_fast does
        def _chash(seed: int) -> np.ndarray:
            try:
                import polars as pl

                return pl.from_arrow(col).hash(seed=seed).to_numpy()
            except ImportError:
                return fnv1a(col, seed=seed)

        out = pa.table(
            {
                self.id_col: batch.column(self.id_col),
                self.group_col: batch.column(self.group_col),
                "n_bpe_tokens": bpe,
                "h_lo": pa.array(_chash(0).view(np.int64), pa.int64()),
                "h_hi": pa.array(_chash(0x9E3779B9).view(np.int64), pa.int64()),
            }
        )
        return out.filter(pa.array(ok))


def curate(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    min_alpha: float = 0.82,
    max_stop: float = 0.12,
    default_rate: float = 0.0,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Quality-filter, exact-dedup, and domain-mix a corpus.

    Returns (id_col, group_col, n_bpe_tokens) for the surviving docs.
    Deterministic end to end: quality/dedup are pure functions of
    content, sampling a pure function of (id, group).
    """
    from ray.data.aggregate import Min

    import ray as _ray

    # leave >= 1 CPU for the upstream read tasks: an actor pool that
    # claims every slot starves the reader and the plan deadlocks
    conc = max(2, min(8, int(_ray.cluster_resources().get("CPU", 4)) - 1))
    stage1 = ds.map_batches(
        _Stage1,
        fn_constructor_args=(text_col, id_col, group_col, min_alpha, max_stop),
        batch_format="pyarrow",
        concurrency=conc,
    )
    # stage1 feeds BOTH the dedup groupby and the join (a diamond);
    # materialize the pruned scalar table once: (a) the streaming
    # executor would otherwise run two instances of the actor pool and
    # deadlock on CPU slots, (b) un-materialized, the expensive
    # tokenize pass would execute twice. ~40 bytes/doc in the object
    # store (spillable) — the text column is already gone.
    stage1 = stage1.materialize()

    keep = stage1.groupby(["h_lo", "h_hi"]).aggregate(Min(id_col, alias_name="keep_id"))

    def norm_keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns < 3:
            return pa.schema(
                [("k_lo", pa.int64()), ("k_hi", pa.int64()), ("keep_id", pa.int64())]
            ).empty_table()
        return batch.rename_columns(["k_lo", "k_hi", "keep_id"])

    keep = (
        keep.map_batches(norm_keep, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    joined = stage1.join(
        keep, "inner", num_partitions, on=("h_lo", "h_hi"), right_on=("k_lo", "k_hi")
    )

    items = sorted(rates.items())

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [(id_col, pa.int64()), (group_col, pa.large_string()),
                 ("n_bpe_tokens", pa.int64())]
            ).empty_table()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        is_rep = ids == batch.column("keep_id").to_numpy(zero_copy_only=False)
        frac = _id_fraction(batch.column(id_col), "md5", "")
        g = batch.column(group_col).cast(pa.large_string()).to_numpy(zero_copy_only=False)
        rate = np.full(batch.num_rows, float(default_rate))
        for k, v in items:
            rate[g == k] = float(v)
        out = batch.select([id_col, group_col, "n_bpe_tokens"])
        return out.filter(pa.array(is_rep & (frac < rate)))

    return joined.map_batches(finish, batch_format="pyarrow")
