"""Unigram language-model scoring — the CCNet-style perplexity filter.

Two passes: (1) corpus term frequencies via a pre-aggregated groupby
(each batch ships its local counts, not its tokens); (2) the frequency
table is broadcast once (``ray.put``) and every document is scored
vectorized: nll = mean over tokens of -ln(count(term)/total_tokens).
Low-probability token soup (boilerplate, garbled text, wrong-language)
scores high; a threshold on ``nll`` is the usual filter.

At web scale the vocabulary table is capped (``vocab_topk`` +
``oov_logp`` for the tail); with the default (None) the scoring is
EXACT and checked against a DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..tokenize import WordTokenizer


def _round6(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


class _Scorer:
    def __init__(self, vocab_ref, total: float, oov_logp: float | None,
                 text_col: str, id_col: str):
        terms, counts = ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        self.terms = terms                      # sorted pa.Array
        self.logp = np.log(counts / total)      # aligned float64
        self.oov = oov_logp
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col).cast(pa.large_string())
        n = batch.num_rows
        tb = self.wt.tokenize_column(col)
        nll = np.zeros(n, np.float64)
        if len(tb.row_idx):
            idx = pc.index_in(tb.terms, value_set=self.terms)
            iv = idx.to_numpy(zero_copy_only=False).astype(np.float64)
            known = ~np.isnan(iv)
            tok_logp = np.full(len(iv), self.oov if self.oov is not None else 0.0)
            tok_logp[known] = self.logp[iv[known].astype(np.int64)]
            if self.oov is None and not known.all():
                raise ValueError("OOV token with exact vocab — rebuild frequencies")
            sums = np.zeros(n, np.float64)
            np.add.at(sums, tb.row_idx, -tok_logp)
            cnt = np.maximum(tb.n_tokens_per_row, 1)
            nll = sums / cnt
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "nll": pa.array(_round6(nll), pa.float64()),
            }
        )


def unigram_nll(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_topk: int | None = None,
    oov_logp: float | None = None,
    max_exact_vocab: int = 2_000_000,
) -> "ray.data.Dataset":
    """(id, nll) — per-document mean unigram negative log-likelihood
    under the corpus's own unigram distribution (0.0 for empty docs).

    Exact mode (``vocab_topk=None``) broadcasts the FULL corpus
    vocabulary; ``max_exact_vocab`` guards it — above the cap this
    raises with a pointer to ``vocab_topk=`` (the capped web-scale
    path), the same fail-loud contract as
    :func:`groonga_ray.docids.compute_rank_mapping`. The vocabulary is
    counted against the cap from the materialized aggregate (object
    store, spillable) BEFORE anything is pulled to the driver."""
    from ray.data.aggregate import Sum

    wt = WordTokenizer()

    def local_counts(batch: pa.Table) -> pa.Table:
        tb = wt.tokenize_column(batch.column(text_col).cast(pa.large_string()))
        if len(tb.row_idx) == 0:
            return pa.schema([("term", pa.large_string()), ("c", pa.int64())]).empty_table()
        terms = tb.terms.combine_chunks() if isinstance(tb.terms, pa.ChunkedArray) else tb.terms
        enc = pc.dictionary_encode(terms)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {"term": enc.dictionary, "c": pa.array(counts.astype(np.int64), pa.int64())}
        )

    freq_ds = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    if vocab_topk is None:
        n_vocab = freq_ds.count()
        if n_vocab > max_exact_vocab:
            raise ValueError(
                f"exact unigram vocabulary has {n_vocab} terms "
                f"(max_exact_vocab={max_exact_vocab}); pass vocab_topk= "
                "(+ oov_logp) for the capped web-scale path"
            )
    if vocab_topk is not None:
        # capped path: total + top-k both computed in the cluster; the
        # driver only ever holds vocab_topk rows
        total = float(freq_ds.sum("c") or 0.0)
        freq = (
            freq_ds.sort(["c", "term"], descending=[True, False])
            .limit(vocab_topk)
            .take_all()
        )
        if oov_logp is None and total > 0:
            oov_logp = float(np.log(1.0 / total))  # floor for the tail
        terms = sorted(r["term"] for r in freq)
        cmap = {r["term"]: r["c"] for r in freq}
        counts = np.array([cmap[t] for t in terms], np.float64)
    else:
        freq = freq_ds.take_all()
        terms = sorted(r["term"] for r in freq)
        cmap = {r["term"]: r["c"] for r in freq}
        counts = np.array([cmap[t] for t in terms], np.float64)
        total = float(counts.sum())  # floor for the tail
    ref = ray.put((pa.array(terms, pa.large_string()), counts))
    conc = max(2, min(8, int(ray.cluster_resources().get("CPU", 4)) - 1))
    return ds.map_batches(
        _Scorer,
        fn_constructor_args=(ref, total, oov_logp, text_col, id_col),
        batch_format="pyarrow",
        concurrency=conc,
    )
