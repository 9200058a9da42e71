"""Text-analysis operators: token counts, vocabulary stats, quality
scoring, language-ID heuristic, rolling-hash fingerprints.

All are single ``map_batches`` stages (stateless or actor-pool),
vectorized via the byte-level WordTokenizer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..tokenize import WordTokenizer
from ..utils import fnv1a

STOPWORDS = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}


class TokenStats:
    """(doc_id, n_tokens, n_uniq, n_chars) per document."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col).cast(pa.large_string())
        tb = self.wt.tokenize_column(col)
        n = batch.num_rows
        # unique terms per row: sort (row, term_hash) and count distinct
        th = fnv1a(tb.terms)
        order = np.lexsort((th, tb.row_idx))
        r, h = tb.row_idx[order], th[order]
        new = np.concatenate([[True], (r[1:] != r[:-1]) | (h[1:] != h[:-1])]) if len(r) else np.array([], bool)
        uniq = np.bincount(r[new], minlength=n) if len(r) else np.zeros(n, np.int64)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_tokens": pa.array(tb.n_tokens_per_row.astype(np.int64)),
                "n_uniq": pa.array(uniq.astype(np.int64)),
                "n_chars": pc.utf8_length(col).cast(pa.int64()),
            }
        )


class QualityScore:
    """Heuristic quality signals (doc_id, stop_ratio, mean_word_len,
    alpha_ratio) — the usual pre-training corpus filters."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()
        self.stop = STOPWORDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col).cast(pa.large_string())
        tb = self.wt.tokenize_column(col)
        n = batch.num_rows
        n_tok = len(tb.row_idx)
        is_stop = (
            pc.is_in(tb.terms, value_set=pa.array(sorted(self.stop))).to_numpy(
                zero_copy_only=False
            )
            if n_tok
            else np.zeros(0, bool)
        )
        stop_cnt = np.bincount(tb.row_idx[is_stop], minlength=n) if n_tok else np.zeros(n)
        tok_cnt = np.maximum(tb.n_tokens_per_row, 1)
        word_chars = np.zeros(n, np.int64)
        lens = pc.utf8_length(tb.terms).to_numpy(zero_copy_only=False) if n_tok else np.array([], np.int64)
        np.add.at(word_chars, tb.row_idx, lens)
        total_chars = np.maximum(pc.utf8_length(col).to_numpy(zero_copy_only=False), 1)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "stop_ratio": pa.array(stop_cnt / tok_cnt, pa.float64()),
                "mean_word_len": pa.array(word_chars / tok_cnt, pa.float64()),
                "alpha_ratio": pa.array(word_chars / total_chars, pa.float64()),
            }
        )


class LangId:
    """Tiny n-gram/stopword language heuristic (en/de/fr/es markers) —
    a stand-in for a real model; deterministic and vectorizable."""

    MARKERS = {
        "en": {"the", "and", "of", "is"},
        "de": {"der", "und", "die", "ist"},
        "fr": {"le", "et", "les", "est"},
        "es": {"el", "y", "los", "es"},
    }

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tb = self.wt.tokenize_column(batch.column(self.text_col).cast(pa.large_string()))
        scores = {lang: np.zeros(n) for lang in self.MARKERS}
        for lang, marks in self.MARKERS.items():
            hit = pc.is_in(tb.terms, value_set=pa.array(sorted(marks))).to_numpy(
                zero_copy_only=False
            ) if len(tb.row_idx) else np.zeros(0, bool)
            if hit.any():
                np.add.at(scores[lang], tb.row_idx[hit], 1)
        langs = list(self.MARKERS)
        mat = np.stack([scores[l] for l in langs], axis=1)
        best = mat.argmax(axis=1)
        pred = np.where(mat.max(axis=1) > 0, np.array(langs, object)[best], "und")
        return pa.table(
            {self.id_col: batch.column(self.id_col), "lang_pred": pa.array(pred.tolist())}
        )


class Fingerprint:
    """64-bit rolling-hash document fingerprint (order-sensitive, unlike
    SimHash) — content-defined dedup keys."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tb = self.wt.tokenize_column(batch.column(self.text_col).cast(pa.large_string()))
        h = fnv1a(tb.terms)
        n = batch.num_rows
        # order-sensitive polynomial fingerprint, fully vectorized:
        # fp(row) = sum_i h_i * P^{pos_i}  (mod 2^64) — position-weighted,
        # so permutations change the value (unlike SimHash)
        P = np.uint64(1099511628211)
        max_pos = int(tb.positions.max()) + 1 if len(tb.positions) else 1
        powers = np.empty(max_pos, np.uint64)
        powers[0] = np.uint64(1)
        for j in range(1, max_pos):  # O(max doc length), not O(total tokens)
            powers[j] = powers[j - 1] * P
        contrib = h * powers[tb.positions]
        out = np.zeros(n, np.uint64)
        np.add.at(out, tb.row_idx, contrib)
        return pa.table(
            {self.id_col: batch.column(self.id_col), "fingerprint": pa.array(out, pa.uint64())}
        )


def token_stats(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        TokenStats, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=2,
    )
