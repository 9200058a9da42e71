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
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
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


def _round6(x: np.ndarray) -> np.ndarray:
    """Round half away from zero at 6 decimals (DuckDB round()
    semantics; np.round is banker's and differs on exact halves)."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


class RepetitionStats:
    """Gopher-style repetition filters (Rae et al. 2021, table A1):
    per-document duplicate-line fraction, duplicate-line character
    fraction, and top word-n-gram character fractions (n=2,3,4).

    Definitions (shared exactly with the SQL oracle):

    * ``dup_line_frac``       = 1 - distinct_lines / total_lines
      (lines split on '\\n', empty lines count)
    * ``dup_line_char_frac``  = 1 - distinct_line_chars / line_chars
      (0.0 when no line has characters)
    * ``top{n}gram_char_frac`` = min(1, c* x len(g*) / max(len(text), 1))
      where g* is the most frequent space-joined n-gram of word tokens
      (ties broken by lexicographically smallest gram) occurring c*
      times; clamped because overlapping occurrences can overshoot.

    Fully vectorized: dictionary-encoded line/gram values, run-length
    counting over one lexsort per statistic, lexicographic tie-break
    via an Arrow sort of the dictionary (no Python string compares).
    """

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()

    @staticmethod
    def _dup_frac(row_idx, codes, lens, n_rows):
        """Per-row (1 - distinct/total) for counts and char lengths."""
        total = np.bincount(row_idx, minlength=n_rows).astype(np.float64)
        chars = np.zeros(n_rows, np.int64)
        np.add.at(chars, row_idx, lens)
        order = np.lexsort((codes, row_idx))
        r, c, ln = row_idx[order], codes[order], lens[order]
        first = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])]) if len(r) else np.zeros(0, bool)
        uniq = np.bincount(r[first], minlength=n_rows).astype(np.float64)
        uchars = np.zeros(n_rows, np.int64)
        np.add.at(uchars, r[first], ln[first])
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(total > 0, 1.0 - uniq / np.maximum(total, 1), 0.0)
            cfrac = np.where(chars > 0, 1.0 - uchars / np.maximum(chars, 1), 0.0)
        return frac, cfrac

    @staticmethod
    def _top_gram_frac(row_idx, grams: pa.Array, text_lens, n_rows):
        """c* x len(g*) / max(len(text),1); ties -> smallest gram."""
        out = np.zeros(n_rows, np.float64)
        if len(grams) == 0:
            return out
        enc = pc.dictionary_encode(grams)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary
        # lexicographic rank of each dictionary value (Arrow C++ sort)
        sort_idx = pc.sort_indices(dictionary).to_numpy(zero_copy_only=False)
        rank = np.empty(len(dictionary), np.int64)
        rank[sort_idx] = np.arange(len(dictionary))
        glens = pc.utf8_length(dictionary).to_numpy(zero_copy_only=False)

        order = np.lexsort((codes, row_idx))
        r, c = row_idx[order], codes[order]
        first = np.concatenate([[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(r)))
        gr, gc = r[first], c[first]
        # argmax per row by (count desc, lex rank asc)
        sel = np.lexsort((rank[gc], -counts, gr))
        row_first = np.concatenate([[True], gr[sel][1:] != gr[sel][:-1]])
        best = sel[row_first]
        rows = gr[best]
        # overlapping occurrences can overshoot the text length; clamp
        # (the SQL oracle applies the same LEAST(1.0, ...))
        out[rows] = np.minimum(
            1.0, counts[best] * glens[gc[best]] / np.maximum(text_lens[rows], 1)
        )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col).cast(pa.large_string())
        n = batch.num_rows
        text_lens = pc.utf8_length(col).to_numpy(zero_copy_only=False)

        # ---- lines
        lines = pc.split_pattern(col, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        sizes = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lines)
        line_rows = np.repeat(np.arange(n), sizes)
        enc = pc.dictionary_encode(flat)
        lcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        llens = pc.utf8_length(enc.dictionary).to_numpy(zero_copy_only=False)[lcodes]
        dup_line, dup_line_char = self._dup_frac(line_rows, lcodes, llens, n)

        # ---- word n-grams
        tb = self.wt.tokenize_column(col)
        terms = tb.terms.combine_chunks() if isinstance(tb.terms, pa.ChunkedArray) else tb.terms
        fracs = {}
        for gn in (2, 3, 4):
            if len(terms) >= gn:
                parts = [terms.slice(k, len(terms) - gn + 1) for k in range(gn)]
                grams = pc.binary_join_element_wise(
                    *parts, pa.scalar(" ", pa.large_string())
                )
                ok = tb.row_idx[: len(grams)] == tb.row_idx[gn - 1 :]
                grams = grams.filter(pa.array(ok))
                gram_rows = tb.row_idx[: len(ok)][ok]
            else:
                grams = pa.array([], pa.large_string())
                gram_rows = np.empty(0, np.int64)
            fracs[gn] = self._top_gram_frac(gram_rows, grams, text_lens, n)

        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "dup_line_frac": pa.array(_round6(dup_line), pa.float64()),
                "dup_line_char_frac": pa.array(_round6(dup_line_char), pa.float64()),
                "top2gram_char_frac": pa.array(_round6(fracs[2]), pa.float64()),
                "top3gram_char_frac": pa.array(_round6(fracs[3]), pa.float64()),
                "top4gram_char_frac": pa.array(_round6(fracs[4]), pa.float64()),
            }
        )


def repetition_stats(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        RepetitionStats, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=2,
    )


# GPT-2-style pre-tokenizer pattern, RE2-compatible (no lookaheads, so
# the same pattern runs in Arrow's count_substring_regex AND DuckDB's
# regexp_extract_all — both RE2): contractions, space-prefixed letter /
# digit / punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


class BpeTokenCount:
    """Per-document token-count estimate under a BPE-ish pre-tokenizer
    (the budget metric training pipelines actually care about; word
    counts undercount code/punctuation-heavy text). One vectorized RE2
    pass per batch — no Python per row, no tokenizer state."""

    def __init__(self, text_col="text", id_col="doc_id", pattern: str = BPE_PATTERN):
        self.text_col = text_col
        self.id_col = id_col
        self.pattern = pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col).cast(pa.large_string())
        n = pc.count_substring_regex(col, self.pattern)
        return pa.table(
            {self.id_col: batch.column(self.id_col), "n_bpe_tokens": n.cast(pa.int64())}
        )


def bpe_token_count(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        BpeTokenCount, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow", concurrency=2,
    )
