"""Scorers — vectorized over (docid, tf) arrays.

Three scorers, mirroring the reference's pluggable scorer surface
(include/groonga/scorer.h:29-89, grn_scorer_register):

* ``default`` — Groonga's built-in accumulation: per matched record
  ``score = (noccur + tscore) * weight`` summed across match ops and
  sections (lib/ii.c:6528-6539 + grn_table_add_subrec lib/db.c:2136).
* ``tf_idf`` — scorer_tf_idf (lib/scorers.c:25-52):
  ``tf * ln(N / (n_candidates / n_tokens))`` floored at 1.0, where
  n_candidates sums the reference's df *estimates* (df̂ = df + 2, or 1
  for single-posting terms — grn_ii_estimate_size, lib/ii.c:4470).
* ``bm25`` — the north-rule scorer, Lucene/ATIRE-style BM25 with exact
  df and avgdl from the build stats:
  ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``,
  ``score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.

Scores are float64 internally; the reference's command-v1 output
truncates to Int32 (lib/output.c:1165-1167) — :func:`score_int32`.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def bm25_idf(df: float, n_docs: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def bm25(tf: np.ndarray, df: float, dl: np.ndarray, n_docs: int, avgdl: float,
         k1: float = K1, b: float = B) -> np.ndarray:
    idf = bm25_idf(df, n_docs)
    tf = tf.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * (dl.astype(np.float64) / max(avgdl, 1e-9)))
    return idf * tf * (k1 + 1.0) / denom


def bm25_upper_bound(max_tf: float, df: float, n_docs: int, k1: float = K1, b: float = B) -> float:
    """Block-max bound: bm25 is increasing in tf and decreasing in dl;
    bound with tf=max_tf, dl→0."""
    idf = bm25_idf(df, n_docs)
    return idf * max_tf * (k1 + 1.0) / (max_tf + k1 * (1.0 - b))


def tf_idf(tf: np.ndarray, n_candidates: float, n_tokens: int, n_docs: int) -> np.ndarray:
    """scorer_tf_idf formula (lib/scorers.c:25-52), floored at 1.0."""
    avg = n_candidates / max(1, n_tokens)
    s = tf.astype(np.float64) * np.log(n_docs / avg)
    return np.maximum(s, 1.0)


def tf_idf_upper_bound(max_tf: float, n_candidates: float, n_tokens: int, n_docs: int) -> float:
    avg = n_candidates / max(1, n_tokens)
    return float(max(max_tf * np.log(n_docs / avg), 1.0))


def default_score(noccur: np.ndarray, tscore: np.ndarray | float = 0.0, weight: float = 1.0) -> np.ndarray:
    """(noccur + tscore) * weight — lib/ii.c:6528-6539. The reference
    computes in int32 arithmetic; weights from match_columns 'col*2'."""
    return ((noccur.astype(np.float64) + tscore) * weight)


def default_upper_bound(max_tf: float, weight: float = 1.0) -> float:
    return max_tf * weight


def score_int32(scores: np.ndarray) -> np.ndarray:
    """C double->int32 cast truncation (toward zero), matching the
    command-v1 Int32 _score output (lib/output.c:569-570, 1165-1167)."""
    return np.trunc(scores).astype(np.int32)
