"""Train/eval decontamination: flag training documents sharing any
token n-gram with a (small) evaluation set.

The standard LLM-data hygiene pass (n-gram overlap decontamination,
e.g. GPT-3 appendix C / PaLM-style 13-gram checks): every training
document containing any n-token span that also appears in an eval
benchmark is flagged (for removal or span-masking).

Scale shape — the eval side is SMALL (benchmarks are thousands of
rows), the train side is the 100 TB corpus:

* eval n-grams are computed once, hashed to u64, sorted, and broadcast
  via ``ray.put`` (a few MB); every map task reads the same object —
  no shuffle anywhere, the corpus streams through one ``map_batches``.
* per batch the token stream is hashed (one FNV pass over the slice
  vocabulary), n-gram hashes are built by a vectorized polynomial
  combine over n shifted views (n small, ~5-13), and probed with
  ``searchsorted`` against the broadcast array.
* hash hits are then verified against the exact eval n-gram string set
  (collision-proof; hits are rare so the per-hit loop is off the hot
  path), making the result exact — safe for the SQL oracle gate.

Output: one row per contaminated train doc ``(doc_id, n_hits)`` where
``n_hits`` counts matching n-gram occurrences (window positions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..tokenize import WordTokenizer
from ..utils import fnv1a

# polynomial combine base for rolling n-gram hashing (odd 64-bit mix)
_P = np.uint64(0x9E3779B97F4A7C15)


def _token_stream(texts: pa.Array, wt: WordTokenizer):
    tb = wt.tokenize_column(texts)
    return tb.terms, tb.row_idx, tb.n_tokens_per_row


def _ngram_hashes(
    terms: pa.Array, row_idx: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """(window_start_token_idx, ngram_hash) for every length-n window
    that stays inside one row. Vectorized: n shifted multiply-adds."""
    h = fnv1a(terms)
    total = len(h)
    if total < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    m = total - n + 1
    acc = np.zeros(m, np.uint64)
    mult = 1
    for j in range(n):
        acc += h[j : j + m] * np.uint64(mult)
        mult = (mult * int(_P)) & 0xFFFFFFFFFFFFFFFF
    valid = row_idx[:m] == row_idx[n - 1 :]
    starts = np.flatnonzero(valid)
    return starts, acc[valid]


def _ngram_string(terms_list: list, start: int, n: int) -> str:
    return " ".join(terms_list[start : start + n])


def build_eval_ngrams(
    eval_ds: ray.data.Dataset, text_col: str = "text", n: int = 5
) -> tuple[np.ndarray, set]:
    """Collect the eval set's distinct n-grams: (sorted u64 hash array,
    exact string set). The eval side is small by construction — this is
    the broadcast side, materialized once on the driver."""
    wt = WordTokenizer()
    hashes: list[np.ndarray] = []
    strings: set = set()
    for batch in eval_ds.select_columns([text_col]).iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        terms, row_idx, _ = _token_stream(col, wt)
        starts, hs = _ngram_hashes(terms, row_idx, n)
        hashes.append(hs)
        tl = terms.to_pylist()
        for s in starts.tolist():
            strings.add(_ngram_string(tl, s, n))
    arr = (
        np.unique(np.concatenate(hashes)) if hashes else np.empty(0, np.uint64)
    )
    return arr, strings


class _Decontaminator:
    """Actor-pool stage: holds the broadcast eval n-gram set (loaded
    once per actor in ``__init__``, the stateful-stage pattern)."""

    def __init__(self, eval_ref, text_col: str, id_col: str, n: int):
        self.eval_hashes, self.eval_strings = ray.get(eval_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.wt = WordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        terms, row_idx, _ = _token_stream(col.cast(pa.large_string()), self.wt)
        starts, hs = _ngram_hashes(terms, row_idx, self.n)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if len(hs) == 0 or len(self.eval_hashes) == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], type=batch.schema.field(self.id_col).type),
                    "n_hits": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(self.eval_hashes, hs)
        pos[pos == len(self.eval_hashes)] = 0
        cand = np.flatnonzero(self.eval_hashes[pos] == hs)
        # exact verification of the (rare) hash hits
        verified = []
        if len(cand):
            tl = terms.to_pylist()
            for ci in cand.tolist():
                s = int(starts[ci])
                if _ngram_string(tl, s, self.n) in self.eval_strings:
                    verified.append(ci)
        if not verified:
            return pa.table(
                {
                    self.id_col: pa.array([], type=batch.schema.field(self.id_col).type),
                    "n_hits": pa.array([], type=pa.int64()),
                }
            )
        vrows = row_idx[starts[np.array(verified)]]
        uniq_rows, counts = np.unique(vrows, return_counts=True)
        return pa.table(
            {
                self.id_col: pa.array(
                    ids[uniq_rows], type=batch.schema.field(self.id_col).type
                ),
                "n_hits": pa.array(counts.astype(np.int64)),
            }
        )


def decontaminate(
    train_ds: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Flag train docs sharing >=1 token n-gram with the eval set.

    Returns ``(id_col, n_hits)``: matching window occurrences per
    contaminated train doc. Exact (hash prefilter + string verify).
    No shuffle: the eval set broadcasts, the corpus streams.
    """
    eval_ref = ray.put(build_eval_ngrams(eval_ds, text_col, n))
    return train_ds.map_batches(
        _Decontaminator,
        fn_constructor_args=(eval_ref, text_col, id_col, n),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
