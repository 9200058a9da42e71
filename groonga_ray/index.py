"""IndexReader: lexicon lookup, posting fetch, stats — the query-side
view of a built index.

Stands in for the reference's mmap'd lexicon (patricia trie, lib/pat.c)
+ chunk reader (grn_ii_cursor_open, lib/ii.c:4048-4141): the lexicon is
a sorted Arrow term column searched by binary search (exact) or offset
range (prefix = range [t, t+0xFF...), mirroring grn_pat_prefix_search
semantics, lib/pat.c:968), and posting rows are fetched from the bucket
Parquet files recorded in the lexicon with predicate pushdown, cached
per reader (per actor).

One IndexReader per worker/actor: construct once in ``__init__`` of a
query actor (stateful actor-pool pattern), never per batch.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import codec


class SectionIndex:
    """Lexicon + postings of one section (source column)."""

    def __init__(self, index_dir: str, section: str):
        self.dir = os.path.join(index_dir, f"sec={section}")
        self.section = section
        lex = pq.read_table(os.path.join(self.dir, "lexicon.parquet"))
        self._terms = lex.column("term").combine_chunks()
        self.df = lex.column("df").to_numpy(zero_copy_only=False)
        self.cf = lex.column("cf").to_numpy(zero_copy_only=False)
        self._n_parts = lex.column("n_parts").to_numpy(zero_copy_only=False)
        buckets = lex.column("buckets").combine_chunks()
        self._bucket_offsets = buckets.offsets.to_numpy().astype(np.int64)
        self._bucket_values = buckets.values.to_numpy().astype(np.int64)
        self.n_terms = len(self._terms)
        self._file_cache: dict[int, pa.Table] = {}
        self._term_index_cache: dict[int, dict[str, list[int]]] = {}

    # ---- lexicon -------------------------------------------------
    def term_id(self, term: str) -> int | None:
        """Binary search the sorted term column; None when absent."""
        lo, hi = 0, self.n_terms
        while lo < hi:
            mid = (lo + hi) // 2
            if self._terms[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < self.n_terms and self._terms[lo].as_py() == term:
            return lo
        return None

    def prefix_range(self, prefix: str) -> range:
        """tids of all terms with the given prefix (sorted-lexicon range
        scan — the patricia-trie prefix search equivalent)."""
        lo, hi = 0, self.n_terms
        while lo < hi:
            mid = (lo + hi) // 2
            if self._terms[mid].as_py() < prefix:
                lo = mid + 1
            else:
                hi = mid
        start = lo
        upper = prefix + "￿"
        hi = self.n_terms
        while lo < hi:
            mid = (lo + hi) // 2
            if self._terms[mid].as_py() < upper:
                lo = mid + 1
            else:
                hi = mid
        return range(start, lo)

    def term_at(self, tid: int) -> str:
        return self._terms[tid].as_py()

    def suffix_tids(self, suffix: str) -> list[int]:
        """tids of terms ending with ``suffix`` — the patricia trie's
        SIS suffix links (GRN_OBJ_KEY_WITH_SIS, lib/pat.c:841-868)
        replaced by a reversed-term sorted index built lazily once per
        reader and binary-searched like the prefix path."""
        if not hasattr(self, "_rev"):
            import pyarrow.compute as pc

            rev = pc.utf8_reverse(self._terms)
            order = pc.sort_indices(rev)
            self._rev_sorted = rev.take(order)
            self._rev_tid = order.to_numpy(zero_copy_only=False).astype(np.int64)
            self._rev = True
        target = suffix[::-1]
        lo, hi = 0, len(self._rev_sorted)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._rev_sorted[mid].as_py() < target:
                lo = mid + 1
            else:
                hi = mid
        start = lo
        upper = target + "￿"
        hi = len(self._rev_sorted)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._rev_sorted[mid].as_py() < upper:
                lo = mid + 1
            else:
                hi = mid
        return self._rev_tid[start:lo].tolist()

    def df_estimate(self, tid: int) -> int:
        """The reference's df *estimate* (grn_ii_estimate_size,
        lib/ii.c:4470-4494): 1 for single-posting terms, df+2 for
        buffered terms (clean-build equivalence, SURVEY.md §2.4)."""
        d = int(self.df[tid])
        return 1 if d == 1 else d + 2

    # ---- postings ------------------------------------------------
    def _bucket_table(self, bucket: int) -> pa.Table:
        if bucket not in self._file_cache:
            path = os.path.join(self.dir, "postings", f"bucket={bucket:04d}", "part.parquet")
            self._file_cache[bucket] = pq.read_table(path)
            terms = self._file_cache[bucket].column("term").to_pylist()
            idx: dict[str, list[int]] = {}
            for i, t in enumerate(terms):
                idx.setdefault(t, []).append(i)
            self._term_index_cache[bucket] = idx
        return self._file_cache[bucket]

    def posting_rows(self, tid: int) -> list[dict]:
        """All part rows of a term, ordered by first docid (hot terms
        have several salted parts; cold terms exactly one)."""
        term = self.term_at(tid)
        rows: list[dict] = []
        buckets = self._bucket_values[self._bucket_offsets[tid] : self._bucket_offsets[tid + 1]]
        for b in np.unique(buckets):
            tbl = self._bucket_table(int(b))
            for i in self._term_index_cache[int(b)].get(term, []):
                rows.append({c: tbl.column(c)[i].as_py() for c in tbl.column_names})
        rows.sort(key=lambda r: r["cfirst"][0])
        return rows

    def postings(self, tid: int, min_docid: int | None = None, with_positions: bool = False) -> codec.PostingList:
        rows = self.posting_rows(tid)
        if not rows:
            return codec.PostingList(np.empty(0, np.uint64), np.empty(0, np.uint64))
        if len(rows) == 1:
            return codec.decode_postings(rows[0], min_docid=min_docid, with_positions=with_positions)
        merged = codec.concat_posting_rows(rows)
        return codec.decode_postings(merged, min_docid=min_docid, with_positions=with_positions)


class IndexReader:
    def __init__(self, index_dir: str):
        self.dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as fh:
            self.meta = json.load(fh)
        with open(os.path.join(index_dir, "stats.json")) as fh:
            self.stats = json.load(fh)
        self.sections = {s: SectionIndex(index_dir, s) for s in self.meta["sections"]}
        self._doclens: dict[str, np.ndarray] = {}
        self.n_docs = int(self.meta["n_docs"])

    def section(self, name: str | None = None) -> SectionIndex:
        if name is None:
            name = self.meta["sections"][0]
        return self.sections[name]

    def doclens(self, section: str | None = None) -> np.ndarray:
        """dense docid -> token count array (index 0 unused; docids are
        1-based via rank assignment, or whatever the docid column was)."""
        if section is None:
            section = self.meta["sections"][0]
        if section not in self._doclens:
            import glob

            files = sorted(glob.glob(os.path.join(self.dir, "doclens", f"sec={section}", "*.parquet")))
            tbl = pa.concat_tables(pq.read_table(f) for f in files)
            docids = tbl.column("docid").to_numpy(zero_copy_only=False)
            dls = tbl.column("dl").to_numpy(zero_copy_only=False)
            size = int(docids.max()) + 1 if len(docids) else 1
            arr = np.zeros(size, np.uint32)
            arr[docids] = dls
            self._doclens[section] = arr
        return self._doclens[section]

    def avgdl(self, section: str | None = None) -> float:
        if section is None:
            section = self.meta["sections"][0]
        return float(self.meta["stats"]["sections"][section]["avgdl"])


@lru_cache(maxsize=8)
def open_index(index_dir: str) -> IndexReader:
    """Process-level reader cache (one per index per worker)."""
    return IndexReader(index_dir)
