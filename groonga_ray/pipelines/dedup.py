"""Deduplication operators over a document Dataset.

All operators take/return ``ray.data.Dataset`` and stay vectorized
inside ``map_batches``; the only shuffles are the final small
``groupby`` over hashes/keys (pre-aggregated per batch where possible).

* exact dedup — content hash -> keep min doc_id (hash-partition +
  per-group first; the reference has no general distinct, its dedup is
  the result-set hash keyed by rid — SURVEY.md §2.6).
* ngram-key blocking — cheap near-dup blocking by the first-k-token
  key.
* MinHash + LSH — shingle -> 64 minhash perms -> banded buckets ->
  candidate pairs -> verified Jaccard.
* SimHash — 64-bit sign fingerprint of token hashes.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..tokenize import WordTokenizer
from ..utils import fnv1a

# deterministic 64-bit mix constants for minhash permutations
_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_tokens(terms: pa.Array) -> np.ndarray:
    """Deterministic u64 hash per token for shingling. polars' native
    string hash is ~6x faster than the numpy FNV loop on short tokens
    (the hot input of minhash); fall back to fnv1a without polars.
    Only used where cross-version hash stability is NOT part of the
    contract (minhash is an approximate, rows-only op) — content
    fingerprints keep using fnv1a/sha.

    Result contract: minhash signatures / LSH buckets are a pure
    function of (data, polars version). Outputs compared ACROSS
    environments (different polars, or none) must set
    ``GROONGA_RAY_STABLE_HASH=1`` to pin the fnv1a implementation
    (identical everywhere, ~6x slower on the perm stage)."""
    import os

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if os.environ.get("GROONGA_RAY_STABLE_HASH"):
        return fnv1a(terms)
    try:
        import polars as pl

        return pl.from_arrow(pa.table({"t": terms})).get_column("t").hash(seed=0).to_numpy().view(np.uint64)
    except ImportError:
        return fnv1a(terms)


def _sha256_col(texts: pa.Array) -> pa.Array:
    return pa.array([hashlib.sha256((t or "").encode()).hexdigest() for t in texts.to_pylist()])


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """(hash, doc_id=min) — one row per distinct content.

    sha256 matches external tooling byte-for-byte but is a per-row
    Python loop; prefer :func:`exact_dedup_fast` when the hash itself
    doesn't need to interop (vectorized, the 100-TB path).
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "content_hash": _sha256_col(batch.column(text_col)),
            }
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keep_id"))
    )


def exact_dedup_fast(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Vectorized exact dedup: 128-bit content fingerprint from two
    independent seeded hash families (no per-row Python in the hot
    stage), hash-groupby keeping min doc_id. Collision odds
    ~n^2/2^129 — negligible at 10^12 docs.

    The fingerprints are ephemeral (recomputed per run, never
    persisted), so the fast polars native string hash is used when
    available (~3x fnv1a on document-length strings); fnv1a otherwise.
    """

    def _content_hash(texts: pa.Array, seed: int) -> np.ndarray:
        try:
            import polars as pl

            return pl.from_arrow(texts).hash(seed=seed).to_numpy()
        except ImportError:
            return fnv1a(texts, seed=seed)

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).cast(pa.large_string())
        return pa.table(
            {
                id_col: batch.column(id_col),
                # int64 view: uint64 keys fall off Arrow's native
                # groupby path (pickled objects) in Ray Data
                "h_lo": pa.array(_content_hash(texts, 0).view(np.int64), pa.int64()),
                "h_hi": pa.array(
                    _content_hash(texts, 0x9E3779B9).view(np.int64), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby(["h_lo", "h_hi"])
        .aggregate(Min(id_col, alias_name="keep_id"))
    )


def ngram_key_dedup(
    ds: ray.data.Dataset, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Blocking key = first k tokens joined; keep min doc_id per key.

    Skew-safe by construction: Min is algebraic, so Ray pre-aggregates
    per block before the exchange — a boilerplate key (license header
    shared by 10^9 docs) contributes one row per block to the shuffle,
    not 10^9 rows.
    """
    wt = WordTokenizer()

    def add_key(batch: pa.Table) -> pa.Table:
        tb = wt.tokenize_column(batch.column(text_col).cast(pa.large_string()))
        n = batch.num_rows
        # keep the first k tokens of each row, vectorized: positions<k
        # mask -> per-row list array -> binary_join
        keep = tb.positions < k
        kept_terms = tb.terms.filter(pa.array(keep))
        counts = np.minimum(tb.n_tokens_per_row, k)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_terms
        )
        keys = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        return pa.table({id_col: batch.column(id_col), "key": keys.cast(pa.string())})

    from ray.data.aggregate import Min

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min(id_col, alias_name="keep_id"))
    )


class _MinHasher:
    """Actor-pool stage: permutation constants built once per actor.

    Permutations are the 32-bit multiply-shift family
    ``(a * x + b) mod 2^32`` with odd ``a`` over a folded 32-bit
    shingle hash: u32 arithmetic halves the temporary-matrix traffic
    and skips the Mersenne fold entirely, making the permutation stage
    ~8x faster than the previous u64 ``mod (2^61-1)`` scheme at the
    same estimator quality (min over any near-universal family). With
    permutations this cheap, per-row shingle dedup never amortizes its
    lexsort (measured: dedup costs ~2.5x the whole perm stage on code
    corpora at ~6% dup ratio), so shingles feed the reduce directly."""

    def __init__(self, n_perm: int, shingle: int, text_col: str, id_col: str):
        rng = np.random.default_rng(42)
        self.a = rng.integers(0, 1 << 32, size=n_perm, dtype=np.uint32) | np.uint32(1)
        self.b = rng.integers(0, 1 << 32, size=n_perm, dtype=np.uint32)
        self.n_perm = n_perm
        self.shingle = shingle
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()

    def signatures(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        tb = self.wt.tokenize_column(batch.column(self.text_col).cast(pa.large_string()))
        tok_hash = _hash_tokens(tb.terms)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sigs = np.full((batch.num_rows, self.n_perm), np.iinfo(np.uint32).max, np.uint32)
        # shingles: rolling combine of `shingle` consecutive token hashes
        row = tb.row_idx
        h = tok_hash.copy()
        for s in range(1, self.shingle):
            shifted = np.roll(tok_hash, -s)
            same_row = np.roll(row, -s) == row
            h = np.where(same_row, h * np.uint64(1099511628211) ^ shifted, h)
        # per-permutation min per row. row_idx is non-decreasing (tokens
        # are emitted in document order), so the per-row min is a
        # segmented reduce — minimum.reduceat over segment starts is
        # ~40x faster than the unbuffered minimum.at scatter. Perms are
        # batched in chunks of 8 to keep the (chunk x n_tokens) u32
        # matrix inside cache (8-chunks measured ~3x faster than 16).
        if len(row) == 0:
            return ids, sigs
        h32 = ((h >> np.uint64(32)) ^ h).astype(np.uint32)
        first = np.concatenate([[True], row[1:] != row[:-1]])
        starts = np.flatnonzero(first)
        seg_rows = row[starts]
        for p0 in range(0, self.n_perm, 8):
            a = self.a[p0 : p0 + 8, None]
            b = self.b[p0 : p0 + 8, None]
            with np.errstate(over="ignore"):
                ph = a * h32[None, :] + b
            sigs[seg_rows, p0 : p0 + 8] = np.minimum.reduceat(ph, starts, axis=1).T
        return ids, sigs


class MinHashLSH(_MinHasher):
    """map_batches callable emitting (band, band_hash, doc_id) rows."""

    def __init__(self, n_perm=64, bands=8, shingle=3, text_col="text", id_col="doc_id"):
        super().__init__(n_perm, shingle, text_col, id_col)
        self.bands = bands
        self.rows_per_band = n_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sigs = self.signatures(batch)
        r = self.rows_per_band
        out_band, out_hash, out_id = [], [], []
        for bnd in range(self.bands):
            seg = sigs[:, bnd * r : (bnd + 1) * r].astype(np.uint64)
            # stable hash of the band signature
            bh = np.zeros(len(ids), np.uint64)
            for j in range(r):
                bh = bh * np.uint64(1099511628211) ^ seg[:, j]
            out_band.append(np.full(len(ids), bnd, np.int32))
            out_hash.append(bh)
            out_id.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                # reinterpret as int64 (stable, avoids uint64 cast overflow)
                "band_hash": pa.array(np.concatenate(out_hash).view(np.int64), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_id)),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset, n_perm=64, bands=8, shingle=3, text_col="text", id_col="doc_id",
    max_group: int = 4096,
) -> ray.data.Dataset:
    """(band, band_hash) buckets with >1 doc -> candidate groups.
    Returns rows (band, band_hash, doc_ids list, n, capped).

    ``max_group`` bounds a bucket's emitted candidate list (boilerplate
    corpora produce giant buckets whose all-pairs verification is
    quadratic); a capped bucket keeps the ``n`` lowest doc_ids and sets
    ``capped`` — at 100 TB, treat capped buckets as "all near-dups of
    the kept representative" rather than verifying pairs.
    """

    _EMPTY = pa.schema(
        [("band", pa.int32()), ("band_hash", pa.int64()),
         ("doc_ids", pa.list_(pa.int64())), ("n", pa.int64()), ("capped", pa.bool_())]
    )

    def add_part(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
        return batch.append_column(
            "p", pa.array((bh % np.uint64(n_parts)).astype(np.int64), pa.int64())
        )

    def collapse_part(group: pa.Table) -> pa.Table:
        # ONE vectorized pass per hash partition (a per-(band,hash)
        # map_groups would make 100k+ Python calls on mostly-singleton
        # buckets): sort, run-detect, cap, build the list array from
        # offsets. No per-bucket Python.
        band = group.column("band").to_numpy(zero_copy_only=False)
        bh = group.column("band_hash").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, bh, band))
        band, bh, did = band[order], bh[order], did[order]
        newg = np.concatenate([[True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
        gid = np.cumsum(newg) - 1
        starts = np.flatnonzero(newg)
        sizes = np.diff(np.append(starts, len(gid)))
        keep_g = sizes >= 2
        ordinal = np.arange(len(gid)) - starts[gid]
        keep_row = keep_g[gid] & (ordinal < max_group)
        if not keep_row.any():
            return _EMPTY.empty_table()
        band2, bh2, did2, gid2 = band[keep_row], bh[keep_row], did[keep_row], gid[keep_row]
        newg2 = np.concatenate([[True], gid2[1:] != gid2[:-1]])
        starts2 = np.flatnonzero(newg2)
        sizes2 = np.diff(np.append(starts2, len(gid2)))
        offsets = np.concatenate([[0], np.cumsum(sizes2)])
        return pa.table(
            {
                "band": pa.array(band2[starts2].astype(np.int32), pa.int32()),
                "band_hash": pa.array(bh2[starts2], pa.int64()),
                "doc_ids": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(did2, pa.int64())
                ),
                "n": pa.array(sizes2.astype(np.int64), pa.int64()),
                "capped": pa.array(sizes[keep_g] > max_group),
            }
        )

    n_parts = 32
    # task pool, not an actor pool: the hasher state (perm constants +
    # tokenizer tables) rebuilds in ~ms and is cached per worker
    # process (_lsh_batch), while an actor pool pays ~1-1.5 s of
    # spin-up on EVERY pipeline execution and pins concurrency
    sig = ds.map_batches(
        _lsh_batch,
        fn_kwargs=dict(
            n_perm=n_perm, bands=bands, shingle=shingle, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
    )
    return (
        sig.map_batches(add_part, batch_format="pyarrow")
        .groupby("p")
        .map_groups(collapse_part, batch_format="pyarrow")
    )


@functools.lru_cache(maxsize=8)
def _lsh_for(n_perm: int, bands: int, shingle: int, text_col: str, id_col: str) -> "MinHashLSH":
    return MinHashLSH(
        n_perm=n_perm, bands=bands, shingle=shingle, text_col=text_col, id_col=id_col
    )


def _lsh_batch(batch: pa.Table, *, n_perm, bands, shingle, text_col, id_col) -> pa.Table:
    """Module-level task fn: per-worker-process cached MinHashLSH."""
    return _lsh_for(n_perm, bands, shingle, text_col, id_col)(batch)


class SimHasher:
    """64-bit SimHash over token hashes, vectorized per batch."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.wt = WordTokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tb = self.wt.tokenize_column(batch.column(self.text_col).cast(pa.large_string()))
        h = fnv1a(tb.terms)
        row = tb.row_idx
        n = batch.num_rows
        acc = np.zeros((n, 64), np.int64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        contrib = bits * 2 - 1
        np.add.at(acc, row, contrib)
        sim = (acc > 0).astype(np.uint64)
        out = np.zeros(n, np.uint64)
        for j in range(64):
            out |= sim[:, j] << np.uint64(j)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                # int64 reinterpretation for friendlier downstream schemas
                "simhash": pa.array(out.view(np.int64), pa.int64()),
            }
        )


def verify_jaccard(texts_a: list[str], texts_b: list[str], shingle: int = 3) -> np.ndarray:
    """Exact n-gram Jaccard for candidate verification (small sets)."""
    wt = WordTokenizer()

    def shingles(t: str) -> set:
        toks = wt.tokenize_text(t)
        return {tuple(toks[i : i + shingle]) for i in range(max(0, len(toks) - shingle + 1))}

    out = np.zeros(len(texts_a))
    for i, (a, b) in enumerate(zip(texts_a, texts_b)):
        sa, sb = shingles(a), shingles(b)
        u = len(sa | sb)
        out[i] = (len(sa & sb) / u) if u else 0.0
    return out


class _EmbedPairFinder:
    """Actor-pool stage: the normalized corpus matrix is fetched from
    the object store ONCE per actor (broadcast via ray.put, zero-copy
    numpy view), each batch computes its block-row of the cosine
    matrix."""

    def __init__(self, ref, threshold: float, id_col: str, vec_col: str):
        self.ids, self.M = ray.get(ref)
        self.t = float(threshold)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ann import _to_matrix

        bm = _to_matrix(batch.column(self.vec_col))
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        bid = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = bm @ self.M.T
        mask = (sims >= self.t) & (self.ids[None, :] > bid[:, None])
        r, c = np.nonzero(mask)
        return pa.table(
            {
                "a": pa.array(bid[r], pa.int64()),
                "b": pa.array(self.ids[c], pa.int64()),
                "cos": pa.array(np.round(sims[r, c], 6)),
            }
        )


def embedding_dup_pairs(
    ds: ray.data.Dataset, threshold: float = 0.9,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> ray.data.Dataset:
    """EXACT embedding-cosine near-dup pairs (a < b, cos >= threshold).

    Block × broadcast: the corpus matrix ships to the object store once
    and every batch computes one block-row — O(n^2) compute spread over
    the pool with NO shuffle. The broadcast side is O(n·d) memory, so
    this is the small/mid-corpus exact path; at 100 TB use
    :func:`embedding_dedup_lsh` (bucketed candidates, no n^2)."""
    from .ann import _to_matrix

    n = ds.count()
    if n > 2_000_000:
        raise ValueError(
            f"embedding_dup_pairs is the exact O(n^2) path and broadcasts "
            f"the full corpus matrix ({n} rows); use embedding_dedup_lsh "
            f"for large corpora"
        )
    ids_chunks, mats = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids_chunks.append(b.column(id_col).to_numpy(zero_copy_only=False))
        mats.append(_to_matrix(b.column(vec_col)))
    ids_all = np.concatenate(ids_chunks).astype(np.int64)
    M = np.vstack(mats)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, M))
    return ds.map_batches(
        _EmbedPairFinder,
        fn_constructor_kwargs=dict(
            ref=ref, threshold=threshold, id_col=id_col, vec_col=vec_col
        ),
        batch_format="pyarrow",
        concurrency=2,
    )


def embedding_dedup_lsh(
    ds: ray.data.Dataset, threshold: float = 0.9, bits: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42,
    max_group: int = 4096,
) -> ray.data.Dataset:
    """Scale-path embedding near-dup: random-hyperplane LSH buckets ->
    within-bucket cosine >= threshold -> (vec_id, keep_id=min dup id).
    Near-identical vectors share all signature bits, so true near-dups
    co-bucket with high probability; candidates are verified exactly.
    Returns one row per vec_id (keep_id == vec_id when unique)."""
    import pyarrow.parquet  # noqa: F401  (keeps import surface obvious)

    from .ann import LshBucketer, _to_matrix

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column(vec_col)[0])

    def collapse(group: pa.Table) -> pa.Table:
        n = group.num_rows
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if n > max_group:
            # oversized bucket (boilerplate embeddings): verify pairs
            # only among the max_group lowest ids; the REST still get a
            # row — treated as near-dups of the bucket representative
            # (capped=True flags the unverified assignment)
            order = np.argsort(ids)
            head, tail = order[:max_group], order[max_group:]
            g2 = group.take(pa.array(head))
            h_ids = ids[head]
            m = _to_matrix(g2.column(vec_col))
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            dup = (m @ m.T) >= threshold
            keep_head = np.array([h_ids[dup[i]].min() for i in range(max_group)], np.int64)
            all_ids = np.concatenate([h_ids, ids[tail]])
            all_keep = np.concatenate(
                [keep_head, np.full(len(tail), int(ids.min()), np.int64)]
            )
            capped = np.concatenate(
                [np.zeros(max_group, bool), np.ones(len(tail), bool)]
            )
            return pa.table(
                {id_col: pa.array(all_ids), "keep_id": pa.array(all_keep),
                 "capped": pa.array(capped)}
            )
        m = _to_matrix(group.column(vec_col))
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ m.T
        dup = sims >= threshold
        keep = np.array([ids[dup[i]].min() for i in range(n)], np.int64)
        return pa.table(
            {id_col: pa.array(ids), "keep_id": pa.array(keep),
             "capped": pa.array(np.zeros(n, bool))}
        )

    from ray.data.aggregate import Min

    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs=dict(dim=dim, bits=bits, seed=seed,
                                   vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=2,
    )
    per_bucket = bucketed.groupby("bucket").map_groups(collapse, batch_format="pyarrow")
    # a vector can appear in one bucket only (single signature) -> rows
    # are already unique per vec_id; keep the schema-stable projection
    return per_bucket.map_batches(
        lambda b: b.select([id_col, "keep_id", "capped"]), batch_format="pyarrow"
    )


# ------------------------------------------------------------- exact Jaccard

def _char_shingles_u64(texts: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct k-byte character shingles per row, packed into uint64.

    For k <= 8 the packing is injective (k bytes big-endian into one
    u64), so shingle equality is EXACTLY substring equality — no hash
    collisions, which keeps the op bit-identical to a string-based SQL
    oracle. ASCII corpora only see byte==char windows; multi-byte UTF-8
    shifts window boundaries vs a character-based oracle (documented).

    Returns (row_idx, shingle) with per-row duplicates removed.
    """
    if k > 8:
        raise ValueError("k <= 8 required for injective u64 packing")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    arr = texts.cast(pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = np.frombuffer(arr.buffers()[2], np.uint8) if arr.buffers()[2] is not None else np.zeros(0, np.uint8)
    offs = np.frombuffer(arr.buffers()[1], np.int64, len(arr) + 1, offset=arr.offset * 8)
    lens = np.diff(offs)
    n_win = np.maximum(lens - k + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    row_idx = np.repeat(np.arange(len(arr), dtype=np.int64), n_win)
    starts = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_win) - n_win, n_win
    ) + np.repeat(offs[:-1], n_win)
    win = np.lib.stride_tricks.sliding_window_view(buf, k)[starts]
    pow_ = (np.uint64(256) ** np.arange(k - 1, -1, -1, dtype=np.uint64))
    sh = (win.astype(np.uint64) * pow_).sum(axis=1, dtype=np.uint64)
    # distinct per row
    order = np.lexsort((sh, row_idx))
    r, s = row_idx[order], sh[order]
    keep = np.concatenate([[True], (r[1:] != r[:-1]) | (s[1:] != s[:-1])])
    return r[keep], s[keep]


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    k: int = 5,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 32,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """EXACT all-pairs character-k-gram Jaccard >= threshold.

    Distributed inverted-shingle pair counting: (1) map_batches emits
    (shingle,u64 doc, doc shingle-count) rows, distinct per doc; (2) a
    hash-partition groupby co-locates equal shingles, one vectorized
    pass per partition expands same-shingle runs into candidate pairs
    and pre-aggregates them with np.unique BEFORE the exchange; (3) a
    groupby over packed pair keys sums intersection counts; jaccard =
    c / (na + nb - c).

    This is the oracle-parity exact op. At 100 TB the run expansion is
    quadratic in shingle document-frequency — set ``max_df`` to drop
    stop-shingles (boilerplate) from pair generation, or use
    minhash_lsh_candidates + verify_jaccard as the approximate scale
    path. With max_df=None output matches the SQL oracle exactly.
    """
    from ray.data.aggregate import Max, Sum

    def extract(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 32):
            # the pair key packs (a, b) as (a<<32)|b — out-of-range ids
            # would silently corrupt pair identity (same contract as
            # paragraph_dedup's 43-bit doc-id guard)
            raise ValueError(
                "ngram_jaccard_pairs requires doc ids in [0, 2^32); "
                "remap ids (e.g. assign_doc_ids) before pairing"
            )
        row_idx, sh = _char_shingles_u64(texts, k)
        n_sh = np.bincount(row_idx, minlength=batch.num_rows)
        return pa.table(
            {
                "sh": pa.array(sh, pa.uint64()),
                "doc": pa.array(ids[row_idx], pa.int64()),
                "nsh": pa.array(n_sh[row_idx].astype(np.int64), pa.int64()),
                "p": pa.array((sh % np.uint64(n_parts)).astype(np.int64), pa.int64()),
            }
        )

    def pairgen(group: pa.Table) -> pa.Table:
        # one partition: sort by (shingle, doc), expand runs into pairs
        sh = group.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        nsh = group.column("nsh").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sh))
        sh, doc, nsh = sh[order], doc[order], nsh[order]
        run_start = np.concatenate([[True], sh[1:] != sh[:-1]])
        run_id = np.cumsum(run_start) - 1
        starts = np.flatnonzero(run_start)
        sizes = np.diff(np.append(starts, len(sh)))
        if max_df is not None:
            ok = sizes[run_id] <= max_df
            sh, doc, nsh, run_id = sh[ok], doc[ok], nsh[ok], run_id[ok]
            run_start = np.concatenate([[True], run_id[1:] != run_id[:-1]]) if len(run_id) else run_start[:0]
            starts = np.flatnonzero(run_start)
        within = np.arange(len(sh)) - np.repeat(starts, np.diff(np.append(starts, len(sh)))) if len(sh) else np.zeros(0, np.int64)
        total = int(within.sum())
        if total == 0:
            return pa.table(
                {"pair": pa.array([], pa.uint64()), "c": pa.array([], pa.int64()),
                 "na": pa.array([], pa.int64()), "nb": pa.array([], pa.int64())}
            )
        rep_j = np.repeat(np.arange(len(sh)), within)  # the later element
        offs = np.arange(total) - np.repeat(np.cumsum(within) - within, within)
        rep_i = (rep_j - within[rep_j]) + offs  # earlier elements of the run
        a, b = doc[rep_i], doc[rep_j]  # a < b (docs sorted within run)
        na, nb = nsh[rep_i], nsh[rep_j]
        pair = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        # pre-aggregate inside the partition before the exchange
        upair, first, counts = np.unique(pair, return_index=True, return_counts=True)
        return pa.table(
            {
                "pair": pa.array(upair, pa.uint64()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
                "na": pa.array(na[first].astype(np.int64), pa.int64()),
                "nb": pa.array(nb[first].astype(np.int64), pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        pair = batch.column("pair").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch.column("max(na)").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch.column("max(nb)").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = c / (na + nb - c)
        keep = jac >= threshold
        return pa.table(
            {
                "doc_a": pa.array((pair[keep] >> np.uint64(32)).astype(np.int64), pa.int64()),
                "doc_b": pa.array((pair[keep] & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), pa.float64()),
            }
        )

    shingles = ds.map_batches(extract, batch_format="pyarrow")
    pairs = shingles.groupby("p").map_groups(pairgen, batch_format="pyarrow")
    agg = pairs.groupby("pair").aggregate(Sum("c"), Max("na"), Max("nb"))
    return agg.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------- semantic dedup

def semantic_dedup(
    ds: "ray.data.Dataset",
    n_clusters: int = 16,
    threshold: float = 0.97,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    max_cluster: int = 20_000,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public formulation): k-means-cluster the
    embeddings, then WITHIN each cluster drop every vector whose
    cosine to an earlier-kept vector exceeds ``threshold``.

    Scale shape: centroids train on a hash sample and broadcast; the
    corpus streams through one assignment ``map_batches``; the only
    shuffle is the ``groupby`` on cluster id, and within-cluster work
    is O(size^2) vectorized matmul BOUNDED by ``max_cluster`` — rows
    past the cap keep=True with ``capped`` flagged (the same
    cap-and-flag honesty as minhash buckets). Size ``n_clusters`` to
    the corpus (clusters of ~10-50k rows) so the cap never bites;
    at web scale n_clusters grows with N, keeping per-group work flat.

    Returns ``(id_col, cluster, keep, capped)``: ``keep`` is False for
    near-duplicate rows (the kept representative is the smallest id —
    deterministic).
    """
    import ray as _ray

    from .ann import _hash_sample, _kmeans, _to_matrix

    n_rows = ds.count()
    cap = 50_000
    mod = max(1, n_rows // cap) if n_rows else 1
    sample = _hash_sample(ds, id_col, vec_col, cap, mod)
    cent = _kmeans(sample, n_clusters)
    cent_ref = _ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = _ray.get(cent_ref)
        m = _to_matrix(batch.column(vec_col))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cl = (mn @ c.T).argmax(axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "cluster": pa.array(cl, pa.int32()),
            }
        )

    def prune(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        m = _to_matrix(group.column(vec_col))[order]
        ids_s = ids[order]
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(mn)
        is_capped = n > max_cluster
        nc = min(n, max_cluster)
        keep = np.ones(n, bool)
        # greedy in ascending-id order: drop j if cos(j, any kept i<j) > thr
        sims = mn[:nc] @ mn[:nc].T
        for j in range(1, nc):
            if (sims[j, :j][keep[:j]] > threshold).any():
                keep[j] = False
        cl = int(group.column("cluster")[0].as_py())
        capped = np.zeros(n, bool)
        capped[nc:] = is_capped  # rows past the cap: uncompared, flagged
        return pa.table(
            {
                id_col: pa.array(ids_s),
                "cluster": pa.array(np.full(n, cl, np.int32)),
                "keep": pa.array(keep),
                "capped": pa.array(capped),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


# ------------------------------------------- duplicate-cluster resolution

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


# ---------------- task-based star rounds (the at-scale CC path)
#
# The star rounds are ITERATIVE with a tiny per-round data dependency
# (a convergence fingerprint); expressing each round as Dataset
# groupby/join chains costs ~8 all-to-all operator launches per round,
# and round LATENCY — not data volume — dominates (measured minutes
# for a 300k-edge graph with deep chains). This is the case where the
# Dataset API genuinely can't express the semantics efficiently, so
# the rounds run as raw Ray tasks: edge state lives in the object
# store as P hash(u)-partitions, each round is one wave of P
# large-star tasks and one wave of P small-star tasks (numpy
# sort+reduceat inside), and the driver sees only 4-number
# fingerprints. Partition-local pair dedup is global dedup because u
# determines the partition.

_CC_MIX_A = 0x9E3779B97F4A7C15
_CC_MIX_B = 0xC2B2AE3D27D4EB4F


def _cc_hash_part(x: np.ndarray, P: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = x.astype(np.uint64) * np.uint64(_CC_MIX_A)
    return ((h >> np.uint64(33)) % np.uint64(P)).astype(np.int64)


def _cc_dedup_pairs(u: np.ndarray, v: np.ndarray):
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    if len(u):
        keep = np.concatenate([[True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])])
        u, v = u[keep], v[keep]
    return u, v


def _cc_split(u: np.ndarray, v: np.ndarray, P: int) -> list:
    """P (u, v) tables split by hash(u)."""
    part = _cc_hash_part(u, P)
    order = np.argsort(part, kind="stable")
    u, v, part = u[order], v[order], part[order]
    bounds = np.searchsorted(part, np.arange(P + 1))
    return [
        pa.table({"u": pa.array(u[a:b], pa.int64()), "v": pa.array(v[a:b], pa.int64())})
        for a, b in zip(bounds[:-1], bounds[1:])
    ]


def _cc_concat(tables: list) -> tuple:
    us = [t.column("u").to_numpy(zero_copy_only=False) for t in tables if t.num_rows]
    vs = [t.column("v").to_numpy(zero_copy_only=False) for t in tables if t.num_rows]
    if not us:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return (
        np.concatenate(us).astype(np.int64),
        np.concatenate(vs).astype(np.int64),
    )


def _cc_group_min(x: np.ndarray, y: np.ndarray):
    """Per sorted-group min: returns (sorted x, sorted y, starts, m)
    where m[g] = min(min y in group g, group key)."""
    order = np.argsort(x, kind="stable")
    x, y = x[order], y[order]
    starts = np.flatnonzero(np.concatenate([[True], x[1:] != x[:-1]]))
    m = np.minimum(np.minimum.reduceat(y, starts), x[starts])
    return x, y, starts, m


def _cc_ls_task(P: int, dir_tables: list, rev_tables: list):
    """Large-star over this partition's incident rows (directed +
    reversed): connect each strictly-greater neighbor to the node's
    min; emit split by hash(new u)."""
    import ray

    du, dv = _cc_concat(ray.get(list(dir_tables)))
    ru, rv = _cc_concat(ray.get(list(rev_tables)))
    x = np.concatenate([du, ru])
    y = np.concatenate([dv, rv])
    if len(x) == 0:
        empty = _EDGE_SCHEMA.empty_table()
        return tuple([empty] * P)
    x, y = _cc_dedup_pairs(x, y)
    x, y, starts, m = _cc_group_min(x, y)
    reps = np.diff(np.append(starts, len(x)))
    mrow = np.repeat(m, reps)
    keep = (y > x) & (y != mrow)
    nu, nv = _cc_dedup_pairs(y[keep], mrow[keep])
    return tuple(_cc_split(nu, nv, P))


def _cc_ss_task(P: int, dir_tables: list):
    """Small-star over directed (large->small) edges: connect every
    neighbor and the node itself to the node's min. Returns P directed
    splits + P reversed splits + a fingerprint tuple."""
    import ray

    u, v = _cc_concat(ray.get(list(dir_tables)))
    if len(u) == 0:
        empty = _EDGE_SCHEMA.empty_table()
        return tuple([empty] * (2 * P)) + ((0, 0, 0, 0),)
    u, v = _cc_dedup_pairs(u, v)
    su, sv, starts, m = _cc_group_min(u, v)
    reps = np.diff(np.append(starts, len(su)))
    mrow = np.repeat(m, reps)
    keep = sv != mrow
    nu = np.concatenate([sv[keep], su[starts]])
    nv = np.concatenate([mrow[keep], m])
    nu, nv = _cc_dedup_pairs(nu, nv)
    with np.errstate(over="ignore"):
        h = (
            nu.astype(np.uint64) * np.uint64(_CC_MIX_A)
            ^ nv.astype(np.uint64) * np.uint64(_CC_MIX_B)
        )
    fp = (
        int(len(nu)),
        int(nu.sum(dtype=np.uint64) if len(nu) else 0),
        int(nv.sum(dtype=np.uint64) if len(nv) else 0),
        int(h.sum(dtype=np.uint64) if len(h) else 0),
    )
    return tuple(_cc_split(nu, nv, P)) + tuple(_cc_split(nv, nu, P)) + (fp,)


def _cc_split2_task(tbl: pa.Table, P: int):
    """Initial scatter: directed splits by hash(u) + reversed by hash(v)."""
    u = tbl.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
    v = tbl.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
    return tuple(_cc_split(u, v, P)) + tuple(_cc_split(v, u, P))


def _cc_star_rounds_tasks(
    E_raw: "ray.data.Dataset", P: int, max_rounds: int
) -> "ray.data.Dataset":
    """Run the large-star/small-star rounds as task waves; returns the
    converged star edge set as a Dataset (one block per partition)."""
    import ray

    split2 = ray.remote(num_returns=2 * P)(_cc_split2_task)
    ls = ray.remote(num_returns=P)(_cc_ls_task)
    ss = ray.remote(num_returns=2 * P + 1)(_cc_ss_task)

    dirs: list[list] = [[] for _ in range(P)]
    revs: list[list] = [[] for _ in range(P)]
    for ref in E_raw.to_arrow_refs():
        outs = split2.remote(ref, P)
        for i in range(P):
            dirs[i].append(outs[i])
            revs[i].append(outs[P + i])

    M = (1 << 64) - 1
    fp_prev = None
    for _ in range(max_rounds):
        ls_outs = [ls.remote(P, dirs[i], revs[i]) for i in range(P)]
        mid_dirs = [[ls_outs[j][i] for j in range(P)] for i in range(P)]
        ss_outs = [ss.remote(P, mid_dirs[i]) for i in range(P)]
        dirs = [[ss_outs[j][i] for j in range(P)] for i in range(P)]
        revs = [[ss_outs[j][P + i] for j in range(P)] for i in range(P)]
        fps = ray.get([ss_outs[j][2 * P] for j in range(P)])
        fp = tuple(sum(f[k] for f in fps) & M for k in range(4))
        if fp == fp_prev:
            break
        fp_prev = fp
    else:
        raise RuntimeError(f"dup_clusters did not converge in {max_rounds} rounds")

    import ray.data

    flat = [r for part in dirs for r in part]
    return ray.data.from_arrow_refs(flat)





def _cc_driver_numpy(u: np.ndarray, v: np.ndarray) -> pa.Table:
    """Exact CC on the driver: min-label propagation with pointer
    jumping, pure numpy, O(E log V) total work. Small-side path only
    (edge list already < driver_threshold rows)."""
    nodes = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = parent.copy()
        mn = np.minimum(parent[ui], parent[vi])
        np.minimum.at(parent, ui, mn)
        np.minimum.at(parent, vi, mn)
        while True:  # path compression by pointer doubling
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        if np.array_equal(parent, before):
            break
    return pa.table(
        {"doc": pa.array(nodes, pa.int64()), "cluster": pa.array(nodes[parent], pa.int64())}
    )


def dup_clusters(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int = 8,
    max_rounds: int = 64,
    driver_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Connected components over duplicate pairs -> (doc, cluster).

    Near-dup detection (MinHash LSH, SimHash, ngram_jaccard_pairs,
    embedding pairs) emits PAIRS; keeping one document per duplicate
    *cluster* needs their transitive closure.

    Two paths, chosen by the DISTINCT edge count (the pair set is
    already a small fraction of the corpus — this is the classic
    broadcast-the-small-side decision):

    * ``<= driver_threshold`` edges — exact numpy min-label
      propagation with pointer jumping on the driver (a 2M-edge list
      is ~32 MB; milliseconds, no per-round task overhead).
    * above it — alternating large-star / small-star rounds (Kiveris
      et al., "Connected Components in MapReduce and Beyond",
      SoCC'14): each round is a per-node groupby-min plus a
      hash-partitioned join over the EDGE set only (never the
      corpus), converging in O(log^2 n) rounds to star graphs
      centered on each component's minimum id. State is a
      materialized edge Dataset in the object store; the driver sees
      only a 4-number convergence fingerprint per round.

    Output: one row per distinct doc id appearing in ``pairs`` with
    ``cluster`` = min doc id of its component (representatives map to
    themselves). Filter ``doc == cluster`` to pick survivors.
    """

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        # canonical orientation: u (larger) -> v (smaller)
        u, v = np.maximum(a, b), np.minimum(a, b)
        return pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})

    E_raw = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    n_raw = E_raw.count()  # metadata on a materialized dataset, no pass
    if n_raw == 0:
        return ray.data.from_arrow(
            pa.schema([("doc", pa.int64()), ("cluster", pa.int64())]).empty_table()
        )

    if n_raw <= driver_threshold:
        # small side: skip the distributed distinct entirely — the raw
        # edge list fits on the driver (numpy tolerates duplicates)
        import ray as _ray

        tbl = pa.concat_tables(
            _ray.get(E_raw.to_arrow_refs()), promote_options="permissive"
        )
        return ray.data.from_arrow(
            _cc_driver_numpy(
                tbl.column("u").to_numpy(zero_copy_only=False),
                tbl.column("v").to_numpy(zero_copy_only=False),
            )
        )

    # large-star/small-star rounds as raw-task waves (see
    # _cc_star_rounds_tasks for why this is not a Dataset pipeline)
    E = _cc_star_rounds_tasks(E_raw, num_partitions, max_rounds)

    # E is now a union of stars: (v, m) with m = component min
    def labels(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema([("doc", pa.int64()), ("cluster", pa.int64())]).empty_table()
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc": pa.array(np.concatenate([u, v]), pa.int64()),
             "cluster": pa.array(np.concatenate([v, v]), pa.int64())}
        )

    def relabel(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc" not in batch.schema.names:
            return pa.schema([("doc", pa.int64()), ("cluster", pa.int64())]).empty_table()
        return batch.rename_columns(["doc", "cluster"])

    out = (
        E.map_batches(labels, batch_format="pyarrow")
        .groupby("doc")
        .min("cluster")
        .map_batches(relabel, batch_format="pyarrow")
    )
    return out


# ------------------------------------------- paragraph-level dedup

def paragraph_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Corpus-wide exact paragraph dedup (RefinedWeb/C4-style): every
    paragraph that already occurred earlier — in ANY document, ordered
    by (doc_id, paragraph index) — is removed; survivors are rejoined
    with ``sep``. Docs whose every paragraph was removed are dropped.

    Shape: explode to (hash128(para), packed_pos) scalar rows (text
    rides along once), a groupby-min picks each paragraph's first
    occurrence, a hash join + filter keeps winners, and a
    partition-wise vectorized pass reassembles documents (sort by
    (doc, idx) → run-detect → ListArray → binary_join; no per-doc
    Python). packed_pos = doc_id * 2^20 + idx, so doc_id must fit
    2^43 and docs are capped at 2^20 paragraphs.
    """
    from ray.data.aggregate import Min

    PACK = 1 << 20

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col).cast(pa.large_string())
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if (ids >= (1 << 43)).any():
            raise ValueError("doc ids must fit 43 bits for paragraph packing")
        lists = pc.split_pattern(col, sep)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        if (sizes >= PACK).any():
            raise ValueError("document exceeds 2^20 paragraphs")
        flat = pc.list_flatten(lists).cast(pa.large_string())
        row = np.repeat(np.arange(batch.num_rows), sizes)
        starts = np.cumsum(sizes) - sizes
        idx = np.arange(len(row)) - starts[row]

        def h(seed):
            try:
                import polars as pl

                return pl.from_arrow(flat).hash(seed=seed).to_numpy()
            except ImportError:
                return fnv1a(flat, seed=seed)

        return pa.table(
            {
                "doc": pa.array(ids[row], pa.int64()),
                "idx": pa.array(idx, pa.int64()),
                "para": flat,
                "h_lo": pa.array(h(0).view(np.int64), pa.int64()),
                "h_hi": pa.array(h(0x2545F491).view(np.int64), pa.int64()),
                "packed": pa.array(ids[row] * PACK + idx, pa.int64()),
            }
        )

    paras = ds.map_batches(explode, batch_format="pyarrow").materialize()

    win = paras.groupby(["h_lo", "h_hi"]).aggregate(Min("packed", alias_name="w"))

    def norm_win(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns < 3:
            return pa.schema(
                [("k_lo", pa.int64()), ("k_hi", pa.int64()), ("w", pa.int64())]
            ).empty_table()
        return batch.rename_columns(["k_lo", "k_hi", "w"])

    win = (
        win.map_batches(norm_win, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    joined = paras.join(
        win, "inner", num_partitions, on=("h_lo", "h_hi"), right_on=("k_lo", "k_hi")
    )

    def keep_and_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("doc", pa.int64()), ("idx", pa.int64()),
                 ("para", pa.large_string()), ("p", pa.int64())]
            ).empty_table()
        keep = pc.equal(batch.column("packed"), batch.column("w"))
        kept = batch.filter(keep)
        d = kept.column("doc").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc": kept.column("doc"),
                "idx": kept.column("idx"),
                "para": kept.column("para"),
                "p": pa.array((d % num_partitions).astype(np.int64), pa.int64()),
            }
        )

    def reassemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema(
                [(id_col, pa.int64()), ("text", pa.large_string())]
            ).empty_table()
        d = group.column("doc").to_numpy(zero_copy_only=False)
        ix = group.column("idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((ix, d))
        d, ix = d[order], ix[order]
        paras_sorted = group.column("para").take(pa.array(order))
        first = np.concatenate([[True], d[1:] != d[:-1]])
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(d)))
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            paras_sorted.combine_chunks()
            if isinstance(paras_sorted, pa.ChunkedArray) else paras_sorted,
        )
        return pa.table(
            {
                id_col: pa.array(d[starts], pa.int64()),
                "text": pc.binary_join(lists, pa.scalar(sep, pa.large_string())),
            }
        )

    return (
        joined.map_batches(keep_and_part, batch_format="pyarrow")
        .groupby("p")
        .map_groups(reassemble, batch_format="pyarrow")
    )


# ------------------------------------------- incremental exact dedup

def exact_dedup_incremental(
    store_dir: str,
    ds: "ray.data.Dataset",
    ingest_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 16,
) -> "ray.data.Dataset":
    """Continuous-ingestion exact dedup: accept only documents whose
    content was never seen in ANY previous ingest, recording accepted
    fingerprints in a hash-partitioned parquet store.

    The store is ``store_dir/part=NN/seg-<ingest_id>.parquet`` —
    append-only segments, one partition per hash bucket. Each bucket
    is processed by exactly ONE task per ingest (the groupby
    guarantees exclusivity, so there are no concurrent writers), which
    dedups the increment locally (keep min id), anti-joins against its
    bucket's existing segments, and writes its new fingerprints as a
    segment named by ``ingest_id`` — re-running the same ingest
    overwrites the same segment (idempotent resume; same recovery
    contract as the index build's manifests).

    Returns the ACCEPTED rows (id_col, h_lo, h_hi). At 10^12 docs the
    state is 16 bytes/unique-doc spread over n_parts buckets; size
    n_parts so one bucket's segments fit a worker (the same knob as
    the index's lexicon buckets).

    The result is ``materialize()``d before returning: segment writes
    are a side effect of each bucket's task, so every bucket must
    execute even when the caller consumes only part of the output
    (``limit``/``take``) — otherwise the store would be silently
    missing fingerprints for unconsumed buckets. The materialized set
    is the accepted increment (bounded by the ingest size, not the
    store size).
    """
    import os

    from ..utils import atomic_write_table

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).cast(pa.large_string())

        def h(seed):
            try:
                import polars as pl

                return pl.from_arrow(texts).hash(seed=seed).to_numpy()
            except ImportError:
                return fnv1a(texts, seed=seed)

        lo = h(0).view(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                "h_lo": pa.array(lo, pa.int64()),
                "h_hi": pa.array(h(0x9E3779B9).view(np.int64), pa.int64()),
                "p": pa.array(
                    (lo.view(np.uint64) % np.uint64(n_parts)).astype(np.int64), pa.int64()
                ),
            }
        )

    def check_and_commit(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema(
                [(id_col, pa.int64()), ("h_lo", pa.int64()), ("h_hi", pa.int64())]
            ).empty_table()
        part = int(group.column("p")[0].as_py())
        lo = group.column("h_lo").to_numpy(zero_copy_only=False)
        hi = group.column("h_hi").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        # within-increment: keep min id per fingerprint
        order = np.lexsort((ids, hi, lo))
        lo, hi, ids = lo[order], hi[order], ids[order]
        first = np.concatenate([[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
        lo, hi, ids = lo[first], hi[first], ids[first]
        # anti-join against this bucket's prior segments
        pdir = os.path.join(store_dir, f"part={part:02d}")
        seen_lo, seen_hi = [], []
        if os.path.isdir(pdir):
            import pyarrow.parquet as pq

            for seg in sorted(os.listdir(pdir)):
                if not seg.endswith(".parquet") or seg == f"seg-{ingest_id}.parquet":
                    continue  # skip own segment from a crashed retry
                t = pq.read_table(os.path.join(pdir, seg), columns=["h_lo", "h_hi"])
                seen_lo.append(t.column("h_lo").to_numpy(zero_copy_only=False))
                seen_hi.append(t.column("h_hi").to_numpy(zero_copy_only=False))
        if seen_lo:
            pair_t = np.dtype([("a", "<i8"), ("b", "<i8")])
            seen = np.empty(sum(map(len, seen_lo)), pair_t)
            seen["a"] = np.concatenate(seen_lo)
            seen["b"] = np.concatenate(seen_hi)
            seen.sort()
            q = np.empty(len(lo), pair_t)
            q["a"], q["b"] = lo, hi
            # vectorized 128-bit membership: structured searchsorted
            pos = np.searchsorted(seen, q)
            pos_c = np.minimum(pos, len(seen) - 1)
            new = ~((seen[pos_c]["a"] == lo) & (seen[pos_c]["b"] == hi) & (pos < len(seen)))
            lo, hi, ids = lo[new], hi[new], ids[new]
        out = pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "h_lo": pa.array(lo, pa.int64()),
                "h_hi": pa.array(hi, pa.int64()),
            }
        )
        atomic_write_table(
            out.select(["h_lo", "h_hi"]),
            os.path.join(pdir, f"seg-{ingest_id}.parquet"),
        )
        return out

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("p")
        .map_groups(check_and_commit, batch_format="pyarrow")
        .materialize()
    )
