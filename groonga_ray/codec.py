"""Posting-list codec: delta + varbyte streams with chunked skip pointers.

Role model (semantics only, no code shared): Groonga's grn_ii posting
payload — per term, parallel delta streams ``[rid-gaps][tf-1][pos-gaps]``
(reference lib/ii.c:2548-2556, grn_p_encv lib/ii.c:1530) packed into
immutable chunks whose ``chunk_info{segno,size,dgap}`` directory doubles
as a skip table (lib/ii.c:2491-2495, grn_ii_cursor_set_min
lib/ii.c:4143). Here:

* every stream is LEB128 varbyte (7 data bits / byte, MSB = continue),
  encoded/decoded fully vectorized in numpy;
* postings are split into chunks of ``CHUNK_POSTINGS`` entries; the
  per-chunk directory stores ``(n, first_docid, last_docid, max_tf,
  end-offsets into each stream region)`` — ``last_docid`` is the skip
  pointer, ``max_tf`` is the block-max needed by block-max WAND;
* each chunk is self-contained: its first docid is stored absolute, so
  chunk directories of two docid-disjoint runs concatenate losslessly
  (the analogue of Groonga's CHUNK_SPLIT multi-chunk form, which is what
  makes hot-term salting exact).

A "posting table" is an Arrow table with one row per term:

    term:   large_string
    df:     uint64            number of postings (== docs, single section)
    cf:     uint64            sum of tf
    cn:     list<uint32>      postings per chunk
    cfirst: list<uint64>      first docid per chunk (absolute)
    clast:  list<uint64>      last docid per chunk (skip pointer)
    cmaxtf: list<uint32>      max tf per chunk (block max)
    cdoff:  list<uint32>      end byte offset per chunk into `docs`
    ctoff:  list<uint32>      end byte offset per chunk into `tfs`
    cpoff:  list<uint32>      end byte offset per chunk into `poss`
    docs:   large_binary      varbyte docid-gap stream (term-relative)
    tfs:    large_binary      varbyte (tf-1) stream
    poss:   large_binary      varbyte position-gap stream ('' if no positions)

The three binary columns are built zero-copy as offset slices into one
contiguous encoded buffer per stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

CHUNK_POSTINGS = 4096

POSTING_SCHEMA = pa.schema(
    [
        ("term", pa.large_string()),
        ("df", pa.uint64()),
        ("cf", pa.uint64()),
        ("cn", pa.list_(pa.uint32())),
        ("cfirst", pa.list_(pa.uint64())),
        ("clast", pa.list_(pa.uint64())),
        ("cmaxtf", pa.list_(pa.uint32())),
        ("cdoff", pa.list_(pa.uint32())),
        ("ctoff", pa.list_(pa.uint32())),
        ("cpoff", pa.list_(pa.uint32())),
        ("docs", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("poss", pa.large_binary()),
    ]
)


# ---------------------------------------------------------------- varbyte

def vb_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint array, vectorized.

    Returns ``(buf, lens)``: the byte stream as a uint8 array and the
    per-value byte length (for offset arithmetic).
    """
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    amax = int(a.max())
    if amax < 0x80:
        # tf-1 and position-gap streams are almost always all-1-byte
        return a.astype(np.uint8), np.ones(n, np.int64)
    if amax < 0x4000:
        two = a >= np.uint64(0x80)
        lens = np.ones(n, np.int64)
        lens[two] = 2
        ends = np.cumsum(lens)
        starts = ends - lens
        buf = np.empty(int(ends[-1]), np.uint8)
        lo = (a & np.uint64(0x7F)).astype(np.uint8)
        lo[two] |= 0x80
        buf[starts] = lo
        buf[starts[two] + 1] = (a[two] >> np.uint64(7)).astype(np.uint8)
        return buf, lens
    if amax < 0x200000:
        # <= 3-byte fast path: docid-gap streams of multi-million-doc
        # corpora land here (values < 2^21); two masked writes instead
        # of the general max_len-pass loop
        lens = np.ones(n, np.int64)
        lens += a >= np.uint64(0x80)
        lens += a >= np.uint64(0x4000)
        ends = np.cumsum(lens)
        starts = ends - lens
        buf = np.empty(int(ends[-1]), np.uint8)
        b0 = (a & np.uint64(0x7F)).astype(np.uint8)
        multi = lens > 1
        b0[multi] |= 0x80
        buf[starts] = b0
        b1 = ((a[multi] >> np.uint64(7)) & np.uint64(0x7F)).astype(np.uint8)
        three = lens == 3
        b1[three[multi]] |= 0x80
        buf[starts[multi] + 1] = b1
        buf[starts[three] + 2] = (a[three] >> np.uint64(14)).astype(np.uint8)
        return buf, lens
    lens = np.ones(n, np.int64)
    v = a >> np.uint64(7)
    while v.any():
        lens += (v > 0)
        v >>= np.uint64(7)
    ends = np.cumsum(lens)
    starts = ends - lens
    buf = np.zeros(int(ends[-1]), np.uint8)
    max_len = int(lens.max())
    for j in range(max_len):
        m = lens > j
        byte = ((a[m] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (j < lens[m] - 1).astype(np.uint8) << 7
        buf[starts[m] + j] = byte | cont
    return buf, lens


def vb_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a full LEB128 stream (uint8 array) to uint64 values."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, memoryview)) else buf
    if len(b) == 0:
        return np.empty(0, np.uint64)
    high = b & 0x80
    if not high.any():
        # all-1-byte stream (typical for tf-1 / position gaps)
        return b.astype(np.uint64)
    ends = np.flatnonzero(high == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    n = len(ends)
    out = np.zeros(n, np.uint64)
    max_len = int(lens.max())
    for j in range(max_len):
        m = lens > j
        out[m] |= (b[starts[m] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return out


# ------------------------------------------------------- helper: grouped ops

def _segmented_abs_from_gaps(gaps: np.ndarray, seg_starts_mask: np.ndarray) -> np.ndarray:
    """Cumsum of gaps that restarts at every position where mask is True.

    The value at a segment start is taken as absolute (the gap stream
    stores absolute values at chunk starts).
    """
    c = np.cumsum(gaps, dtype=np.uint64)
    start_idx = np.flatnonzero(seg_starts_mask)
    # value to subtract within each segment = c just before the segment start
    base = np.zeros(len(start_idx), np.uint64)
    base[1:] = c[start_idx[1:] - 1]
    if len(start_idx) and start_idx[0] != 0:
        base[0] = c[start_idx[0] - 1]
    seg_id = np.cumsum(seg_starts_mask) - 1
    return c - base[seg_id]


def _gaps_from_abs(values: np.ndarray, seg_starts_mask: np.ndarray) -> np.ndarray:
    """Delta-encode, storing the absolute value at each segment start."""
    v = values.astype(np.uint64, copy=False)
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    gaps[seg_starts_mask] = v[seg_starts_mask]
    return gaps


# ------------------------------------------------------------------ encode

def encode_posting_table(
    terms: pa.Array,
    term_offsets: np.ndarray,
    docids: np.ndarray,
    tfs: np.ndarray,
    pos_offsets: np.ndarray | None = None,
    positions: np.ndarray | None = None,
    chunk_postings: int = CHUNK_POSTINGS,
) -> pa.Table:
    """Encode sorted postings into a one-row-per-term posting table.

    Inputs are the exploded, **(term, docid)-sorted** posting arrays:

    * ``terms``: arrow string array of T unique terms (sorted order not
      required here; rows inherit input order),
    * ``term_offsets``: int64 (T+1) boundaries into the posting arrays,
    * ``docids``: uint64 (P) strictly increasing within each term,
    * ``tfs``: uint32 (P),
    * ``positions``/``pos_offsets``: optional flattened per-posting
      position lists (pos_offsets is P+1 boundaries into positions).

    Everything is vectorized across the whole input; there is no
    per-term Python loop.
    """
    P = len(docids)
    T = len(terms)
    term_offsets = np.asarray(term_offsets, dtype=np.int64)
    counts = np.diff(term_offsets)
    if P == 0:
        return POSTING_SCHEMA.empty_table()
    docids = docids.astype(np.uint64, copy=False)
    tfs = tfs.astype(np.uint64, copy=False)

    local_idx = np.arange(P, dtype=np.int64) - np.repeat(term_offsets[:-1], counts)
    chunk_start = (local_idx % chunk_postings) == 0
    chunk_id = np.cumsum(chunk_start) - 1          # global chunk index per posting
    n_chunks = int(chunk_id[-1]) + 1
    chunk_starts_idx = np.flatnonzero(chunk_start)  # posting index of each chunk start
    chunk_ends_idx = np.empty(n_chunks, np.int64)
    chunk_ends_idx[:-1] = chunk_starts_idx[1:] - 1
    chunk_ends_idx[-1] = P - 1

    # ---- chunk directory values
    cn = (chunk_ends_idx - chunk_starts_idx + 1).astype(np.uint32)
    cfirst = docids[chunk_starts_idx]
    clast = docids[chunk_ends_idx]
    cmaxtf = np.maximum.reduceat(tfs, chunk_starts_idx).astype(np.uint32)

    # chunks per term (for list offsets)
    term_of_chunk = np.repeat(np.arange(T, dtype=np.int64), np.ceil(counts / chunk_postings).astype(np.int64))
    chunks_per_term = np.bincount(term_of_chunk, minlength=T).astype(np.int64)
    chunk_list_offsets = np.zeros(T + 1, np.int64)
    np.cumsum(chunks_per_term, out=chunk_list_offsets[1:])

    # ---- doc gap stream
    doc_gaps = _gaps_from_abs(docids, chunk_start)
    doc_buf, doc_lens = vb_encode(doc_gaps)
    doc_ends = np.cumsum(doc_lens)
    # per-term region boundaries (bytes)
    term_doc_end = doc_ends[term_offsets[1:] - 1]
    term_doc_start = np.zeros(T, np.int64)
    term_doc_start[1:] = term_doc_end[:-1]
    # per-chunk end offsets relative to the term region start
    cdoff = (doc_ends[chunk_ends_idx] - term_doc_start[term_of_chunk]).astype(np.uint32)

    # ---- tf stream (tf-1)
    tf_buf, tf_lens = vb_encode(tfs - np.uint64(1))
    tf_ends = np.cumsum(tf_lens)
    term_tf_end = tf_ends[term_offsets[1:] - 1]
    term_tf_start = np.zeros(T, np.int64)
    term_tf_start[1:] = term_tf_end[:-1]
    ctoff = (tf_ends[chunk_ends_idx] - term_tf_start[term_of_chunk]).astype(np.uint32)

    # ---- position stream
    if positions is not None and pos_offsets is not None and len(positions):
        pos_offsets = np.asarray(pos_offsets, dtype=np.int64)
        # first position of each posting absolute, rest delta
        posting_start_mask = np.zeros(len(positions), bool)
        posting_start_mask[pos_offsets[:-1][pos_offsets[:-1] < len(positions)]] = True
        pos_gaps = _gaps_from_abs(positions.astype(np.uint64, copy=False), posting_start_mask)
        pos_buf, pos_lens = vb_encode(pos_gaps)
        pos_val_ends = np.cumsum(pos_lens)
        # byte length consumed by each posting's positions
        posting_end_val = pos_offsets[1:] - 1          # last position index per posting
        posting_pos_bytes_end = np.where(
            pos_offsets[1:] > pos_offsets[:-1], pos_val_ends[np.clip(posting_end_val, 0, None)], 0
        )
        # carry-forward for empty postings (none expected: tf >= 1)
        posting_pos_bytes_end = np.maximum.accumulate(posting_pos_bytes_end)
        term_pos_end = posting_pos_bytes_end[term_offsets[1:] - 1]
        term_pos_start = np.zeros(T, np.int64)
        term_pos_start[1:] = term_pos_end[:-1]
        cpoff = (posting_pos_bytes_end[chunk_ends_idx] - term_pos_start[term_of_chunk]).astype(np.uint32)
        pos_term_offsets = np.zeros(T + 1, np.int64)
        pos_term_offsets[1:] = term_pos_end
    else:
        pos_buf = np.empty(0, np.uint8)
        cpoff = np.zeros(n_chunks, np.uint32)
        pos_term_offsets = np.zeros(T + 1, np.int64)

    # ---- assemble arrow arrays (zero-copy slicing via offsets)
    doc_term_offsets = np.zeros(T + 1, np.int64)
    doc_term_offsets[1:] = term_doc_end
    tf_term_offsets = np.zeros(T + 1, np.int64)
    tf_term_offsets[1:] = term_tf_end

    def bin_col(buf: np.ndarray, offsets: np.ndarray) -> pa.Array:
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), T, [None, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(buf))]
        )

    def list_col(values: np.ndarray, patype) -> pa.Array:
        return pa.ListArray.from_arrays(
            pa.array(chunk_list_offsets, type=pa.int32()), pa.array(values, type=patype)
        )

    df = counts.astype(np.uint64)
    cf = np.add.reduceat(tfs, term_offsets[:-1]).astype(np.uint64)

    return pa.table(
        {
            "term": pa.array(terms, type=pa.large_string()) if not isinstance(terms, pa.Array) else terms.cast(pa.large_string()),
            "df": pa.array(df, type=pa.uint64()),
            "cf": pa.array(cf, type=pa.uint64()),
            "cn": list_col(cn, pa.uint32()),
            "cfirst": list_col(cfirst, pa.uint64()),
            "clast": list_col(clast, pa.uint64()),
            "cmaxtf": list_col(cmaxtf, pa.uint32()),
            "cdoff": list_col(cdoff, pa.uint32()),
            "ctoff": list_col(ctoff, pa.uint32()),
            "cpoff": list_col(cpoff, pa.uint32()),
            "docs": bin_col(doc_buf, doc_term_offsets),
            "tfs": bin_col(tf_buf, tf_term_offsets),
            "poss": bin_col(pos_buf, pos_term_offsets),
        }
    )


# ------------------------------------------------------------------ decode

@dataclass
class PostingList:
    """Decoded postings of one term (optionally a docid range of it)."""

    docids: np.ndarray     # uint64
    tfs: np.ndarray        # uint64
    positions: np.ndarray | None = None      # flattened uint64
    pos_offsets: np.ndarray | None = None    # (n+1) int64 boundaries

    def __len__(self) -> int:
        return len(self.docids)


def decode_postings(
    row: dict,
    min_docid: int | None = None,
    with_positions: bool = False,
) -> PostingList:
    """Decode one posting-table row (as a python dict of buffers/lists).

    ``min_docid`` skips whole chunks whose ``clast < min_docid`` without
    decoding them — the analogue of grn_ii_cursor_set_min
    (reference lib/ii.c:4143-4171).
    """
    clast = np.asarray(row["clast"], dtype=np.uint64)
    cn = np.asarray(row["cn"], dtype=np.int64)
    cdoff = np.asarray(row["cdoff"], dtype=np.int64)
    ctoff = np.asarray(row["ctoff"], dtype=np.int64)
    cpoff = np.asarray(row["cpoff"], dtype=np.int64)
    first_chunk = 0
    if min_docid is not None and len(clast):
        first_chunk = int(np.searchsorted(clast, np.uint64(min_docid), side="left"))
        if first_chunk >= len(clast):
            return PostingList(np.empty(0, np.uint64), np.empty(0, np.uint64))

    dstart = int(cdoff[first_chunk - 1]) if first_chunk else 0
    tstart = int(ctoff[first_chunk - 1]) if first_chunk else 0
    pstart = int(cpoff[first_chunk - 1]) if first_chunk else 0

    docs_b = np.frombuffer(row["docs"], np.uint8)[dstart:]
    tfs_b = np.frombuffer(row["tfs"], np.uint8)[tstart:]
    gaps = vb_decode(docs_b)
    n = len(gaps)
    # chunk starts within the decoded range (local posting index)
    kept_cn = cn[first_chunk:]
    starts_local = np.zeros(len(kept_cn), np.int64)
    np.cumsum(kept_cn[:-1], out=starts_local[1:])
    start_mask = np.zeros(n, bool)
    start_mask[starts_local] = True
    docids = _segmented_abs_from_gaps(gaps, start_mask)
    tfs = vb_decode(tfs_b) + np.uint64(1)

    positions = pos_offsets = None
    if with_positions and len(row["poss"]) > pstart:
        pos_b = np.frombuffer(row["poss"], np.uint8)[pstart:]
        pos_gaps = vb_decode(pos_b)
        pos_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(tfs.astype(np.int64), out=pos_offsets[1:])
        pmask = np.zeros(len(pos_gaps), bool)
        pmask[pos_offsets[:-1]] = True
        positions = _segmented_abs_from_gaps(pos_gaps, pmask)
    return PostingList(docids, tfs, positions, pos_offsets)


def decode_chunks(row: dict, c0: int, c1: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode ONLY chunks [c0, c1) of a posting row -> (docids, tfs).

    The byte ranges come straight from the chunk directory's end
    offsets — this is the lazy path block-max WAND uses to decode a
    docid window without touching the rest of the term
    (grn_ii_cursor_set_min analogue at chunk granularity)."""
    cn = np.asarray(row["cn"], np.int64)[c0:c1]
    cdoff = np.asarray(row["cdoff"], np.int64)
    ctoff = np.asarray(row["ctoff"], np.int64)
    dstart = int(cdoff[c0 - 1]) if c0 else 0
    tstart = int(ctoff[c0 - 1]) if c0 else 0
    docs_b = np.frombuffer(row["docs"], np.uint8)[dstart : int(cdoff[c1 - 1])]
    tfs_b = np.frombuffer(row["tfs"], np.uint8)[tstart : int(ctoff[c1 - 1])]
    gaps = vb_decode(docs_b)
    starts_local = np.zeros(len(cn), np.int64)
    np.cumsum(cn[:-1], out=starts_local[1:])
    mask = np.zeros(len(gaps), bool)
    mask[starts_local] = True
    docids = _segmented_abs_from_gaps(gaps, mask)
    tfs = vb_decode(tfs_b) + np.uint64(1)
    return docids, tfs


def _gather_binary(col: pa.Array, order: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate the given rows of a large_binary column in ``order``
    into one contiguous uint8 buffer. Returns (buffer, row_byte_lens)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    data = col.buffers()[2]
    buf = np.frombuffer(data, np.uint8) if data is not None else np.empty(0, np.uint8)
    offsets = np.frombuffer(col.buffers()[1], np.int64)[col.offset : col.offset + len(col) + 1]
    starts = offsets[:-1][order]
    lens = np.diff(offsets)[order]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.uint8), lens
    out_off = np.zeros(len(order) + 1, np.int64)
    np.cumsum(lens, out=out_off[1:])
    gather = (
        np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], lens) + np.repeat(starts, lens)
    )
    return buf[gather], lens


def bulk_decode_rows(
    table: pa.Table, order: np.ndarray, with_positions: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, np.ndarray]:
    """Decode many posting rows at once, fully vectorized.

    ``order`` selects and orders the rows (e.g. sorted by term, first
    docid). Returns ``(docids, tfs, positions, row_offsets)`` where
    ``row_offsets`` (len R+1) bounds each row's postings in the flat
    arrays. Positions are None when absent.
    """
    dfs = np.asarray(table.column("df").to_numpy(zero_copy_only=False), dtype=np.int64)[order]
    cn_col = table.column("cn")
    if isinstance(cn_col, pa.ChunkedArray):
        cn_col = cn_col.combine_chunks()
    cn_offsets = cn_col.offsets.to_numpy().astype(np.int64)
    cn_values = cn_col.values.to_numpy().astype(np.int64)
    # flattened chunk sizes in `order`
    cn_lens = np.diff(cn_offsets)[order]
    total_chunks = int(cn_lens.sum())
    gather = (
        np.arange(total_chunks, dtype=np.int64)
        - np.repeat(np.cumsum(cn_lens) - cn_lens, cn_lens)
        + np.repeat(cn_offsets[:-1][order], cn_lens)
    )
    chunk_sizes = cn_values[gather]

    doc_buf, _ = _gather_binary(table.column("docs"), order)
    gaps = vb_decode(doc_buf)
    P = len(gaps)
    chunk_start_pos = np.cumsum(chunk_sizes) - chunk_sizes
    mask = np.zeros(P, bool)
    mask[chunk_start_pos] = True
    docids = _segmented_abs_from_gaps(gaps, mask)

    tf_buf, _ = _gather_binary(table.column("tfs"), order)
    tfs = vb_decode(tf_buf) + np.uint64(1)

    row_offsets = np.zeros(len(order) + 1, np.int64)
    np.cumsum(dfs, out=row_offsets[1:])

    positions = None
    if with_positions:
        pos_buf, _ = _gather_binary(table.column("poss"), order)
        if len(pos_buf):
            pos_gaps = vb_decode(pos_buf)
            pos_starts = np.cumsum(tfs.astype(np.int64)) - tfs.astype(np.int64)
            pmask = np.zeros(len(pos_gaps), bool)
            pmask[pos_starts] = True
            positions = _segmented_abs_from_gaps(pos_gaps, pmask)
    return docids, tfs, positions, row_offsets


def merge_posting_rows(rows: list[dict], chunk_postings: int = CHUNK_POSTINGS) -> dict:
    """Merge docid-disjoint posting rows of the SAME term into one row by
    decoding and re-encoding — yields the canonical chunking, identical
    to a single-shot encode. Rows must be in ascending docid-range order
    (the salted-build invariant). For very large (hot) terms use
    :func:`concat_posting_rows` instead, which never decodes.
    """
    term = rows[0]["term"]
    parts = [decode_postings(r, with_positions=len(r["poss"]) > 0) for r in rows]
    docids = np.concatenate([p.docids for p in parts])
    tfs = np.concatenate([p.tfs for p in parts])
    if parts[0].positions is not None:
        positions = np.concatenate([p.positions for p in parts])
        pos_offsets = np.zeros(len(docids) + 1, np.int64)
        np.cumsum(tfs.astype(np.int64), out=pos_offsets[1:])
    else:
        positions = pos_offsets = None
    t = encode_posting_table(
        pa.array([term], type=pa.large_string()),
        np.array([0, len(docids)], np.int64),
        docids,
        tfs,
        pos_offsets,
        positions,
        chunk_postings=chunk_postings,
    )
    return {c: t.column(c)[0].as_py() for c in t.column_names}


def concat_posting_table_groups(
    table: pa.Table, order: np.ndarray, group_start_mask: np.ndarray
) -> pa.Table:
    """Vectorized grouped chunk-directory concatenation (no decode).

    ``order`` arranges the input rows; consecutive rows where
    ``group_start_mask`` is False merge into the preceding start row
    (rows of one group must be docid-range-ascending — the salted-build
    invariant). Semantically identical to calling
    :func:`concat_posting_rows` per group, but with no per-row Python:
    the skew path (hot terms are by construction the *largest* rows)
    must be the vectorized path. Returns one POSTING_SCHEMA row per
    group.
    """
    order = np.asarray(order, np.int64)
    group_start_mask = np.asarray(group_start_mask, bool)
    starts = np.flatnonzero(group_start_mask)           # positions in `order`
    G = len(starts)
    gid = np.cumsum(group_start_mask) - 1               # group of each ordered row

    def _col(name):
        c = table.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    terms = _col("term").take(pa.array(order[starts]))
    df_all = table.column("df").to_numpy(zero_copy_only=False).astype(np.uint64)[order]
    cf_all = table.column("cf").to_numpy(zero_copy_only=False).astype(np.uint64)[order]
    df = np.add.reduceat(df_all, starts)
    cf = np.add.reduceat(cf_all, starts)

    # per-row byte lengths of each binary stream (for offset rebasing)
    bin_parts: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    row_buf_lens: dict[str, np.ndarray] = {}
    for name in ("docs", "tfs", "poss"):
        buf, lens = _gather_binary(_col(name), order)
        bin_parts[name] = (buf, lens)
        row_buf_lens[name] = lens.astype(np.int64)

    # list columns: flatten in `order`, regroup with per-group offsets
    out_arrays: dict[str, pa.Array] = {}
    list_offsets_per_group: np.ndarray | None = None
    for name, off_src in (
        ("cn", None), ("cfirst", None), ("clast", None), ("cmaxtf", None),
        ("cdoff", "docs"), ("ctoff", "tfs"), ("cpoff", "poss"),
    ):
        col = _col(name)
        offs = col.offsets.to_numpy().astype(np.int64)
        vals = col.values.to_numpy(zero_copy_only=False)
        row_lens = np.diff(offs)[order]
        total = int(row_lens.sum())
        out_off = np.zeros(len(order) + 1, np.int64)
        np.cumsum(row_lens, out=out_off[1:])
        gather = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_off[:-1], row_lens)
            + np.repeat(offs[:-1][order], row_lens)
        )
        flat = vals[gather].astype(np.int64)
        if off_src is not None:
            # rebase: each row's offsets shift by the byte length of the
            # prior rows of ITS group in the matching stream
            lens = row_buf_lens[off_src]
            excl = np.cumsum(lens) - lens                 # global exclusive cumsum
            base_of_group = excl[starts][gid]             # group-start exclusive pos
            row_base = excl - base_of_group               # within-group base per row
            flat = flat + np.repeat(row_base, row_lens)
        group_lens = np.add.reduceat(row_lens, starts) if G else np.empty(0, np.int64)
        goff = np.zeros(G + 1, np.int32)
        np.cumsum(group_lens, out=goff[1:])
        typ = pa.uint64() if name in ("cfirst", "clast") else pa.uint32()
        out_arrays[name] = pa.ListArray.from_arrays(
            pa.array(goff, pa.int32()), pa.array(flat.astype(np.uint64), typ)
        )
        if list_offsets_per_group is None:
            list_offsets_per_group = goff

    # binary columns: group-concatenated buffers
    for name in ("docs", "tfs", "poss"):
        buf, lens = bin_parts[name]
        group_lens = np.add.reduceat(lens.astype(np.int64), starts) if G else np.empty(0, np.int64)
        goff = np.zeros(G + 1, np.int64)
        np.cumsum(group_lens, out=goff[1:])
        out_arrays[name] = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), G,
            [None, pa.py_buffer(goff), pa.py_buffer(np.ascontiguousarray(buf))],
        )

    return pa.table(
        {
            "term": terms.cast(pa.large_string()),
            "df": pa.array(df, pa.uint64()),
            "cf": pa.array(cf, pa.uint64()),
            "cn": out_arrays["cn"],
            "cfirst": out_arrays["cfirst"],
            "clast": out_arrays["clast"],
            "cmaxtf": out_arrays["cmaxtf"],
            "cdoff": out_arrays["cdoff"],
            "ctoff": out_arrays["ctoff"],
            "cpoff": out_arrays["cpoff"],
            "docs": out_arrays["docs"],
            "tfs": out_arrays["tfs"],
            "poss": out_arrays["poss"],
        }
    )


def concat_posting_rows(rows: list[dict]) -> dict:
    """Chunk-directory concatenation of docid-disjoint rows (no decode).

    This is the scale path for hot (salted) terms: byte regions and
    chunk directories are concatenated; each chunk stays self-contained
    because its first docid is stored absolute.
    """
    out = dict(rows[0])
    out["df"] = int(sum(int(r["df"]) for r in rows))
    out["cf"] = int(sum(int(r["cf"]) for r in rows))
    for key in ("cn", "cfirst", "clast", "cmaxtf"):
        out[key] = [v for r in rows for v in r[key]]
    for off_key, buf_key in (("cdoff", "docs"), ("ctoff", "tfs"), ("cpoff", "poss")):
        offs: list[int] = []
        base = 0
        for r in rows:
            offs.extend(base + int(v) for v in r[off_key])
            base += len(r[buf_key])
        out[off_key] = offs
        out[buf_key] = b"".join(bytes(r[buf_key]) for r in rows)
    return out
