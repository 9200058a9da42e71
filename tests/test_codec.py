"""Round-trip and merge tests for the posting codec (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pytest

from groonga_ray import codec


rng = np.random.default_rng(42)


def test_varbyte_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 300, 16383, 16384, 2**31, 2**40], np.uint64)
    buf, lens = codec.vb_encode(vals)
    assert lens.tolist() == [1, 1, 1, 2, 2, 2, 3, 5, 6]
    out = codec.vb_decode(buf)
    assert out.tolist() == vals.tolist()


def test_varbyte_roundtrip_random():
    vals = rng.integers(0, 2**40, size=10_000).astype(np.uint64)
    buf, _ = codec.vb_encode(vals)
    assert codec.vb_decode(buf).tolist() == vals.tolist()


@pytest.mark.parametrize(
    "hi", [0x7F, 0x80, 0x3FFF, 0x4000, 2**21, 2**40]
)
def test_varbyte_roundtrip_each_width_path(hi):
    """Each specialized encode path (1-byte, 2-byte, general) agrees
    with the decoder, including streams pinned just at the thresholds."""
    r = np.random.default_rng(hi)
    vals = r.integers(0, hi + 1, size=5_000).astype(np.uint64)
    vals[0] = hi  # force the path selector to see the boundary value
    buf, lens = codec.vb_encode(vals)
    assert int(lens.sum()) == len(buf)
    out = codec.vb_decode(buf)
    assert np.array_equal(out, vals)
    # byte-level parity with the reference LEB128 definition
    ref = bytearray()
    for v in vals[:64].tolist():
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                ref.append(b | 0x80)
            else:
                ref.append(b)
                break
    assert bytes(buf[: len(ref)].tobytes()) == bytes(ref)


def _random_postings(n_terms=50, max_df=600, with_positions=True, seed=7):
    r = np.random.default_rng(seed)
    terms, term_offsets = [], [0]
    docids_all, tfs_all, pos_all, pos_offsets = [], [], [], [0]
    for t in range(n_terms):
        df = int(r.integers(1, max_df))
        docids = np.unique(r.integers(0, 10 * max_df, size=df).astype(np.uint64))
        tfs = r.integers(1, 8, size=len(docids)).astype(np.uint64)
        terms.append(f"term{t:04d}")
        term_offsets.append(term_offsets[-1] + len(docids))
        docids_all.append(docids)
        tfs_all.append(tfs)
        if with_positions:
            for tf in tfs:
                p = np.sort(r.choice(5000, size=int(tf), replace=False)).astype(np.uint64)
                pos_all.append(p)
                pos_offsets.append(pos_offsets[-1] + int(tf))
    return (
        pa.array(terms, type=pa.large_string()),
        np.array(term_offsets, np.int64),
        np.concatenate(docids_all),
        np.concatenate(tfs_all),
        np.array(pos_offsets, np.int64) if with_positions else None,
        np.concatenate(pos_all) if with_positions else None,
    )


@pytest.mark.parametrize("with_positions", [False, True])
@pytest.mark.parametrize("chunk", [7, 4096])
def test_posting_roundtrip(with_positions, chunk):
    terms, toff, docids, tfs, poff, pos = _random_postings(with_positions=with_positions)
    table = codec.encode_posting_table(terms, toff, docids, tfs, poff, pos, chunk_postings=chunk)
    assert table.num_rows == len(terms)
    for i in range(len(terms)):
        row = {c: table.column(c)[i].as_py() for c in table.column_names}
        pl = codec.decode_postings(row, with_positions=with_positions)
        lo, hi = toff[i], toff[i + 1]
        assert pl.docids.tolist() == docids[lo:hi].tolist()
        assert pl.tfs.tolist() == tfs[lo:hi].tolist()
        assert int(row["df"]) == hi - lo
        assert int(row["cf"]) == int(tfs[lo:hi].sum())
        # chunk dir invariants
        assert row["clast"][-1] == docids[hi - 1]
        assert row["cfirst"][0] == docids[lo]
        assert max(row["cmaxtf"]) == int(tfs[lo:hi].max())
        if with_positions:
            plo, phi = poff[lo], poff[hi]
            assert pl.positions.tolist() == pos[plo:phi].tolist()


def test_decode_min_docid_skips_chunks():
    terms, toff, docids, tfs, poff, pos = _random_postings(n_terms=1, max_df=500, seed=3)
    table = codec.encode_posting_table(terms, toff, docids, tfs, poff, pos, chunk_postings=32)
    row = {c: table.column(c)[0].as_py() for c in table.column_names}
    mid = int(docids[len(docids) // 2])
    pl = codec.decode_postings(row, min_docid=mid, with_positions=True)
    # all postings >= some chunk boundary <= mid must be present
    assert pl.docids.max() == docids.max()
    assert mid in pl.docids.tolist()
    # nothing beyond one chunk of slack below mid
    full = codec.decode_postings(row, with_positions=True)
    idx = np.searchsorted(full.docids, pl.docids[0])
    assert full.docids[idx:].tolist() == pl.docids.tolist()
    assert full.tfs[idx:].tolist() == pl.tfs.tolist()
    # positions of the suffix survive the skip
    pstart = int(full.pos_offsets[idx])
    assert full.positions[pstart:].tolist() == pl.positions.tolist()


def test_merge_and_concat_equal_single_shot():
    terms, toff, docids, tfs, poff, pos = _random_postings(n_terms=1, max_df=900, seed=11)
    full_table = codec.encode_posting_table(terms, toff, docids, tfs, poff, pos, chunk_postings=64)
    full_row = {c: full_table.column(c)[0].as_py() for c in full_table.column_names}

    # split into 3 docid-disjoint runs, encode separately
    n = len(docids)
    cuts = [0, n // 3, 2 * n // 3, n]
    rows = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        t = codec.encode_posting_table(
            terms,
            np.array([0, b - a], np.int64),
            docids[a:b],
            tfs[a:b],
            (poff[a : b + 1] - poff[a]) if poff is not None else None,
            pos[poff[a] : poff[b]] if pos is not None else None,
            chunk_postings=64,
        )
        rows.append({c: t.column(c)[0].as_py() for c in t.column_names})

    merged = codec.merge_posting_rows(rows, chunk_postings=64)
    assert merged["docs"] == full_row["docs"]
    assert merged["tfs"] == full_row["tfs"]
    assert merged["poss"] == full_row["poss"]
    assert merged["cn"] == full_row["cn"]
    assert merged["clast"] == full_row["clast"]

    concat = codec.concat_posting_rows(rows)
    pl = codec.decode_postings(concat, with_positions=True)
    assert pl.docids.tolist() == docids.tolist()
    assert pl.tfs.tolist() == tfs.tolist()
    assert pl.positions.tolist() == pos.tolist()
    assert int(concat["df"]) == n
    # min-docid skip works across concatenated chunk dirs too
    mid = int(docids[n // 2])
    pl2 = codec.decode_postings(concat, min_docid=mid, with_positions=True)
    assert pl2.docids.max() == docids.max()
