"""Property-based (hypothesis) tests for the posting codec — the core
persistent data structure. Random docid/tf/position shapes, including
the adversarial ones a grid of seeds misses: single-posting lists,
maximal gaps, tf==1 runs, chunk-boundary-straddling dfs.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from groonga_ray import codec


@st.composite
def posting_lists(draw):
    df = draw(st.integers(min_value=1, max_value=300))
    # docid gaps from 1 to huge (forces every varbyte width path)
    gaps = draw(
        st.lists(
            st.integers(min_value=1, max_value=1 << 40),
            min_size=df, max_size=df,
        )
    )
    docids = np.cumsum(np.array(gaps, np.uint64), dtype=np.uint64)
    tfs = np.array(
        draw(st.lists(st.integers(1, 1000), min_size=df, max_size=df)), np.uint64
    )
    return docids, tfs


@given(posting_lists(), st.sampled_from([3, 64, 4096]))
@settings(max_examples=60, deadline=None)
def test_roundtrip_any_shape(pl, chunk):
    docids, tfs = pl
    terms = pa.array(["t"], pa.large_string())
    toff = np.array([0, len(docids)], np.int64)
    table = codec.encode_posting_table(terms, toff, docids, tfs, None, None,
                                       chunk_postings=chunk)
    row = {c: table.column(c)[0].as_py() for c in table.column_names}
    out = codec.decode_postings(row, with_positions=False)
    assert out.docids.tolist() == docids.tolist()
    assert out.tfs.tolist() == tfs.tolist()
    assert int(row["df"]) == len(docids)
    assert row["clast"][-1] == int(docids[-1])
    assert max(row["cmaxtf"]) == int(tfs.max())


@given(posting_lists(), posting_lists())
@settings(max_examples=30, deadline=None)
def test_concat_equals_single_encode(pl_a, pl_b):
    """Encoding two docid-disjoint halves and concatenating the rows
    must decode identically to encoding the union at once."""
    da, ta = pl_a
    db, tb = pl_b
    # shift the second half above the first (disjoint, ascending)
    db = (db + da[-1] + np.uint64(1)).astype(np.uint64)
    terms = pa.array(["t"], pa.large_string())

    def enc(d, t):
        tab = codec.encode_posting_table(
            terms, np.array([0, len(d)], np.int64), d, t, None, None
        )
        return {c: tab.column(c)[0].as_py() for c in tab.column_names}

    merged = codec.concat_posting_rows([enc(da, ta), enc(db, tb)])
    out = codec.decode_postings(merged, with_positions=False)
    want_d = np.concatenate([da, db])
    want_t = np.concatenate([ta, tb])
    assert out.docids.tolist() == want_d.tolist()
    assert out.tfs.tolist() == want_t.tolist()


@given(posting_lists(), st.integers(0, 1 << 41))
@settings(max_examples=40, deadline=None)
def test_min_docid_decode_suffix(pl, min_docid):
    """decode with a min_docid bound must return exactly the suffix."""
    docids, tfs = pl
    terms = pa.array(["t"], pa.large_string())
    toff = np.array([0, len(docids)], np.int64)
    table = codec.encode_posting_table(terms, toff, docids, tfs, None, None,
                                       chunk_postings=16)
    row = {c: table.column(c)[0].as_py() for c in table.column_names}
    out = codec.decode_postings(row, with_positions=False, min_docid=min_docid)
    keep = docids >= np.uint64(min_docid)
    got_d = out.docids[out.docids >= np.uint64(min_docid)]
    assert got_d.tolist() == docids[keep].tolist()


# ---- WordTokenizer vs the regex reference (the SQL-oracle contract)

import re

from groonga_ray.tokenize import WordTokenizer

_REF = re.compile(r"[^a-z0-9_]+")


@given(
    st.lists(
        # ASCII per the documented contract (tokenize.py: multi-byte
        # chars are non-word; exotic case folds like U+212A->'k'
        # legitimately differ between lower() implementations)
        st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=127), max_size=80),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=80, deadline=None)
def test_word_tokenizer_matches_regex_reference(texts):
    wt = WordTokenizer()
    tb = wt.tokenize_column(pa.array(texts, pa.large_string()))
    got = [[] for _ in texts]
    for r, t in zip(tb.row_idx, tb.terms.to_pylist()):
        got[r].append(t)
    want = [[t for t in _REF.split(s.lower()) if t] for s in texts]
    assert got == want


@st.composite
def posting_lists_with_positions(draw):
    df = draw(st.integers(min_value=1, max_value=60))
    gaps = draw(st.lists(st.integers(1, 1 << 20), min_size=df, max_size=df))
    docids = np.cumsum(np.array(gaps, np.uint64), dtype=np.uint64)
    tfs = np.array(draw(st.lists(st.integers(1, 12), min_size=df, max_size=df)), np.uint64)
    pos_offsets = np.zeros(df + 1, np.int64)
    np.cumsum(tfs, out=pos_offsets[1:].view(np.int64))
    rng_seed = draw(st.integers(0, 2**31 - 1))
    r = np.random.default_rng(rng_seed)
    pos = np.concatenate(
        [np.sort(r.choice(1 << 16, size=int(t), replace=False)).astype(np.uint64) for t in tfs]
    )
    return docids, tfs, pos_offsets, pos


@given(posting_lists_with_positions(), st.sampled_from([5, 4096]))
@settings(max_examples=40, deadline=None)
def test_roundtrip_with_positions(pl, chunk):
    docids, tfs, poff, pos = pl
    terms = pa.array(["t"], pa.large_string())
    toff = np.array([0, len(docids)], np.int64)
    table = codec.encode_posting_table(terms, toff, docids, tfs, poff, pos,
                                       chunk_postings=chunk)
    row = {c: table.column(c)[0].as_py() for c in table.column_names}
    out = codec.decode_postings(row, with_positions=True)
    assert out.docids.tolist() == docids.tolist()
    assert out.tfs.tolist() == tfs.tolist()
    assert out.positions.tolist() == pos.tolist()
