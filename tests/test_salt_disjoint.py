"""Docid-disjoint posting parts under salt collisions and hot/cold flip.

Regression for the salted-build invariant: with few buckets, different
salt groups of a hot term hash into the SAME bucket; and a term near
the hotness threshold is hot in some shards, cold in others. Both must
still yield pairwise docid-disjoint parts (else concatenated postings
come out unsorted and WAND / chunk-skip break).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from groonga_ray.build import BuildConfig, build_index
from groonga_ray.index import IndexReader
from groonga_ray.search import op_and, op_or, term_match, top_k, wand_topk


@pytest.fixture(scope="module")
def flip_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("saltflip")
    rng = np.random.default_rng(7)
    # 6 shards of 100 docs. "kw" hot in EVERY shard (salt collision with
    # n_buckets=2 guaranteed). "flip" hot in shards 1 and 4 only (every
    # doc, many occurrences), cold elsewhere (few docs) -> mixed parts.
    texts = []
    for d in range(600):
        shard = d // 100
        words = [f"w{rng.integers(0, 50)}" for _ in range(10)] + ["kw"] * 2
        if shard in (1, 4):
            words += ["flip"] * 3
        elif d % 33 == 0:
            words.append("flip")
        rng.shuffle(words)
        texts.append(" ".join(words))
    f = str(root / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(1, 601), pa.int64()),
                  "text": pa.array(texts),
                  "title": pa.array([f"title {d}" for d in range(600)])}),
        f,
    )
    idx = str(root / "idx")
    cfg = BuildConfig(
        text_columns=("text", "title"), docid_column="doc_id",
        n_buckets=2, target_rows_per_shard=100, salt_group=1,
        hot_local_df=50, chunk_postings=32,
    )
    build_index([f], idx, cfg)
    return f, idx


def _oracle_postings(f, term):
    t = pq.read_table(f)
    out = {}
    for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        n = txt.split().count(term)
        if n:
            out[d] = n
    return out


def test_all_parts_docid_disjoint(flip_index):
    _, idx = flip_index
    si = IndexReader(idx).section("text")
    multi = 0
    for tid in si.all_tids():
        rows = si.posting_rows(tid)
        if len(rows) > 1:
            multi += 1
            lasts = [max(r["clast"]) for r in rows]
            firsts = [r["cfirst"][0] for r in rows]
            assert all(
                lasts[i] < firsts[i + 1] for i in range(len(rows) - 1)
            ), (si.term_at(tid), firsts, lasts)
    assert multi >= 2  # kw (salted) and flip (mixed) at minimum


def test_mixed_hot_cold_postings_sorted_and_exact(flip_index):
    f, idx = flip_index
    si = IndexReader(idx).section("text")
    for term in ("kw", "flip"):
        pl = si.postings(si.term_id(term))
        assert np.all(np.diff(pl.docids.astype(np.int64)) > 0), term
        want = _oracle_postings(f, term)
        assert dict(zip(pl.docids.tolist(), pl.tfs.tolist())) == want, term


def test_wand_equals_exhaustive_under_collisions(flip_index):
    f, idx = flip_index
    r = IndexReader(idx)
    si = r.section("text")
    dl = r.doclens("text")
    kw = dict(n_docs=r.n_docs, avgdl=r.avgdl("text"), doclens=dl)
    # 'default' = integer tf scores -> heavy ties: exercises the
    # ub==theta docid-asc tiebreak at the pruning boundary
    for scorer in ("bm25", "default"):
        for mode in ("or", "and"):
            docids, scores = wand_topk(si, ["kw", "flip"], 10, scorer, mode=mode, **kw)
            a = term_match(si, [("kw", 0)], scorer, **kw)
            b = term_match(si, [("flip", 0)], scorer, **kw)
            full = op_or(a, b) if mode == "or" else op_and(a, b)
            e_doc, e_score = top_k(full, 10)
            assert docids.tolist() == e_doc.tolist(), (scorer, mode)
            assert np.allclose(scores, e_score), (scorer, mode)


def test_section_qualified_empty_tokens_no_crash(flip_index):
    # 'title:@!!!' (indexed section outside match_columns, text
    # tokenizes to nothing) -> empty result, not IndexError
    from groonga_ray.engine import IndexedTable, select

    f, idx = flip_index
    t = IndexedTable(idx, [f], "doc_id")
    res = select(t, query="title:@!!!", match_columns="text", limit=-1)
    assert res["hits"] == 0
    res2 = select(t, query="title:@600", match_columns="text", limit=-1)
    assert res2["hits"] == 0  # titles run 0..599
    res3 = select(t, query="title:@599", match_columns="text", limit=-1)
    assert res3["hits"] == 1


def test_prefix_upper_supplementary_plane():
    from groonga_ray.index import _prefix_upper

    up = _prefix_upper("a")
    assert up == "b" and "a\U0001F600" < up  # emoji continuation covered
    assert _prefix_upper("a\U0010FFFF") == "b"
    assert _prefix_upper("\U0010FFFF") is None
    assert _prefix_upper("z퟿") == "z"  # surrogate gap skipped


def test_streaming_merge_slice_invariance(flip_index, tmp_path_factory):
    """The bucket merge streams in bounded slices; the output file's
    ROWS must be identical whatever the slice bound (memory knob only)."""
    import pyarrow.parquet as pqq

    f, idx = flip_index
    root = tmp_path_factory.mktemp("sliced")
    idx2 = str(root / "idx")
    cfg = BuildConfig(
        text_columns=("text", "title"), docid_column="doc_id",
        n_buckets=2, target_rows_per_shard=100, salt_group=1,
        hot_local_df=50, chunk_postings=32, merge_slice_postings=50,
    )
    build_index([f], idx2, cfg)
    for b in range(2):
        a = pqq.read_table(f"{idx}/sec=text/postings/bucket={b:04d}/part.parquet")
        c = pqq.read_table(f"{idx2}/sec=text/postings/bucket={b:04d}/part.parquet")
        assert a.equals(c), b


def test_check_index_green_and_detects_corruption(flip_index, tmp_path_factory):
    import json as _json
    import shutil as _sh

    import pyarrow.parquet as pqq

    from groonga_ray.build import check_index

    f, idx = flip_index
    rep = check_index(idx)
    assert rep["ok"], rep["issues"]
    assert rep["sections"]["text"]["multipart_terms_checked"] >= 2
    # corrupt a copy: truncate a lexicon shard -> df totals mismatch
    root = tmp_path_factory.mktemp("corrupt")
    idx2 = str(root / "idx")
    _sh.copytree(idx, idx2)
    lexf = sorted(__import__("glob").glob(f"{idx2}/sec=text/lexicon/bucket=*.parquet"))[0]
    t = pqq.read_table(lexf)
    pqq.write_table(t.slice(0, max(0, t.num_rows - 1)), lexf)
    rep2 = check_index(idx2)
    assert not rep2["ok"] and any("df total" in i for i in rep2["issues"])
