"""Incremental update (LSM delta segments) + tombstone delete + compaction."""

import json
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from groonga_ray.build import (
    BuildConfig, add_documents, build_index, compact_index, delete_documents,
)
from groonga_ray.engine import IndexedTable, select
from groonga_ray.index import IndexReader

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_docs(ray_session, tmp_path_factory):
    """documents.parquet split into base (doc_id <= 250) + delta rest."""
    root = tmp_path_factory.mktemp("incr")
    full = pq.read_table(f"{SF}/documents.parquet")
    ids = full.column("doc_id").to_numpy(zero_copy_only=False)
    base_t = full.filter(pa.array(ids <= 250))
    delta_t = full.filter(pa.array(ids > 250))
    base_f = str(root / "base.parquet")
    delta_f = str(root / "delta.parquet")
    pq.write_table(base_t, base_f)
    pq.write_table(delta_t, delta_f)
    idx = str(root / "idx")
    cfg = BuildConfig(
        text_columns=("text",), docid_column="doc_id",
        n_buckets=4, target_rows_per_shard=100,
    )
    build_index([base_f], idx, cfg)
    return idx, base_f, delta_f, cfg


def test_delta_add_matches_full_corpus(split_docs):
    idx, base_f, delta_f, cfg = split_docs
    # before the delta: only base docs match
    t = IndexedTable(idx, [base_f, delta_f], "doc_id")
    res0 = select(t, query="spark", match_columns="text", limit=-1)
    assert max(res0["rows"].column("_id").to_pylist()) <= 250

    add_documents(idx, [delta_f])
    r = IndexReader(idx)
    assert r.n_docs == 500
    res = select(t, query="spark", match_columns="text", limit=-1)
    want = duckdb.sql(
        f"""
        WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS term
             FROM '{SF}/documents.parquet')
        SELECT doc_id, count(*)::BIGINT AS tf FROM toks
        WHERE term = 'spark' GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    got = dict(zip(res["rows"].column("_id").to_pylist(),
                   res["rows"].column("_score").to_pylist()))
    assert got == dict(zip(want["doc_id"].astype(int), want["tf"].astype(float)))
    # avgdl/n_docs combine across segments
    full_dl = duckdb.sql(
        f"""SELECT avg(len(list_filter(regexp_split_to_array(lower(text),
            '[^a-z0-9_]+'), x -> x <> '')))::DOUBLE
            FROM '{SF}/documents.parquet'"""
    ).fetchone()[0]
    assert abs(r.avgdl("text") - full_dl) < 1e-9


def test_phrase_and_prefix_across_segments(split_docs):
    idx, base_f, delta_f, _ = split_docs
    t = IndexedTable(idx, [base_f, delta_f], "doc_id")
    res = select(t, query='"spark window"', match_columns="text", limit=-1)
    want = duckdb.sql(
        f"""
        WITH toks AS (SELECT doc_id, unnest(arr) AS term,
               unnest(generate_series(1, len(arr))) AS pos
          FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '') AS arr FROM '{SF}/documents.parquet'))
        SELECT DISTINCT a.doc_id FROM
          (SELECT doc_id, pos FROM toks WHERE term = 'spark') a
          JOIN (SELECT doc_id, pos FROM toks WHERE term = 'window') b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 ORDER BY a.doc_id
        """
    ).df()
    assert sorted(res["rows"].column("_id").to_pylist()) == want["doc_id"].tolist()
    res2 = select(t, query="wi*", match_columns="text", limit=-1)
    want2 = duckdb.sql(
        f"""WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
            lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS term
            FROM '{SF}/documents.parquet')
           SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'wi%' ORDER BY doc_id"""
    ).df()
    assert sorted(res2["rows"].column("_id").to_pylist()) == want2["doc_id"].tolist()


def test_delete_and_compact(split_docs):
    idx, base_f, delta_f, _ = split_docs
    t = IndexedTable(idx, [base_f, delta_f], "doc_id")
    before = select(t, query="spark", match_columns="text", limit=-1)
    victims = [d for d in before["rows"].column("_id").to_pylist() if d % 7 == 0]
    delete_documents(idx, victims)
    after = select(t, query="spark", match_columns="text", limit=-1)
    assert set(after["rows"].column("_id").to_pylist()) == (
        set(before["rows"].column("_id").to_pylist()) - set(victims)
    )
    # compaction folds tombstones into the postings and drops the file
    stats = compact_index(idx)
    assert stats["rewritten"] > 0
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))
    after2 = select(t, query="spark", match_columns="text", limit=-1)
    assert after2["rows"].column("_id").to_pylist() == after["rows"].column("_id").to_pylist()
    assert after2["rows"].column("_score").to_pylist() == after["rows"].column("_score").to_pylist()


def test_wand_over_delta_segments(split_docs, tmp_path_factory):
    """Block-max WAND across base+delta composite tids == exhaustive."""
    import numpy as np

    from groonga_ray.search import op_or, term_match, top_k, wand_topk

    root = tmp_path_factory.mktemp("wand_delta")
    full = pq.read_table(f"{SF}/documents.parquet")
    ids = full.column("doc_id").to_numpy(zero_copy_only=False)
    base_f = str(root / "base.parquet")
    delta_f = str(root / "delta.parquet")
    pq.write_table(full.filter(pa.array(ids <= 250)), base_f)
    pq.write_table(full.filter(pa.array(ids > 250)), delta_f)
    idx = str(root / "idx")
    cfg = BuildConfig(
        text_columns=("text",), docid_column="doc_id",
        n_buckets=4, target_rows_per_shard=100,
    )
    build_index([base_f], idx, cfg)
    add_documents(idx, [delta_f])
    r = IndexReader(idx)
    si = r.section("text")
    dl = r.doclens("text")
    kw = dict(n_docs=r.n_docs, avgdl=r.avgdl("text"), doclens=dl)
    docids, scores = wand_topk(si, ["spark", "window"], 10, "bm25", mode="or", **kw)
    a = term_match(si, [("spark", 0)], "bm25", **kw)
    b = term_match(si, [("window", 0)], "bm25", **kw)
    e_doc, e_score = top_k(op_or(a, b), 10)
    assert docids.tolist() == e_doc.tolist()
    assert np.allclose(scores, e_score)
    assert max(docids) > 250  # delta docs reachable through WAND


def test_sparse_delta_docids_and_empty_tombstones(ray_session, tmp_path_factory):
    """Sparse docid deltas must advance next_docid past the delta MAX
    (regression: base+count let later deltas overlap); an empty
    tombstone set must be a no-op, not a crash."""
    root = tmp_path_factory.mktemp("sparse")
    full = pq.read_table(f"{SF}/documents.parquet")
    ids = full.column("doc_id").to_numpy(zero_copy_only=False)
    base_f = str(root / "base.parquet")
    pq.write_table(full.filter(pa.array(ids <= 100)), base_f)
    # delta 1: sparse high docids {150, 320, 480}
    d1 = full.filter(pa.array(np.isin(ids, [150, 320, 480])))
    d1_f = str(root / "d1.parquet")
    pq.write_table(d1, d1_f)
    idx = str(root / "idx")
    cfg = BuildConfig(text_columns=("text",), docid_column="doc_id",
                      n_buckets=4, target_rows_per_shard=100)
    build_index([base_f], idx, cfg)
    add_documents(idx, [d1_f])
    meta = json.load(open(os.path.join(idx, "meta.json")))
    assert meta["next_docid"] == 481  # past the delta MAX, not 101+3
    # delta 2 inside d1's range must be rejected BEFORE building
    d2 = full.filter(pa.array(np.isin(ids, [200, 210])))
    d2_f = str(root / "d2.parquet")
    pq.write_table(d2, d2_f)
    with pytest.raises(ValueError):
        add_documents(idx, [d2_f])
    assert not os.path.exists(os.path.join(idx, "delta=001"))  # no orphan dir
    # empty tombstone set: select still works, compaction is a no-op
    delete_documents(idx, [])
    t = IndexedTable(idx, [base_f, d1_f], "doc_id")
    res = select(t, query="spark", match_columns="text", limit=-1)
    assert res["hits"] > 0
    assert compact_index(idx)["rewritten"] == 0
