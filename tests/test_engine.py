"""select() surface tests over the real documents table."""

import numpy as np
import pytest

from groonga_ray.build import BuildConfig, build_index
from groonga_ray.engine import IndexedTable, dump_tokens, select
from groonga_ray.qlang import parse_match_columns, parse_query, AndNode, NotNode, OrNode, PhraseNode, TermNode

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_table(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("docidx"))
    files = [f"{SF}/documents.parquet"]
    cfg = BuildConfig(
        text_columns=("text",), docid_column="doc_id",
        n_buckets=8, target_rows_per_shard=200, hot_local_df=150,
    )
    build_index(files, index_dir, cfg)
    return IndexedTable(index_dir, files, "doc_id")


def test_parse_query_shapes():
    ast = parse_query('spark +window -slow OR "fast scan" col:^pre')
    assert isinstance(ast, OrNode)
    assert isinstance(ast.children[0], NotNode)
    and_part = ast.children[0].positive
    assert isinstance(and_part, AndNode)
    assert [t.text for t in and_part.children] == ["spark", "window"]
    right = ast.children[1]
    assert isinstance(right, AndNode)
    assert isinstance(right.children[0], PhraseNode)
    assert right.children[1].mode == "prefix"
    spec = parse_match_columns("title*2||content")
    assert spec.sections == [("title", 2.0, None), ("content", 1.0, None)]
    spec2 = parse_match_columns("scorer_tf_idf(text)")
    assert spec2.scorer == "tf_idf" and spec2.sections == [("text", 1.0, "tf_idf")]
    # per-branch scorers with weights (select/match_columns/scorer
    # suites): each || branch carries its own scorer + weight
    spec3 = parse_match_columns(
        "scorer_tf_at_most(m1, 3.0) * 10 || scorer_tf_at_most(m2, 4.0) * 20"
    )
    assert spec3.sections == [
        ("m1", 10.0, "tf_at_most:3.0"),
        ("m2", 20.0, "tf_at_most:4.0"),
    ]


def test_select_term_topk(doc_table):
    res = select(doc_table, query="spark", match_columns="text", scorer="bm25",
                 limit=5, output_columns=("_id", "_score", "source"))
    assert res["rows"].num_rows == 5
    assert res["hits"] > 5
    scores = res["rows"].column("_score").to_numpy()
    assert all(np.diff(scores) <= 1e-12)
    assert res["rows"].column("source")[0].as_py().startswith("src")


def test_select_and_not(doc_table):
    r_and = select(doc_table, query="spark +window", match_columns="text", limit=-1)
    r_not = select(doc_table, query="spark -window", match_columns="text", limit=-1)
    r_all = select(doc_table, query="spark", match_columns="text", limit=-1)
    assert r_and["hits"] + r_not["hits"] == r_all["hits"]


def test_select_drilldown(doc_table):
    res = select(doc_table, query="spark", match_columns="text",
                 drilldown="lang", drilldown_limit=10)
    dd = res["drilldown"]
    assert set(dd.column("lang").to_pylist()) <= {"en", "de", "zh", "fr", "es"}
    assert sum(dd.column("_nsubrecs").to_pylist()) == res["hits"]


def test_select_sort_by_column(doc_table):
    res = select(doc_table, query="spark", match_columns="text",
                 sortby="-n_chars", limit=5, output_columns=("_id", "n_chars"))
    vals = res["rows"].column("n_chars").to_numpy()
    assert all(np.diff(vals) <= 0)


def test_select_range_filter_node(doc_table):
    res = select(doc_table, query="spark +n_chars:>=400", match_columns="text", limit=-1,
                 output_columns=("_id", "n_chars"))
    assert res["hits"] > 0
    assert all(v >= 400 for v in res["rows"].column("n_chars").to_pylist())


def test_filter_reads_scale_with_match(doc_table):
    """An index-bounded filter must evaluate its residual over the
    match's docids only — doc-store bytes read scale with the match,
    not the corpus — and never materialize the source on the driver."""
    import duckdb
    from groonga_ray import engine as eng

    before = eng.FETCH_BYTES
    res = select(
        doc_table, query="spark", match_columns="text",
        filter="between(n_chars, 150, 350)", limit=-1,
        output_columns=("_id", "n_chars"),
    )
    delta = eng.FETCH_BYTES - before
    want = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9_]+'), x -> x <> '')) AS term
          FROM '{SF}/documents.parquet')
        SELECT DISTINCT d.doc_id FROM '{SF}/documents.parquet' d
        WHERE d.doc_id IN (SELECT doc_id FROM toks WHERE term = 'spark')
          AND d.n_chars BETWEEN 150 AND 350 ORDER BY doc_id
        """
    ).df()
    assert sorted(res["rows"].column("_id").to_pylist()) == want["doc_id"].tolist()
    # residual fetch is column-pruned (n_chars only): a corpus-sized
    # read of the text column would be orders of magnitude larger
    import os as _os
    corpus_bytes = _os.path.getsize(f"{SF}/documents.parquet")
    assert 0 < delta < corpus_bytes, (delta, corpus_bytes)


def test_pure_scan_filter_streams(doc_table):
    """A filter with no index part scans streaming and matches SQL."""
    import duckdb

    res = select(
        doc_table, filter="n_chars >= 400 && lang == 'en'", limit=-1,
        output_columns=("_id", "n_chars"),
    )
    want = duckdb.sql(
        f"SELECT doc_id FROM '{SF}/documents.parquet' WHERE n_chars >= 400 AND lang = 'en' ORDER BY doc_id"
    ).df()
    assert res["rows"].column("_id").to_pylist() == want["doc_id"].tolist()


def test_dump_tokens_matches_sql(doc_table):
    import duckdb

    ds = dump_tokens(doc_table.index_dir, "text")
    got = ds.to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    want = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(arr) AS term,
                 unnest(generate_series(1, len(arr))) AS pos
          FROM (SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                                   x -> x <> '') AS arr
                FROM '{SF}/documents.parquet')
        ) SELECT doc_id, term, pos FROM toks ORDER BY doc_id, pos
        """
    ).df()
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["pos"].to_numpy() == want["pos"].to_numpy()).all()
    assert (got["term"].to_numpy() == want["term"].to_numpy()).all()
