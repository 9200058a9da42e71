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
    assert spec.sections == [("title", 2.0), ("content", 1.0)]
    spec2 = parse_match_columns("scorer_tf_idf(text)")
    assert spec2.scorer == "tf_idf" and spec2.sections == [("text", 1.0)]


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
