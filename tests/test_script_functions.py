"""--filter script expressions, scalar functions, set ops, CLI."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from groonga_ray.build import BuildConfig, build_index
from groonga_ray.engine import IndexedTable, select

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_table(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("scridx"))
    files = [f"{SF}/documents.parquet"]
    cfg = BuildConfig(text_columns=("text",), docid_column="doc_id",
                      n_buckets=8, target_rows_per_shard=200)
    build_index(files, index_dir, cfg)
    return IndexedTable(index_dir, files, "doc_id")


def test_script_extended_ops_match_sql():
    """ternary / bit / shift / in / @~ vs DuckDB on the real table."""
    import duckdb

    import pyarrow.parquet as pq
    from groonga_ray.script import eval_filter, parse_filter

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars", "lang", "text"])
    cases = [
        ("(n_chars >> 2) % 3 == 1 && lang in ['en', 'de']",
         "(n_chars // 4) % 3 = 1 AND lang IN ('en', 'de')"),
        ("(doc_id & 7) == 1 || (doc_id | 8) == doc_id",
         "(doc_id & 7) = 1 OR (doc_id | 8) = doc_id"),
        ("(doc_id ^ 5) % 4 == 0", "xor(doc_id, 5) % 4 = 0"),
        ("(doc_id << 1) > 900", "(doc_id * 2) > 900"),
        ("(n_chars > 300 ? 1 : 0) == 1", "CASE WHEN n_chars > 300 THEN 1 ELSE 0 END = 1"),
        ("text @~ 'sp[ae]rk'", "regexp_matches(text, 'sp[ae]rk')"),
        ("!(lang == 'en') && n_chars != 200", "NOT lang = 'en' AND n_chars <> 200"),
    ]
    for ours, sql in cases:
        mask = eval_filter(parse_filter(ours), tbl)
        got = tbl.filter(mask).column("doc_id").to_pylist()
        want = duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet' WHERE {sql} ORDER BY doc_id"
        ).df()["doc_id"].tolist()
        assert sorted(got) == want, ours


def test_scorer_assignment_ops(doc_table):
    res0 = select(doc_table, query="spark", match_columns="text", limit=-1)
    base = dict(zip(res0["rows"].column("_id").to_pylist(), res0["rows"].column("_score").to_pylist()))
    res = select(
        doc_table, query="spark", match_columns="text",
        scorer_expr="_score = n_chars > 300 ? _score * 10 + n_chars : -1", limit=-1,
        output_columns=("_id", "_score", "n_chars"),
    )
    ids = res["rows"].column("_id").to_pylist()
    scores = res["rows"].column("_score").to_pylist()
    ncs = res["rows"].column("n_chars").to_pylist()
    for i, s, nc in zip(ids, scores, ncs):
        want = base[i] * 10 + nc if nc > 300 else -1.0
        assert s == want
    res2 = select(
        doc_table, query="spark", match_columns="text",
        scorer_expr="_score *= 3", limit=-1,
    )
    got2 = dict(zip(res2["rows"].column("_id").to_pylist(), res2["rows"].column("_score").to_pylist()))
    assert got2 == {i: v * 3 for i, v in base.items()}


def test_filter_parse_and_eval():
    from groonga_ray.script import eval_filter, parse_filter

    t = pa.table({"a": [1, 5, 10, 20], "s": ["x", "yy", "zzz", "wwww"]})
    cases = [
        ("a > 4 && a <= 10", [False, True, True, False]),
        ("a == 1 || a == 20", [True, False, False, True]),
        ("!(a < 10)", [False, False, True, True]),
        ("between(a, 5, 10)", [False, True, True, False]),
        ("in_values(a, 1, 20)", [True, False, False, True]),
        ("a * 2 >= 20", [False, False, True, True]),
        ('s @ "z"', [False, False, True, False]),
        ('s @^ "w"', [False, False, False, True]),
        ("all_records()", [True, True, True, True]),
    ]
    for expr, want in cases:
        got = eval_filter(parse_filter(expr), t).to_pylist()
        assert got == want, expr


def test_select_with_filter(doc_table):
    import duckdb

    res = select(doc_table, query="spark", match_columns="text",
                 filter="n_chars >= 200 && n_chars < 400", limit=-1)
    want = duckdb.sql(
        f"""
        WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
             lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS term
             FROM '{SF}/documents.parquet')
        SELECT count(DISTINCT d.doc_id) FROM '{SF}/documents.parquet' d
        WHERE d.doc_id IN (SELECT doc_id FROM toks WHERE term='spark')
          AND d.n_chars >= 200 AND d.n_chars < 400
        """
    ).fetchone()[0]
    assert res["hits"] == want


def test_filter_with_index_match(doc_table):
    # `text @ "spark"` routes through the index (match term) and the
    # residual predicate stays columnar
    a = select(doc_table, filter='text @ "spark" && n_chars > 300', limit=-1)
    b = select(doc_table, query="spark", match_columns="text",
               filter="n_chars > 300", limit=-1)
    assert a["hits"] == b["hits"]
    assert set(a["rows"].column("_id").to_pylist()) == set(b["rows"].column("_id").to_pylist())


def test_filter_only_no_query(doc_table):
    res = select(doc_table, filter="n_chars == 48", limit=-1, output_columns=("_id", "n_chars"))
    assert all(v == 48 for v in res["rows"].column("n_chars").to_pylist())


def test_edit_distance_vs_duckdb():
    import duckdb

    from groonga_ray.functions import edit_distance_batch

    words = ["kitten", "flaw", "spark", "abc", ""]
    got = edit_distance_batch(pa.array(words), pa.scalar("sitting")).tolist()
    want = [duckdb.sql(f"select levenshtein('{w}', 'sitting')").fetchone()[0] for w in words]
    assert got == want


def test_snippet_and_highlight():
    from groonga_ray.functions import highlight_html, snippet_html

    texts = pa.array(["the Spark engine sparked a spark", "no match here"])
    sn = snippet_html(texts, ["spark"], width=20, max_results=2).to_pylist()
    assert len(sn[0]) == 2
    assert '<span class="keyword">' in sn[0][0]
    assert sn[1] is None  # no hit → null (snippet_html/none.expected)
    hl = highlight_html(pa.array(["a<b> spark"]), ["spark"]).to_pylist()[0]
    assert hl == 'a&lt;b&gt; <span class="keyword">spark</span>'


def test_html_untag():
    from groonga_ray.functions import html_untag

    out = html_untag(pa.array(["<p>hi <b>there</b></p>"])).to_pylist()
    assert out == ["hi there"]


def test_op_difference():
    from groonga_ray.search import MatchResult, op_difference

    a = MatchResult(np.array([1, 2, 3], np.uint64), np.ones(3))
    b = MatchResult(np.array([2, 3, 4], np.uint64), np.ones(3))
    ra, rb = op_difference(a, b)
    assert ra.docids.tolist() == [1] and rb.docids.tolist() == [4]


def test_cli_tokenize_and_select(doc_table, tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "groonga_ray.cli", "tokenize", "TokenBigram", "ABCだ", "--mode", "GET"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    payload = json.loads(out.stdout)
    assert payload[1][0]["value"] == "abc"
    assert payload[1][1]["force_prefix"] is True

    out = subprocess.run(
        [sys.executable, "-m", "groonga_ray.cli", "select",
         "--index", doc_table.index_dir, "--docid-column", "doc_id",
         "--query", "spark", "--match-columns", "text", "--limit", "3",
         f"{SF}/documents.parquet"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    env = json.loads(out.stdout)
    assert env[0][0] > 3 and len(env) == 2 + 3


def test_filter_nested_query(doc_table):
    a = select(doc_table, filter='query("text", "spark OR window") && n_chars > 300', limit=-1)
    b = select(doc_table, query="spark OR window", match_columns="text",
               filter="n_chars > 300", limit=-1)
    assert a["hits"] == b["hits"]
    assert set(a["rows"].column("_id").to_pylist()) == set(b["rows"].column("_id").to_pylist())


def test_cli_load_then_build(tmp_path):
    recs = [
        {"repo": "r/a", "path": f"f{i}.py", "commit": "c", "lang": "python",
         "content": f"def f{i} return value x{i}"} for i in range(30)
    ]
    src = tmp_path / "in.json"
    src.write_text(json.dumps(recs))
    out = tmp_path / "docs.parquet"
    r = subprocess.run(
        [sys.executable, "-m", "groonga_ray.cli", "load", str(src), str(out),
         "--sort-by", "repo,path"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert json.loads(r.stdout)["rows"] == 30, r.stderr[-500:]
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.column("path").to_pylist() == sorted(t.column("path").to_pylist())


def test_cli_dump_load_roundtrip(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "groonga_ray.cli", "dump",
         f"{SF}/region.parquet"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    lines = out.stdout.strip().splitlines()
    header = json.loads(lines[0])
    assert header["cmd"] == "table_create" and "r_name" in header["schema"]
    body = tmp_path / "rows.jsonl"
    body.write_text("\n".join(lines[1:]))
    dst = tmp_path / "region2.parquet"
    r = subprocess.run(
        [sys.executable, "-m", "groonga_ray.cli", "load", str(body), str(dst), "--jsonl"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert json.loads(r.stdout)["rows"] == 5
    import pyarrow.parquet as pq

    orig = pq.read_table(f"{SF}/region.parquet")
    back = pq.read_table(dst)
    assert orig.column("r_name").to_pylist() == back.column("r_name").to_pylist()
