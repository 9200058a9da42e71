"""Tests for the extended operator set: NEAR, SIMILAR, TERM_EXTRACT,
scorer expressions, adjuster, query expander, drilldown calc types."""

import numpy as np
import pytest

from groonga_ray.build import BuildConfig, build_index
from groonga_ray.engine import IndexedTable, select

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_table(ray_session, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("extidx"))
    files = [f"{SF}/documents.parquet"]
    cfg = BuildConfig(
        text_columns=("text",), docid_column="doc_id",
        n_buckets=8, target_rows_per_shard=200, hot_local_df=150,
    )
    build_index(files, index_dir, cfg)
    return IndexedTable(index_dir, files, "doc_id")


def _texts():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def test_near(doc_table):
    from groonga_ray.search import near_match
    from groonga_ray.index import IndexReader

    r = IndexReader(doc_table.index_dir)
    si = r.section("text")
    m = near_match(
        si, [("spark", 0), ("window", 1)], max_interval=3,
        n_docs=r.n_docs, avgdl=r.avgdl(), doclens=r.doclens(),
    )
    # oracle: docs where some |pos(spark) - (pos(window)-1)| <= 3
    import re

    texts = _texts()
    want = set()
    for d, tx in texts.items():
        words = re.findall(r"[a-z0-9_]+", tx.lower())
        p1 = [i for i, w in enumerate(words) if w == "spark"]
        p2 = [i - 1 for i, w in enumerate(words) if w == "window"]
        if p1 and p2 and min(abs(a - b) for a in p1 for b in p2) <= 3:
            want.add(d)
    assert set(m.docids.tolist()) == want
    assert len(want) > 0


def test_near2_no_offsets(doc_table):
    from groonga_ray.search import near_match
    from groonga_ray.index import IndexReader

    r = IndexReader(doc_table.index_dir)
    si = r.section("text")
    m = near_match(
        si, [("spark", 0), ("window", 1)], max_interval=0, use_offsets=False,
        n_docs=r.n_docs, avgdl=r.avgdl(), doclens=r.doclens(),
    )
    # NEAR2 interval 0: spark and window at the same raw position -> impossible
    assert m.nhits == 0


def test_similar_search(doc_table):
    from groonga_ray.search import similar_match
    from groonga_ray.index import IndexReader

    r = IndexReader(doc_table.index_dir)
    si = r.section("text")
    texts = _texts()
    m = similar_match(
        si, texts[0], similarity_threshold=3,
        n_docs=r.n_docs, avgdl=r.avgdl(), doclens=r.doclens(),
    )
    assert m.nhits > 0
    assert 0 in m.docids.tolist()  # the doc itself should match


def test_scorer_expression(doc_table):
    res = select(
        doc_table, query="spark", match_columns="text",
        scorer_expr="_score = -n_chars", limit=5,
        output_columns=("_id", "_score", "n_chars"),
    )
    rows = res["rows"]
    s = rows.column("_score").to_numpy()
    n = rows.column("n_chars").to_numpy()
    assert (s == -n).all()
    assert (np.diff(s) <= 0).all()  # sorted by -_score


def test_adjuster(doc_table):
    base = select(doc_table, query="spark", match_columns="text", limit=-1)
    adj = select(
        doc_table, query="spark", match_columns="text",
        adjuster='text @ "window" * 5', limit=-1,
    )
    assert adj["hits"] == base["hits"]
    b = dict(zip(base["rows"].column("_id").to_pylist(), base["rows"].column("_score").to_pylist()))
    a = dict(zip(adj["rows"].column("_id").to_pylist(), adj["rows"].column("_score").to_pylist()))
    bumped = [d for d in a if a[d] > b[d]]
    assert bumped, "some spark docs containing window must get bumped"
    # bump amount = 5 * tf(window)
    import re

    texts = _texts()
    for d in bumped[:5]:
        tfw = len([w for w in re.findall(r"[a-z0-9_]+", texts[d].lower()) if w == "window"])
        assert a[d] - b[d] == pytest.approx(5.0 * tfw)


def test_query_expander(doc_table):
    plain = select(doc_table, query="spark", match_columns="text", limit=-1)
    expanded = select(
        doc_table, query="spark", match_columns="text", limit=-1,
        query_expander={"spark": "(spark OR window)"},
    )
    assert expanded["hits"] > plain["hits"]


def test_drilldown_calc(doc_table):
    res = select(
        doc_table, query="spark", match_columns="text",
        drilldown="lang", drilldown_calc_types=("MAX", "MIN", "SUM", "AVG"),
        drilldown_calc_target="n_chars", drilldown_limit=100,
    )
    dd = res["drilldown"].to_pandas().set_index("lang")
    import duckdb

    want = duckdb.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
                 '[^a-z0-9_]+'), x -> x <> '')) AS term
          FROM '{SF}/documents.parquet')
        SELECT lang, count(*) AS n, max(n_chars) AS mx, min(n_chars) AS mn,
               sum(n_chars) AS sm, avg(n_chars) AS av
        FROM '{SF}/documents.parquet'
        WHERE doc_id IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark')
        GROUP BY lang
        """
    ).df().set_index("lang")
    for lang in want.index:
        assert dd.loc[lang, "_nsubrecs"] == want.loc[lang, "n"]
        assert dd.loc[lang, "_max"] == want.loc[lang, "mx"]
        assert dd.loc[lang, "_min"] == want.loc[lang, "mn"]
        assert dd.loc[lang, "_sum"] == want.loc[lang, "sm"]
        assert dd.loc[lang, "_avg"] == pytest.approx(want.loc[lang, "av"])


def test_term_extract(doc_table):
    from groonga_ray.search import term_extract
    from groonga_ray.index import IndexReader

    r = IndexReader(doc_table.index_dir)
    si = r.section("text")
    # longest-prefix walk of a text against the lexicon
    hits = term_extract(si, "sparkly windows scan")
    terms = [t for t, _ in hits]
    assert "spark" in terms  # longest lexicon prefix of "sparkly"
    assert "window" in terms
    assert "scan" in terms


def test_select_output_columns_star(doc_table):
    res = select(doc_table, query="spark", match_columns="text",
                 output_columns=("*",), limit=3)
    cols = set(res["rows"].column_names)
    assert {"doc_id", "text", "lang", "source", "n_chars"} <= cols


def test_suffix_search_and_escalation(doc_table):
    from groonga_ray.index import IndexReader
    from groonga_ray.search import term_match

    r = IndexReader(doc_table.index_dir)
    si = r.section("text")
    # suffix lookup: terms ending in 'dow' -> window
    tids = si.suffix_tids("dow")
    assert "window" in [si.term_at(t) for t in tids]
    # escalation chain: 'ndow' matches nothing, no prefix, suffix hits
    m = term_match(
        si, [("ndow", 0)], "default",
        n_docs=r.n_docs, avgdl=r.avgdl(), doclens=r.doclens(),
    )
    assert m.nhits > 0
    import re
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = {
        d for d, tx in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        if any(w.endswith("ndow") for w in re.findall(r"[a-z0-9_]+", tx.lower()))
    }
    assert set(m.docids.tolist()) == want


def test_plugin_registry(doc_table):
    import numpy as np

    from groonga_ray.index import IndexReader
    from groonga_ray.search import register_scorer, term_match
    from groonga_ray.tokenize import Token, TokenStream, register_tokenizer, tokenize

    # custom tokenizer by name
    def shouty(text, mode):
        ts = TokenStream()
        ts.tokens = [Token(w.upper(), i) for i, w in enumerate(text.split())]
        return ts

    register_tokenizer("TokenShouty", shouty)
    assert [t.term for t in tokenize("a b", "TokenShouty").tokens] == ["A", "B"]

    # custom scorer receives (tf, df, df_est, dl, N, avgdl)
    register_scorer("tf_over_dl", lambda tf, df, dfe, dl, n, avg: tf / np.maximum(dl, 1))
    r = IndexReader(doc_table.index_dir)
    si = r.section("text")
    m = term_match(si, [("spark", 0)], "tf_over_dl",
                   n_docs=r.n_docs, avgdl=r.avgdl(), doclens=r.doclens())
    assert m.nhits > 0
    dl = r.doclens()
    pl = si.postings(si.term_id("spark"))
    want = pl.tfs.astype(float) / np.maximum(dl[pl.docids.astype(np.int64)], 1)
    np.testing.assert_allclose(m.scores, want)


def test_regex_literal_extraction():
    from groonga_ray.engine import _regex_literals

    cases = [
        (r"spark\s+window", ["spark", "window"]),
        (r"(spark)*window", ["window"]),
        (r"(spark)window", ["spark", "window"]),
        (r"colou?r", ["colo"]),
        (r"a|b", []),
        (r"x{2,3}yz", ["yz"]),
        (r"sp[ae]rk", ["sp", "rk"]),
    ]
    for pat, want in cases:
        assert _regex_literals(pat) == want, pat


# ---- query pragmas + flags (get_pragma lib/expr.c:5593; query_flags) --------

def test_pragma_escalation_disable(doc_table):
    from groonga_ray.engine import select

    # "wind" is not a token; escalation (prefix) normally finds "window"
    base = select(doc_table, query="wind", match_columns="text", limit=-1)
    assert base["hits"] > 0
    off = select(doc_table, query="*E-1wind", match_columns="text", limit=-1)
    assert off["hits"] == 0
    off2 = select(doc_table, query="wind", match_columns="text", limit=-1,
                  match_escalation_threshold=-1)
    assert off2["hits"] == 0


def test_pragma_default_or(doc_table):
    from groonga_ray.engine import select

    a = select(doc_table, query="spark window", match_columns="text", limit=-1)
    o = select(doc_table, query="*DO spark window", match_columns="text", limit=-1)
    e = select(doc_table, query="spark OR window", match_columns="text", limit=-1)
    assert o["hits"] == e["hits"] > a["hits"]


def test_query_flags_no_column(doc_table):
    from groonga_ray.engine import select

    with_col = select(doc_table, query="lang:en", match_columns="text", limit=-1)
    assert with_col["hits"] > 0                     # col:value filter applies
    no_col = select(doc_table, query="lang:en", match_columns="text", limit=-1,
                    query_flags="ALLOW_PRAGMA")
    # 'lang:en' is now a literal term (tokenizes to lang,en phrase) -> no doc
    assert no_col["hits"] == 0
    # NONE also drops pragma handling: '*E-1wind' parses as a term, 0 hits
    none = select(doc_table, query="*E-1wind", match_columns="text", limit=-1,
                  query_flags="NONE")
    assert none["hits"] == 0


def test_output_column_expressions(doc_table):
    from groonga_ray.engine import select

    res = select(
        doc_table, query="spark", match_columns="text", limit=5,
        output_columns=("_id", "n_chars", "n_chars * 2 + 1", "_score"),
    )
    rows = res["rows"]
    n = rows.column("n_chars").to_numpy(zero_copy_only=False)
    got = rows.column("n_chars * 2 + 1").to_numpy(zero_copy_only=False)
    assert (got == n * 2 + 1).all()


def test_output_column_highlight(doc_table):
    from groonga_ray.engine import select

    res = select(
        doc_table, query="spark", match_columns="text", limit=3,
        output_columns=("_id", "highlight_html(text)"),
    )
    h = res["rows"].column("highlight_html(text)").to_pylist()
    assert all("<span class=\"keyword\">" in x for x in h)


def test_near_similar_query_syntax(doc_table):
    from groonga_ray.engine import select
    from groonga_ray.index import IndexReader
    from groonga_ray.search import near_match

    r = IndexReader(doc_table.index_dir)
    res = select(doc_table, query='*N3"spark window"', match_columns="text", limit=-1)
    m = near_match(r.section("text"), [("spark", 0), ("window", 1)], 3,
                   n_docs=r.n_docs, avgdl=r.avgdl(), doclens=r.doclens())
    assert sorted(res["rows"].column("_id").to_pylist()) == sorted(m.docids.tolist())
    sim = select(doc_table, query='*S"spark window fast"', match_columns="text", limit=5)
    assert sim["hits"] > 0
    comp = select(doc_table, query='fast +*N3"spark window"', match_columns="text", limit=-1)
    assert 0 < comp["hits"] <= res["hits"]


def test_expression_sort_key(doc_table):
    from groonga_ray.engine import select

    res = select(
        doc_table, query="spark", match_columns="text", limit=10,
        sortby="-(n_chars % 7), _id", output_columns=("_id", "n_chars"),
    )
    n = res["rows"].column("n_chars").to_numpy(zero_copy_only=False)
    ids = res["rows"].column("_id").to_numpy(zero_copy_only=False)
    key = n % 7
    order = np.lexsort((ids, -key))
    assert (key == key[order]).all() and (ids == ids[order]).all()
