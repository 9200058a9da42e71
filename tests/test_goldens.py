"""Frozen top-k goldens (FIXTURES.md F6): the reference query set over
the deterministic code corpus, with (rank, docid, score_double,
score_int32) pinned. Guards rank-identity across rounds — any change
to tokenizer/codec/scoring that alters ranks or scores fails here.

Regenerate deliberately with GOLDEN_REGEN=1 (then review the diff).
"""

import json
import os

import numpy as np
import pytest

from groonga_ray import score as score_mod
from groonga_ray.build import BuildConfig, build_index
from groonga_ray.corpus import corpus_cache_dir
from groonga_ray.engine import IndexedTable, select

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "code_corpus_topk.json")

QUERIES = [
    {"name": "hot_term_bm25", "query": "return", "scorer": "bm25"},
    {"name": "mid_term_bm25", "query": "get_value", "scorer": "bm25"},
    {"name": "rare_uniq", "query": "uniq_00000042_42", "scorer": "bm25"},
    {"name": "or_bm25", "query": "get_value OR set_index", "scorer": "bm25"},
    {"name": "and_default", "query": "get_value +parse_token", "scorer": None},
    {"name": "phrase", "query": '"def return"', "scorer": None},
    {"name": "prefix", "query": "uniq_000001*", "scorer": None},
    {"name": "tfidf", "query": "get_value", "scorer": "tf_idf"},
    {"name": "not_op", "query": "get_value -set_index", "scorer": "bm25"},
]


@pytest.fixture(scope="module")
def table(ray_session, tmp_path_factory):
    corpus = corpus_cache_dir(1500)
    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    index_dir = str(tmp_path_factory.mktemp("goldidx"))
    cfg = BuildConfig(
        text_columns=("content",), n_buckets=8, chunk_postings=64,
        target_rows_per_shard=400, hot_local_df=200,
    )
    build_index(files, index_dir, cfg)
    return IndexedTable(index_dir, files, None)


def _run_all(table):
    out = {}
    for q in QUERIES:
        res = select(
            table, query=q["query"], match_columns="content",
            scorer=q["scorer"], limit=10,
        )
        rows = res["rows"]
        scores = rows.column("_score").to_numpy()
        out[q["name"]] = {
            "hits": res["hits"],
            "topk": [
                [r + 1, int(d), round(float(s), 9), int(si)]
                for r, (d, s, si) in enumerate(
                    zip(
                        rows.column("_id").to_pylist(),
                        scores.tolist(),
                        score_mod.score_int32(scores).tolist(),
                    )
                )
            ],
        }
    return out


def test_goldens(table):
    got = _run_all(table)
    if os.environ.get("GOLDEN_REGEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
        if os.environ.get("GOLDEN_REGEN"):
            pytest.skip("goldens regenerated; review + commit them")
    with open(GOLDEN) as fh:
        want = json.load(fh)
    assert sorted(got) == sorted(want)
    for name in want:
        assert got[name]["hits"] == want[name]["hits"], name
        g, w = got[name]["topk"], want[name]["topk"]
        assert [x[:2] for x in g] == [x[:2] for x in w], f"{name}: rank/docid changed"
        np.testing.assert_allclose(
            [x[2] for x in g], [x[2] for x in w], rtol=0, atol=1e-9, err_msg=name
        )
        assert [x[3] for x in g] == [x[3] for x in w], f"{name}: int32 scores changed"
