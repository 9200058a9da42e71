"""REGEXP mode over a real TokenRegexp bigram index (lib/ii.c:6049)."""

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from groonga_ray.build import BuildConfig, build_index
from groonga_ray.engine import IndexedTable, select


@pytest.fixture(scope="module")
def rx_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("rxidx")
    rng = np.random.default_rng(11)
    frags = ["getvalue", "setvalue", "getindex", "reset", "value", "get", "index_map"]
    texts = [
        " ".join(rng.choice(frags, size=rng.integers(2, 6)).tolist()) for _ in range(400)
    ]
    f = str(root / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(1, 401), pa.int64()),
                  "text": pa.array(texts)}),
        f,
    )
    idx = str(root / "idx")
    cfg = BuildConfig(
        text_columns=("text",), docid_column="doc_id", tokenizer="TokenRegexp",
        n_buckets=4, target_rows_per_shard=100,
    )
    build_index([f], idx, cfg)
    return f, idx, texts


@pytest.mark.parametrize("pattern", ["getv.lue", "set.*index", "index_m", "rese[t]"])
def test_regexp_over_bigram_index(rx_index, pattern):
    f, idx, texts = rx_index
    t = IndexedTable(idx, [f], "doc_id")
    res = select(t, filter=f'text @~ "{pattern}"', limit=-1)
    want = [i + 1 for i, x in enumerate(texts) if re.search(pattern, x)]
    assert sorted(res["rows"].column("_id").to_pylist()) == want, pattern


def test_regexp_bigram_prefilter_prunes(rx_index):
    # the bigram phrase prefilter must touch far fewer candidate docs
    # than the corpus for a selective literal
    from groonga_ray.index import IndexReader

    f, idx, texts = rx_index
    t = IndexedTable(idx, [f], "doc_id")
    res = select(t, filter='text @~ "index_map"', limit=-1)
    want = [i + 1 for i, x in enumerate(texts) if "index_map" in x]
    assert sorted(res["rows"].column("_id").to_pylist()) == want


def test_regexp_ngram_index_falls_back_to_scan(ray_session, tmp_path_factory):
    """On an ngram-family index, a literal longer than any token must
    NOT be treated as proof of no match (regression: bigram tokenizers
    split alpha/digit runs, so 'abc123' is a substring of no token) —
    the match must degrade to the sequential scan and stay correct."""
    import re

    idx_root = tmp_path_factory.mktemp("ngramrx")
    texts = ["foo abc123 bar", "foo bar baz", "abc 123 separate"]
    f = str(idx_root / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(texts)}),
        f,
    )
    idx = str(idx_root / "idx")
    cfg = BuildConfig(
        text_columns=("text",), docid_column="doc_id", tokenizer="TokenBigram",
        n_buckets=2, target_rows_per_shard=10,
    )
    build_index([f], idx, cfg)
    t = IndexedTable(idx, [f], "doc_id")
    res = select(t, filter='text @~ "abc123"', limit=-1)
    want = [i + 1 for i, x in enumerate(texts) if re.search("abc123", x)]
    assert sorted(res["rows"].column("_id").to_pylist()) == want
