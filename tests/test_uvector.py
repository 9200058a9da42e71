"""TokenUvector: list-column elements as tokens (lib/tokenizers.c:28-98)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from groonga_ray.build import BuildConfig, build_index, _tokenize_uvector
from groonga_ray.engine import IndexedTable, select


def test_tokenize_uvector_offsets():
    col = pa.array([["a", "b"], [], None, ["c"]], pa.list_(pa.string()))
    terms, row_idx, positions, lens = _tokenize_uvector(col)
    assert terms.to_pylist() == ["a", "b", "c"]
    assert row_idx.tolist() == [0, 0, 3]
    assert positions.tolist() == [0, 1, 0]
    assert lens.tolist() == [2, 0, 0, 1]


@pytest.fixture(scope="module")
def uvec_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("uvec")
    rng = np.random.default_rng(5)
    tags = [
        [f"t{rng.integers(0, 20)}" for _ in range(rng.integers(1, 5))] for _ in range(300)
    ]
    f = str(root / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(1, 301), pa.int64()),
                  "tags": pa.array(tags, pa.list_(pa.string()))}),
        f,
    )
    idx = str(root / "idx")
    cfg = BuildConfig(
        text_columns=("tags",), docid_column="doc_id", tokenizer="TokenUvector",
        n_buckets=4, target_rows_per_shard=100,
    )
    build_index([f], idx, cfg)
    return f, idx, tags


def test_uvector_match_and_scores(uvec_index):
    f, idx, tags = uvec_index
    t = IndexedTable(idx, [f], "doc_id")
    for term in ("t3", "t17"):
        res = select(t, query=term, match_columns="tags", limit=-1)
        got = dict(zip(res["rows"].column("_id").to_pylist(),
                       res["rows"].column("_score").to_pylist()))
        want = {i + 1: float(tg.count(term)) for i, tg in enumerate(tags) if term in tg}
        assert got == want, term


def test_uvector_positions_phrase(uvec_index):
    # consecutive elements are consecutive positions -> phrase works
    f, idx, tags = uvec_index
    t = IndexedTable(idx, [f], "doc_id")
    pair = next(
        (i, tg) for i, tg in enumerate(tags) if len(tg) >= 2
    )
    i, tg = pair
    res = select(t, query=f'"{tg[0]} {tg[1]}"', match_columns="tags", limit=-1)
    assert (i + 1) in res["rows"].column("_id").to_pylist()
