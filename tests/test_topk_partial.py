"""top_k partial-sort path: exactness vs the full lexsort, including
the k=0 / offset edges and heavy score ties at the cut boundary
(regression: limit=0 through the argpartition path raised on an empty
reduction — logical_count conformance)."""
import numpy as np

from groonga_ray.search import MatchResult, top_k


def _full_sort(m, k, offset=0, tie="asc"):
    second = m.docids if tie == "asc" else m.docids.astype(np.int64) * -1
    order = np.lexsort((second, -m.scores))[: offset + k][offset:]
    return m.docids[order], m.scores[order]


def test_topk_partial_matches_full_sort():
    rng = np.random.default_rng(3)
    n = 50_000
    docids = np.arange(1, n + 1, dtype=np.uint64)
    # quantized scores force many exact ties at every boundary
    scores = np.round(rng.random(n), 3)
    m = MatchResult(docids, scores)
    for k in (0, 1, 10, 100):
        for offset in (0, 5):
            for tie in ("asc", "desc"):
                got = top_k(m, k, offset, tie)
                want = _full_sort(m, k, offset, tie)
                assert got[0].tolist() == want[0].tolist(), (k, offset, tie)
                assert got[1].tolist() == want[1].tolist(), (k, offset, tie)


def test_topk_limit_zero_large_n():
    m = MatchResult(np.arange(1, 1001, dtype=np.uint64), np.ones(1000))
    d, s = top_k(m, 0)
    assert len(d) == 0 and len(s) == 0


def test_topk_all_tied():
    # every score equal: the boundary candidate set is the whole input
    m = MatchResult(np.arange(1, 100_001, dtype=np.uint64), np.full(100_000, 2.5))
    d, s = top_k(m, 10)
    assert d.tolist() == list(range(1, 11))
    d2, _ = top_k(m, 10, tie="desc")
    assert d2.tolist() == list(range(100_000, 99_990, -1))
