"""Unit tests for the training-data pipeline operators."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_exact_dedup(docs):
    from groonga_ray.pipelines.dedup import exact_dedup

    out = exact_dedup(docs).to_pandas()
    # sf0.001 texts are all distinct -> one group per doc
    assert len(out) == 500
    assert out["keep_id"].min() == 0


def test_minhash_similar_docs_collide():
    import ray.data
    from groonga_ray.pipelines.dedup import MinHashLSH, verify_jaccard

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again today",
        "completely different content about ray data pipelines and arrow",
    ]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "text": pa.array(texts)})
    h = MinHashLSH(n_perm=64, bands=16, shingle=3)
    out = h(t)
    df = out.to_pandas()
    # docs 1 and 2 share at least one band bucket; doc 3 shares none
    shared_12 = set(map(tuple, df[df.doc_id == 1][["band", "band_hash"]].values)) & set(
        map(tuple, df[df.doc_id == 2][["band", "band_hash"]].values)
    )
    shared_13 = set(map(tuple, df[df.doc_id == 1][["band", "band_hash"]].values)) & set(
        map(tuple, df[df.doc_id == 3][["band", "band_hash"]].values)
    )
    assert shared_12 and not shared_13
    j = verify_jaccard([texts[0]], [texts[1]])
    assert j[0] > 0.7


def test_simhash_hamming():
    from groonga_ray.pipelines.dedup import SimHasher

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon zeta eta theta",
                    "alpha beta gamma delta epsilon zeta eta iota",
                    "one two three four five six seven eight",
                ]
            ),
        }
    )
    out = SimHasher()(t).to_pandas()
    h = out["simhash"].to_numpy().view(np.uint64)
    d12 = bin(int(h[0]) ^ int(h[1])).count("1")
    d13 = bin(int(h[0]) ^ int(h[2])).count("1")
    assert d12 < d13


def test_token_stats_vs_python(docs):
    import re

    from groonga_ray.pipelines.textstats import token_stats

    out = token_stats(docs).to_pandas().set_index("doc_id")
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    pat = re.compile(r"[a-z0-9_]+")
    for i in [0, 17, 499]:
        did = t.column("doc_id")[i].as_py()
        words = pat.findall(t.column("text")[i].as_py().lower())
        assert out.loc[did, "n_tokens"] == len(words)
        assert out.loc[did, "n_uniq"] == len(set(words))


def test_brute_and_lsh_ann(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from groonga_ray.pipelines.ann import brute_cosine_topk, lsh_cosine_topk

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.array(emb.column("embedding").to_pylist(), np.float64)
    q = mat[0]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = brute_cosine_topk(ds, q[None, :], k=5).to_pandas()
    # numpy oracle
    sims = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
    order = np.lexsort((np.arange(len(sims)), -sims))[:5]
    assert got["vec_id"].tolist() == order.tolist()
    np.testing.assert_allclose(got["sim"].to_numpy(), sims[order], atol=1e-12)
    # LSH variant returns a subset ranked consistently, query's own bucket
    lsh = lsh_cosine_topk(ds, q, k=5, bits=4).to_pandas()
    assert 0 in lsh["vec_id"].tolist()  # the query vector itself survives
    assert (np.diff(lsh["sim"].to_numpy()) <= 1e-12).all()


def test_media_decode_contract(docs):
    from groonga_ray.pipelines.multimodal import decode_media, texts_as_media

    out = decode_media(texts_as_media(docs)).to_pandas()
    assert len(out) == 500
    assert (out["n_bytes"] > 0).all()
    # text payloads carry no media magic -> fallback decoder
    assert (out["decoder"] == "fallback").all()
    assert {"media_id", "kind", "decoder", "n_bytes", "crc32", "width",
            "height", "channels", "sample_rate", "duration_ms"} <= set(out.columns)
    with pytest.raises(NotImplementedError):
        from groonga_ray.pipelines.multimodal import MediaDecoder

        MediaDecoder(real_codecs_required=True)


def test_ivf_ann(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from groonga_ray.pipelines.ann import brute_cosine_topk, ivf_cosine_topk

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.array(emb.column("embedding").to_pylist(), np.float64)
    q = mat[3]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = brute_cosine_topk(ds, q[None, :], k=10).to_pandas()
    approx = ivf_cosine_topk(ds, q, k=10, n_centroids=8, n_probe=4).to_pandas()
    # approx is a subset-ranked result; recall@10 should be decent and
    # the query's own vector must be found
    recall = len(set(approx.vec_id) & set(exact.vec_id)) / 10
    assert recall >= 0.5
    assert 3 in approx.vec_id.tolist()
    assert (np.diff(approx.sim.to_numpy()) <= 1e-12).all()


def test_fingerprint_order_sensitive():
    from groonga_ray.pipelines.textstats import Fingerprint

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta gamma", "gamma beta alpha", "alpha beta gamma"]),
        }
    )
    out = Fingerprint()(t).to_pandas()
    f = out["fingerprint"].tolist()
    assert f[0] == f[2]      # identical text, identical fingerprint
    assert f[0] != f[1]      # permutation changes it


def test_ivf_persisted_and_recall(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from groonga_ray.pipelines.ann import IvfIndex, brute_cosine_topk

    sf = "/root/testdata/sf0.001"
    emb = pq.read_table(f"{sf}/embeddings.parquet")
    ds = ray.data.read_parquet([f"{sf}/embeddings.parquet"], columns=["vec_id", "embedding"])
    idx_dir = str(tmp_path / "ivf")
    idx = IvfIndex.build(ds, idx_dir, n_lists=8, seed=42)
    # persisted: a second open re-reads the SAME lists, no rebuild
    import os
    lists = sorted(os.listdir(os.path.join(idx_dir, "lists")))
    assert any(d.startswith("ivf_list=") for d in lists)
    q = np.asarray(emb.column("embedding")[3].as_py(), np.float64)
    exact = brute_cosine_topk(ds, q[None, :], k=10).column("vec_id").to_pylist()
    # full probe == exact
    full = IvfIndex(idx_dir).query(q, k=10, n_probe=8).column("vec_id").to_pylist()
    assert full == exact
    # partial probe: recall@10 >= 0.9
    part = IvfIndex(idx_dir).query(q, k=10, n_probe=4).column("vec_id").to_pylist()
    recall = len(set(part) & set(exact)) / 10
    assert recall >= 0.9, recall


def test_lsh_multiprobe_recall(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from groonga_ray.pipelines.ann import brute_cosine_topk, lsh_cosine_topk

    sf = "/root/testdata/sf0.001"
    emb = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.asarray(emb.column("embedding")[3].as_py(), np.float64)
    ds = ray.data.read_parquet([f"{sf}/embeddings.parquet"], columns=["vec_id", "embedding"])
    exact = set(brute_cosine_topk(ds, q[None, :], k=10).column("vec_id").to_pylist())
    single = set(lsh_cosine_topk(ds, q, k=10, bits=6, n_flip=0).column("vec_id").to_pylist())
    multi1 = set(lsh_cosine_topk(ds, q, k=10, bits=6, n_flip=1).column("vec_id").to_pylist())
    multi2 = set(lsh_cosine_topk(ds, q, k=10, bits=6, n_flip=2).column("vec_id").to_pylist())
    # each probe ring strictly improves recall on this fixture
    assert len(multi1 & exact) >= len(single & exact)
    assert len(multi2 & exact) >= len(multi1 & exact)
    assert len(multi2 & exact) >= 6


def test_sliding_window_membership(ray_session):
    import duckdb
    import ray.data

    from groonga_ray.pipelines.windows import sliding_window_agg, tumbling_window_agg

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    out = sliding_window_agg(ds, 3_600_000_000, 900_000_000).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT event_type,
               (epoch_us(ts) // 900000000 * 900000000 - j.j * 900000000)::BIGINT AS window_us,
               count(*)::BIGINT AS n
        FROM '{SF}/events.parquet' CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
        GROUP BY 1, 2
        """
    ).df()
    g = out.sort_values(["event_type", "window_us"]).reset_index(drop=True)
    w = want.sort_values(["event_type", "window_us"]).reset_index(drop=True)
    assert g["n"].astype(int).tolist() == w["n"].astype(int).tolist()
    # every event in exactly size/hop windows
    assert out["n"].sum() == 4 * duckdb.sql(f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    # hop == size degenerates to tumbling
    tw = tumbling_window_agg(ds, 3_600_000_000).to_pandas()
    assert tw["n"].sum() == out["n"].sum() / 4


def test_exact_path_guards(ray_session, monkeypatch):
    """The exact/small-corpus paths refuse oversized inputs and point at
    the scale variant (VERDICT r2 item 8)."""
    import ray
    import pyarrow as pa
    import pytest as _pytest

    from groonga_ray.pipelines import dedup

    ds = ray.data.from_arrow(
        pa.table({"vec_id": [1, 2], "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    )
    monkeypatch.setattr(type(ds), "count", lambda self: 3_000_000)
    with _pytest.raises(ValueError, match="embedding_dedup_lsh"):
        dedup.embedding_dup_pairs(ds)

    from groonga_ray import docids

    class _FakeMeta:
        num_rows = 6_000_000

    class _FakePF:
        def __init__(self, f):
            self.metadata = _FakeMeta()

    monkeypatch.setattr(docids.pq, "ParquetFile", _FakePF)
    with _pytest.raises(ValueError, match="sort_input_files"):
        docids.compute_rank_mapping(["x.parquet"], ["repo", "path"])


def test_ngram_jaccard_pairs_exact(ray_session):
    """Exact Jaccard pairs match a brute-force computation on small input."""
    import ray.data
    from groonga_ray.pipelines.dedup import ngram_jaccard_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog",       # 0
        "the quick brown fox jumps over the lazy cat",       # 1 near-dup of 0
        "completely different content here with no overlap",  # 2
        "the quick brown fox jumps over the lazy dog",       # 3 exact dup of 0
        "zz",                                                 # 4 shorter than k=5
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    )
    out = ngram_jaccard_pairs(ds, k=5, threshold=0.5).to_pandas()
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    # brute force
    def sh(t):
        return {t[i : i + 5] for i in range(len(t) - 4)}

    expect = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = sh(texts[a]), sh(texts[b])
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.5:
                expect.append((a, b, round(j, 6)))
    got = list(zip(out.doc_a, out.doc_b, out.jaccard.round(6)))
    assert sorted(got) == sorted(expect)
    assert (0, 3, 1.0) in got  # the exact dup pair scores 1.0


def test_ngram_jaccard_max_df_drops_stop_shingles(ray_session):
    import ray.data
    from groonga_ray.pipelines.dedup import ngram_jaccard_pairs

    # every doc shares the boilerplate prefix; with max_df=2 the shared
    # shingles are dropped from pair generation, so no pair survives
    texts = ["LICENSE HEADER unique%d" % i for i in range(6)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(6), pa.int64()), "text": pa.array(texts)})
    )
    full = ngram_jaccard_pairs(ds, k=5, threshold=0.5).to_pandas()
    capped = ngram_jaccard_pairs(ds, k=5, threshold=0.5, max_df=2).to_pandas()
    assert len(full) >= len(capped)
    assert len(capped) == 0


# ------------------------------------------------------- decontamination

def test_decontaminate_flags_exact_overlap(ray_session):
    import ray.data

    from groonga_ray.pipelines.decontaminate import decontaminate

    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps",   # contains eval 3-gram
                        "totally unrelated words here",
                        "quick brown fox again and quick brown fox",  # two windows
                    ]
                ),
            }
        )
    )
    eval_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100], pa.int64()),
                "text": pa.array(["a quick brown fox story"]),
            }
        )
    )
    out = decontaminate(train, eval_ds, n=3, concurrency=1).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == {1: 1, 3: 2}


def test_decontaminate_empty_eval(ray_session):
    import ray.data

    from groonga_ray.pipelines.decontaminate import decontaminate

    train = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["a b c"])})
    )
    eval_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = decontaminate(train, eval_ds, n=3, concurrency=1).to_pandas()
    assert len(out) == 0


# ------------------------------------------------------------- IVF-PQ ANN

def test_ivfpq_refined_matches_brute(ray_session, tmp_path):
    import ray.data
    import pyarrow.parquet as pqt

    from groonga_ray.pipelines.ann import brute_cosine_topk, ivfpq_cosine_topk

    sf = "/root/testdata/sf0.01/embeddings.parquet"
    emb = pqt.read_table(sf)
    q = np.asarray(emb.column("embedding")[0].as_py(), np.float64)
    ds = ray.data.read_parquet(sf, columns=["vec_id", "embedding"])
    bf = brute_cosine_topk(ds, q[None, :], k=10)
    out = ivfpq_cosine_topk(
        ds, q, k=10, n_lists=8, n_probe=8, refine=10,
        index_dir=str(tmp_path / "ivfpq"),
    )
    # full probe + covering re-rank (refine*k >= list size) == brute
    assert out.column("vec_id").to_pylist() == bf.column("vec_id").to_pylist()


def test_ivfpq_adc_recall_on_clustered(ray_session, tmp_path):
    """Plain ADC (no refine) keeps usable recall on clusterable data;
    codes are 8 bytes/vector vs 512 for raw float64 (the memory path)."""
    import pyarrow.parquet as pqt
    import ray.data

    from groonga_ray.pipelines.ann import brute_cosine_topk, ivfpq_cosine_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, 64))
    assign = rng.integers(0, 20, 2000)
    X = centers[assign] + 0.15 * rng.normal(size=(2000, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(2000), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in X], pa.list_(pa.float64())),
        }
    )
    f = str(tmp_path / "emb.parquet")
    pqt.write_table(tbl, f)
    ds = ray.data.read_parquet(f)
    q = X[5]
    want = set(brute_cosine_topk(ds, q[None, :], k=10).column("vec_id").to_pylist())
    out = ivfpq_cosine_topk(
        ds, q, k=10, n_lists=16, n_probe=4, index_dir=str(tmp_path / "idx")
    )
    got = set(out.column("vec_id").to_pylist())
    assert len(got & want) >= 3  # ADC-only floor (IVFADC-typical)
    ref = ivfpq_cosine_topk(
        ds, q, k=10, n_lists=16, n_probe=4, refine=5,
        index_dir=str(tmp_path / "idx"),
    )
    assert len(set(ref.column("vec_id").to_pylist()) & want) >= 9
    # stored codes really are M bytes per vector
    import glob as _g
    import json as _j

    meta = _j.load(open(str(tmp_path / "idx" / "meta.json")))
    t = pqt.read_table(_g.glob(str(tmp_path / "idx" / "lists" / "*" / "*.parquet"))[0])
    assert len(t.column("pq_code")[0].as_py()) == meta["m"] == 8


def test_semantic_dedup(ray_session, tmp_path):
    import pyarrow.parquet as pqt
    import ray.data

    from groonga_ray.pipelines.dedup import semantic_dedup

    rng = np.random.default_rng(3)
    base = rng.normal(size=(50, 32))
    rows, ids = [], []
    for i, b in enumerate(base):
        rows.append(b)
        ids.append(i * 10)
        if i % 5 == 0:  # a near-duplicate (tiny perturbation)
            rows.append(b + 1e-4 * rng.normal(size=32))
            ids.append(i * 10 + 1)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows], pa.list_(pa.float64())),
    })
    f = str(tmp_path / "se.parquet")
    pqt.write_table(tbl, f)
    out = semantic_dedup(
        ray.data.read_parquet(f), n_clusters=4, threshold=0.99
    ).to_pandas()
    assert len(out) == len(ids)
    kept = set(out[out["keep"]]["doc_id"])
    dropped = set(out[~out["keep"]]["doc_id"])
    # every near-dup (id%10==1) dropped, its original (smaller id) kept
    for d in dropped:
        assert d % 10 == 1 and (d - 1) in kept
    assert {i * 10 + 1 for i in range(0, 50, 5)} == dropped
    assert not out["capped"].any()


def test_dup_clusters_matches_union_find(ray_session):
    """Large-star/small-star CC vs a driver-side union-find oracle on a
    graph with a long chain (worst-case diameter), cliques, and random
    edges."""
    import collections

    import numpy as np
    import ray.data as rd

    from groonga_ray.pipelines.dedup import dup_clusters

    rng = np.random.default_rng(7)
    pairs = [(i, i + 1) for i in range(100, 140)]           # 41-node chain
    pairs += [(200 + i, 200 + j) for i in range(6) for j in range(i + 1, 6)]
    pairs += [(int(a), int(b)) for a, b in rng.integers(1000, 1100, size=(60, 2)) if a != b]
    pairs += [(5000, 4000), (4000, 5000), (4000, 4000)]      # dups + self loop

    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want = {}
    for start in adj:
        if start in want:
            continue
        comp, stack, seen = [], [start], {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            want[x] = m

    ds = rd.from_items([{"doc_a": a, "doc_b": b} for a, b in pairs])
    got = {r["doc"]: r["cluster"] for r in dup_clusters(ds, num_partitions=4).take_all()}
    assert got == want  # driver numpy path (small side)


def test_dup_clusters_distributed_path(ray_session):
    """Force the large-star/small-star rounds (driver_threshold=0) and
    check exactness on a chain + triangle."""
    import ray.data as rd

    from groonga_ray.pipelines.dedup import dup_clusters

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10)]
    ds = rd.from_items([{"doc_a": a, "doc_b": b} for a, b in pairs])
    got = {r["doc"]: r["cluster"] for r in
           dup_clusters(ds, num_partitions=2, driver_threshold=0).take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_dup_clusters_empty(ray_session):
    import ray.data as rd

    from groonga_ray.pipelines.dedup import dup_clusters

    ds = rd.from_items([{"doc_a": 3, "doc_b": 3}])  # self loop only
    out = dup_clusters(ds, num_partitions=2)
    assert out.take_all() == []


def test_repetition_stats_handcheck(ray_session):
    """Gopher-style repetition filters on hand-computed fixtures."""
    import pyarrow as pa

    from groonga_ray.pipelines.textstats import RepetitionStats

    texts = [
        "aaa bbb aaa bbb aaa bbb\nx\nx\ny",  # 'aaa bbb' x3, dup 'x' line
        "hello world",
        "",
        "line\nline\nline",
    ]
    batch = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    out = RepetitionStats().__call__(batch).to_pydict()
    # doc 0: 4 lines, 3 distinct -> 0.25; line chars 26, distinct 25
    assert out["dup_line_frac"][0] == 0.25
    assert out["dup_line_char_frac"][0] == round(1 - 25 / 26, 6)
    # top 2-gram 'aaa bbb' (c=3, len 7) over text len 29
    assert out["top2gram_char_frac"][0] == round(21 / 29, 6)
    # doc 1: single 2-gram covers 'hello world' exactly
    assert out["top2gram_char_frac"][1] == 1.0
    assert out["top3gram_char_frac"][1] == 0.0
    # doc 2 (empty): all zeros
    assert all(out[k][2] == 0.0 for k in out if k != "doc_id")
    # doc 3: 3 identical lines; overlapping 'line line' clamped to 1.0
    assert out["dup_line_frac"][3] == round(1 - 1 / 3, 6)
    assert out["top2gram_char_frac"][3] == 1.0


def test_sampling_deterministic_and_uniform(ray_session):
    """stratified_sample/train_eval_split: determinism across runs and
    partitionings; fnv fast path within tolerance of the target rate."""
    import ray.data as rd

    from groonga_ray.pipelines.sample import stratified_sample, train_eval_split

    rows = [{"doc_id": i, "lang": "en" if i % 3 else "de"} for i in range(3000)]
    ds1 = rd.from_items(rows).repartition(2)
    ds2 = rd.from_items(rows).repartition(7)

    for method in ("md5", "fnv"):
        a = sorted(r["doc_id"] for r in stratified_sample(ds1, {"en": 0.4}, method=method).take_all())
        b = sorted(r["doc_id"] for r in stratified_sample(ds2, {"en": 0.4}, method=method).take_all())
        assert a == b  # partitioning-independent
        n_en = sum(1 for r in rows if r["lang"] == "en")
        assert abs(len(a) / n_en - 0.4) < 0.05, (method, len(a), n_en)

    sp = {r["doc_id"]: r["split"] for r in train_eval_split(ds1, 0.1).take_all()}
    assert set(sp.values()) == {"eval", "train"}
    frac = sum(1 for v in sp.values() if v == "eval") / len(sp)
    assert abs(frac - 0.1) < 0.03
    # grows-stable: same ids keep their split in a superset corpus
    bigger = rd.from_items(rows + [{"doc_id": 10_000 + i, "lang": "en"} for i in range(500)])
    sp2 = {r["doc_id"]: r["split"] for r in train_eval_split(bigger, 0.1).take_all()}
    assert all(sp2[k] == v for k, v in sp.items())


def test_curation_pipeline(ray_session):
    """quality -> exact dedup -> stratified mix -> token budget; checks
    dedup keeps the min-id representative and quality rejects junk."""
    import ray.data as rd

    from groonga_ray.pipelines.curate import curate

    good = "the quick brown fox jumps over the lazy dog again and again"
    rows = (
        [{"doc_id": i, "text": good + f" v{i}", "lang": "en"} for i in range(10)]
        + [{"doc_id": 100, "text": good, "lang": "en"},
           {"doc_id": 101, "text": good, "lang": "en"}]        # exact dups
        + [{"doc_id": 200, "text": "!!! ??? %%% ^^^ &&&", "lang": "en"}]  # junk
    )
    ds = rd.from_items(rows)
    out = {r["doc_id"]: r for r in
           curate(ds, {"en": 1.0}, min_alpha=0.5, max_stop=0.9, num_partitions=2).take_all()}
    assert 200 not in out            # junk filtered by alpha_ratio
    assert 100 in out and 101 not in out  # dup cluster keeps min id
    assert all(r["n_bpe_tokens"] > 0 for r in out.values())


def test_redact_pii(ray_session):
    import ray.data as rd

    from groonga_ray.pipelines.pii import redact_pii

    rows = [
        {"doc_id": 1, "text": "mail a.smith+x@corp.example.co.uk now"},
        {"doc_id": 2, "text": "server at 10.0.255.7 port 80"},
        {"doc_id": 3, "text": "call +44 (0)20 7946-0958 today"},
        {"doc_id": 4, "text": "clean text, nothing here"},
    ]
    out = {r["doc_id"]: r for r in redact_pii(rd.from_items(rows)).take_all()}
    assert out[1]["text"] == "mail <EMAIL> now" and out[1]["n_emails"] == 1
    assert out[2]["text"] == "server at <IP> port 80" and out[2]["n_ips"] == 1
    assert out[3]["text"] == "call <PHONE> today" and out[3]["n_phones"] == 1
    assert out[4]["text"] == rows[3]["text"]
    assert out[4]["n_emails"] == out[4]["n_ips"] == out[4]["n_phones"] == 0


def test_paragraph_dedup(ray_session):
    """Corpus-wide paragraph dedup keeps only the first occurrence (by
    doc_id, then paragraph index); emptied docs are dropped."""
    import ray.data as rd

    from groonga_ray.pipelines.dedup import paragraph_dedup

    SEP = "\n\n"
    rows = [
        {"doc_id": 1, "text": SEP.join(["alpha one", "SHARED", "beta two"])},
        {"doc_id": 2, "text": SEP.join(["gamma", "SHARED", "delta"])},
        {"doc_id": 3, "text": SEP.join(["SHARED", "SHARED"])},
        {"doc_id": 4, "text": "unique only"},
    ]
    out = {r["doc_id"]: r["text"]
           for r in paragraph_dedup(rd.from_items(rows), num_partitions=2).take_all()}
    assert out == {
        1: SEP.join(["alpha one", "SHARED", "beta two"]),
        2: SEP.join(["gamma", "delta"]),
        4: "unique only",
    }


def test_sessionize_gaps(ray_session):
    import ray.data as rd

    from groonga_ray.pipelines.windows import sessionize

    US = 1_000_000
    rows = [
        {"event_id": 1, "user_id": 7, "ts": 0},
        {"event_id": 2, "user_id": 7, "ts": 30 * US},        # same session
        {"event_id": 3, "user_id": 7, "ts": 200 * US},       # gap > 60 s -> new
        {"event_id": 4, "user_id": 9, "ts": 10 * US},        # other user
        {"event_id": 5, "user_id": 7, "ts": 260 * US},       # boundary: ==60 s, same
    ]
    out = {r["event_id"]: (r["session_seq"], r["session_start_us"])
           for r in sessionize(rd.from_items(rows), 60 * US, num_partitions=2).take_all()}
    assert out[1] == (0, 0) and out[2] == (0, 0)
    assert out[3] == (1, 200 * US) and out[5] == (1, 200 * US)
    assert out[4] == (0, 10 * US)


def test_grouped_topk(ray_session):
    import ray.data as rd

    from groonga_ray.pipelines.windows import grouped_topk

    rows = [{"event_id": i, "event_type": "a" if i % 2 else "b", "value": float(i % 7)}
            for i in range(40)]
    out = grouped_topk(rd.from_items(rows).repartition(5), 3, num_partitions=2).take_all()
    by_key = {}
    for r in out:
        by_key.setdefault(r["event_type"], []).append((r["value"], r["event_id"]))
    # top-3 per key by (value desc, id asc)
    for key in ("a", "b"):
        want = sorted(
            ((float(i % 7), i) for i in range(40) if ("a" if i % 2 else "b") == key),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        assert sorted(by_key[key], key=lambda t: (-t[0], t[1])) == want


def test_exact_quantiles_matches_sorted(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from groonga_ray.pipelines.quantiles import exact_quantiles

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(size=80_000), rng.exponential(size=20_000) * 50])
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)})).repartition(6)
    out = exact_quantiles(ds, (0.25, 0.5, 0.875), sample_target=2000).to_pydict()
    sv = np.sort(vals)
    for q, got in zip(out["q"], out["value"]):
        assert got == sv[max(0, math.ceil(q * len(sv)) - 1)], q


def test_exact_quantiles_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from groonga_ray.pipelines.quantiles import exact_quantiles

    ds = rd.from_arrow(pa.table({"value": pa.array([], pa.float64())}))
    assert exact_quantiles(ds).num_rows == 0


def test_exact_quantiles_heavy_ties(ray_session):
    """A distribution dominated by one repeated value: the sample hash
    mixes a per-row component, so duplicates are not sampled as a unit
    and the bracket still lands (the value-keyed hash collapsed all
    duplicates into one sample decision and could miss)."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from groonga_ray.pipelines.quantiles import exact_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([np.zeros(90_000), rng.normal(size=10_000)])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)})).repartition(5)
    out = exact_quantiles(ds, (0.25, 0.5, 0.875), sample_target=2000).to_pydict()
    sv = np.sort(vals)
    for q, got in zip(out["q"], out["value"]):
        assert got == sv[max(0, math.ceil(q * len(sv)) - 1)], q


def test_unigram_nll_exact_vocab_guard(ray_session):
    """Exact mode must refuse to broadcast a vocabulary above the cap
    and point at the capped path."""
    import pytest
    import ray.data as rd

    from groonga_ray.pipelines.lm import unigram_nll

    rows = [{"doc_id": i, "text": f"tok{i} tok{i + 1} tok{i + 2}"} for i in range(40)]
    with pytest.raises(ValueError, match="vocab_topk"):
        unigram_nll(rd.from_items(rows), max_exact_vocab=10).take_all()
    # the capped path stays available under the same cap
    out = unigram_nll(
        rd.from_items(rows), vocab_topk=10, max_exact_vocab=10
    ).take_all()
    assert len(out) == 40 and all(r["nll"] > 0 for r in out)


def test_ngram_jaccard_id_range_guard(ray_session):
    """doc ids outside [0, 2^32) would corrupt the packed pair key —
    the op must fail loudly instead."""
    import pytest
    import ray.data as rd

    from groonga_ray.pipelines.dedup import ngram_jaccard_pairs

    rows = [
        {"doc_id": 1 << 40, "text": "alpha beta gamma delta epsilon"},
        {"doc_id": 2, "text": "alpha beta gamma delta epsilon"},
    ]
    with pytest.raises((ValueError, Exception), match="2\\^32"):
        ngram_jaccard_pairs(rd.from_items(rows)).take_all()


def test_hll_accuracy_and_merge_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from groonga_ray.pipelines.cardinality import hll_count

    n_true = 37_000
    rows = pa.table({
        "event_type": pa.array(["k"] * 100_000),
        "user_id": pa.array(np.arange(100_000) % n_true),
    })
    e1 = hll_count(rd.from_arrow(rows).repartition(3), b=12).to_pydict()
    e2 = hll_count(rd.from_arrow(rows).repartition(11), b=12).to_pydict()
    assert e1 == e2  # register merge is partitioning-invariant
    assert abs(e1["estimate"][0] - n_true) / n_true < 0.05
    # streaming path (collect=False): key-sorted Dataset, same values
    ds_out = hll_count(rd.from_arrow(rows).repartition(3), b=12, collect=False)
    import ray.data

    assert isinstance(ds_out, ray.data.Dataset)
    pdf = ds_out.to_pandas()
    assert list(pdf["key"]) == e1["key"]
    assert list(pdf["estimate"]) == e1["estimate"]


def test_stable_hash_env_pins_fnv1a(monkeypatch):
    """GROONGA_RAY_STABLE_HASH=1 pins minhash token hashing to fnv1a
    (the cross-environment contract documented in _hash_tokens)."""
    import pyarrow as pa

    from groonga_ray.pipelines.dedup import _hash_tokens
    from groonga_ray.utils import fnv1a

    terms = pa.array(["alpha", "beta", "gamma", ""], pa.large_string())
    monkeypatch.setenv("GROONGA_RAY_STABLE_HASH", "1")
    pinned = _hash_tokens(terms)
    assert pinned.tolist() == fnv1a(terms).tolist()
    monkeypatch.delenv("GROONGA_RAY_STABLE_HASH")
    default = _hash_tokens(terms)
    assert default.dtype == pinned.dtype and len(default) == len(pinned)


def test_broadcast_join_inner_and_left(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from groonga_ray.pipelines.join import broadcast_join

    ds = rd.from_items([{"doc_id": i, "lang": ["en", "de", "xx"][i % 3]} for i in range(30)])
    small = pa.table({"lang": pa.array(["en", "de"]), "w": pa.array([2.0, 0.5])})
    inner = broadcast_join(ds, small, "lang").take_all()
    assert len(inner) == 20 and all(r["lang"] != "xx" for r in inner)
    assert all(r["w"] == (2.0 if r["lang"] == "en" else 0.5) for r in inner)
    left = broadcast_join(ds, small, "lang", how="left").take_all()
    assert len(left) == 30
    assert sum(1 for r in left if r["w"] is None) == 10


def test_exact_dedup_incremental_store(ray_session, tmp_path):
    """Cross-ingest dedup: second ingest rejects content seen in the
    first; retrying an ingest is idempotent (same segment overwritten)."""
    import ray.data as rd

    from groonga_ray.pipelines.dedup import exact_dedup_incremental

    store = str(tmp_path / "store")
    r1 = [{"doc_id": i, "text": f"content {i % 5}"} for i in range(10)]
    a1 = sorted(r["doc_id"] for r in
                exact_dedup_incremental(store, rd.from_items(r1), "i1", n_parts=4).take_all())
    assert a1 == [0, 1, 2, 3, 4]

    r2 = [{"doc_id": 100 + i, "text": f"content {3 + i % 5}"} for i in range(10)]
    a2 = sorted(r["doc_id"] for r in
                exact_dedup_incremental(store, rd.from_items(r2), "i2", n_parts=4).take_all())
    assert a2 == [102, 103, 104]  # c3/c4 rejected, c5..c7 accepted

    # crashed-retry of ingest 2: identical acceptance
    a2b = sorted(r["doc_id"] for r in
                 exact_dedup_incremental(store, rd.from_items(r2), "i2", n_parts=4).take_all())
    assert a2b == a2

    # third ingest of everything: all rejected
    a3 = exact_dedup_incremental(store, rd.from_items(r1 + r2), "i3", n_parts=4).take_all()
    assert a3 == []


def test_unigram_nll_orders_quality(ray_session):
    """Rare-token soup must score higher (worse) than common text, and
    the capped-vocab path must stay close to exact."""
    import ray.data as rd

    from groonga_ray.pipelines.lm import unigram_nll

    common = "the quick brown fox jumps over the lazy dog"
    rows = [{"doc_id": i, "text": common} for i in range(20)]
    rows.append({"doc_id": 100, "text": "zxqv jkwpt mmbrg aawxz qqoplk"})  # rare soup
    rows.append({"doc_id": 101, "text": ""})
    out = {r["doc_id"]: r["nll"] for r in unigram_nll(rd.from_items(rows)).take_all()}
    assert out[100] > out[0] > 0
    assert out[101] == 0.0
    capped = {r["doc_id"]: r["nll"]
              for r in unigram_nll(rd.from_items(rows), vocab_topk=8).take_all()}
    assert capped[0] == out[0]          # common tokens all in top-8 vocab
    assert capped[100] >= out[100]      # OOV floor only penalizes more


def test_frequent_terms_sketch_bounds(ray_session):
    """Misra-Gries guarantees: every term with freq > n/m present, and
    estimates under-count by at most n/m; partitioning-stable top."""
    import ray.data as rd

    from groonga_ray.pipelines.heavyhitters import frequent_terms_sketch, top_terms

    rows = []
    for i in range(3000):
        # zipf-ish: 'hot' everywhere, 'warm' half, long tail unique
        t = ["hot", "hot", "warm" if i % 2 else f"tail{i}", "mid" if i % 10 == 0 else f"t{i}"]
        rows.append({"doc_id": i, "text": " ".join(t)})
    ds = rd.from_items(rows).repartition(5)
    n_tokens = 4 * 3000
    m = 64
    sk = dict(zip(*frequent_terms_sketch(ds, m=m).to_pydict().values()))
    exact = dict(zip(*top_terms(ds, 5).to_pydict().values()))
    for t in ("hot", "warm"):
        assert t in sk
        assert 0 <= exact[t] - sk[t] <= n_tokens / m * 6  # merge slack
    assert list(exact)[0] == "hot" and exact["hot"] == 6000
