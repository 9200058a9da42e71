"""Similarity search over an embedding column (list<float>).

* brute-force cosine top-k: the query matrix is broadcast once
  (``ray.put``), every batch does one float64 matmul — the baseline.
* LSH-bucketed variant: random-hyperplane signatures bucket the
  vectors; only the query's bucket (+ optional neighbor probes) is
  scanned — the scale path, same map_batches shape.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(col[0])
    return values.reshape(len(col), dim)


class BruteCosine:
    """map_batches callable: per batch, cosine of every vector vs the
    broadcast query matrix; emits (vec_id, qid, sim)."""

    def __init__(self, queries_ref, id_col="vec_id", vec_col="embedding"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = np.asarray(q, np.float64)
        self.qn = self.q / np.linalg.norm(self.q, axis=1, keepdims=True)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(self.vec_col))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.qn.T            # (n, Q)
        n, Q = sims.shape
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, Q)),
                "qid": pa.array(np.tile(np.arange(Q, dtype=np.int32), n), pa.int32()),
                "sim": pa.array(sims.reshape(-1), pa.float64()),
            }
        )


def brute_cosine_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact top-k per query. Per-batch partial top-k inside the map
    stage, tiny driver-side merge — no global sort."""
    q = np.atleast_2d(np.asarray(queries, np.float64))
    queries_ref = ray.put(q)
    k_eff = k

    class PartialTopK(BruteCosine):
        def __call__(self, batch: pa.Table) -> pa.Table:
            full = BruteCosine.__call__(self, batch)
            sims = full.column("sim").to_numpy(zero_copy_only=False)
            qids = full.column("qid").to_numpy(zero_copy_only=False)
            keep = []
            for qq in range(len(q)):
                idx = np.flatnonzero(qids == qq)
                if len(idx) > k_eff:
                    part = idx[np.argpartition(-sims[idx], k_eff)[:k_eff]]
                else:
                    part = idx
                keep.append(part)
            return full.take(pa.array(np.concatenate(keep)))

    # instance-as-task (not an actor pool): two chained actor pools can
    # reserve every CPU of a small session and starve the upstream read
    # (observed deadlock); the per-task state here is tiny. At scale,
    # switch to an actor pool sized below the node's CPU count.
    parts = ds.map_batches(
        PartialTopK(queries_ref, id_col, vec_col), batch_format="pyarrow"
    ).take_all()
    # driver merge (Q * k * n_batches rows — small)
    best: dict[int, list] = {}
    for row in parts:
        h = best.setdefault(int(row["qid"]), [])
        item = (float(row["sim"]), -int(row["vec_id"]))
        if len(h) < k:
            heapq.heappush(h, item)
        elif item > h[0]:
            heapq.heapreplace(h, item)
    out = {"qid": [], "vec_id": [], "sim": [], "rank": []}
    for qq in sorted(best):
        ranked = sorted(best[qq], key=lambda x: (-x[0], -x[1]))
        for r, (s, nid) in enumerate(ranked, 1):
            out["qid"].append(qq)
            out["vec_id"].append(-nid)
            out["sim"].append(s)
            out["rank"].append(r)
    return pa.table(
        {
            "qid": pa.array(out["qid"], pa.int32()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "sim": pa.array(out["sim"], pa.float64()),
            "rank": pa.array(out["rank"], pa.int32()),
        }
    )


def _hash_sample(ds: ray.data.Dataset, id_col: str, vec_col: str, cap: int, mod: int) -> np.ndarray:
    """Deterministic UNBIASED sample: rows whose Knuth-hashed id falls
    in 1/mod of the space (not first-N — a limit() sample is ordered and
    biased). One column-pruned streaming pass."""
    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        return batch.filter(pa.array(h % np.uint64(mod) == 0))

    rows, idss = [], []
    total = 0
    for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        rows.append(_to_matrix(b.column(vec_col)))
        idss.append(b.column(id_col).to_numpy(zero_copy_only=False))
        total += b.num_rows
        if total >= cap * 2:
            break
    if not rows:
        return np.empty((0, 1))
    m = np.concatenate(rows)
    ids = np.concatenate(idss)
    # batch arrival order is nondeterministic under a streaming
    # executor: canonicalize by id so centroid training (and thus
    # every derived index/cluster) is reproducible given the inputs
    return m[np.argsort(ids, kind="stable")][:cap]


def _kmeans(m: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = (m @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


class IvfIndex:
    """Persisted IVF index: built ONCE — centroids trained on a
    hash-sampled subset, every vector assigned via broadcast centroids
    inside map_batches, postings written as one Parquet partition per
    list (``ivf_list=N/``). Queries read ONLY the ``n_probe`` probed
    list partitions (partition-pruned read), never re-assign the
    corpus. This is the scale path: build cost amortizes over queries,
    query I/O ~ n_probe/n_lists of the corpus."""

    def __init__(self, index_dir: str):
        import json
        import os

        with open(os.path.join(index_dir, "meta.json")) as fh:
            self.meta = json.load(fh)
        self.dir = index_dir
        import pyarrow.parquet as pq

        cent = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        self.centroids = _to_matrix(cent.column("centroid"))

    @staticmethod
    def build(
        ds: ray.data.Dataset, index_dir: str, n_lists: int = 16,
        vec_col: str = "embedding", id_col: str = "vec_id",
        seed: int = 42, sample_cap: int = 50_000,
    ) -> "IvfIndex":
        import json
        import os

        n_rows = ds.count()
        mod = max(1, n_rows // sample_cap) if n_rows else 1
        sample = _hash_sample(ds, id_col, vec_col, sample_cap, mod)
        cent = _kmeans(sample, n_lists, seed=seed)
        cent_ref = ray.put(cent)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _to_matrix(batch.column(vec_col))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            lists = (mn @ c.T).argmax(axis=1).astype(np.int32)
            return batch.append_column("ivf_list", pa.array(lists, pa.int32()))

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            os.path.join(index_dir, "lists"), partition_cols=["ivf_list"]
        )
        import pyarrow.parquet as pq

        dim = cent.shape[1]
        pq.write_table(
            pa.table({"centroid": pa.array(list(cent), pa.list_(pa.float64()))}),
            os.path.join(index_dir, "centroids.parquet"),
        )
        with open(os.path.join(index_dir, "meta.json"), "w") as fh:
            json.dump({"n_lists": int(len(cent)), "dim": int(dim),
                       "vec_col": vec_col, "id_col": id_col, "seed": seed}, fh)
        return IvfIndex(index_dir)

    def query(self, query: np.ndarray, k: int = 10, n_probe: int = 4) -> pa.Table:
        import glob
        import os

        q = np.asarray(query, np.float64).reshape(1, -1)
        qn = q / max(np.linalg.norm(q), 1e-12)
        order = np.argsort(-(self.centroids @ qn.ravel()))
        probes = order[: min(n_probe, len(order))].tolist()
        files = [
            f for p in probes
            for f in glob.glob(os.path.join(self.dir, "lists", f"ivf_list={p}", "*.parquet"))
        ]
        if not files:
            return brute_cosine_topk(ray.data.from_items([]), q, k)
        cand = ray.data.read_parquet(
            files, columns=[self.meta["id_col"], self.meta["vec_col"]]
        )
        return brute_cosine_topk(cand, q, k, self.meta["id_col"], self.meta["vec_col"])


def ivf_cosine_topk(
    ds: ray.data.Dataset, query: np.ndarray, k: int = 10, n_centroids: int = 16,
    n_probe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 42,
    index_dir: str | None = None,
) -> pa.Table:
    """IVF ANN through the persisted index (built once per
    ``index_dir``+config, reused across queries)."""
    import hashlib
    import json
    import os

    if index_dir is None:
        # the cache key must carry DATASET identity, not just config —
        # otherwise a different corpus silently reuses a stale index
        try:
            ident = sorted(ds.input_files())
        except Exception:
            ident = None
        if not ident:
            raise ValueError(
                "ivf_cosine_topk: pass index_dir= for datasets without "
                "stable input_files() (the default cache key needs them)"
            )
        key = hashlib.md5(
            json.dumps([ident, n_centroids, vec_col, id_col, seed]).encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/groonga_ray_cache/ivf_{key}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        IvfIndex.build(ds, index_dir, n_centroids, vec_col, id_col, seed)
    return IvfIndex(index_dir).query(query, k, n_probe)


class LshBucketer:
    """Random-hyperplane signature (B bits) per vector — bucketed ANN."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 42, vec_col="embedding", id_col="vec_id"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.vec_col = vec_col
        self.id_col = id_col

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        out = np.zeros(len(m), np.uint32)
        for j in range(bits.shape[1]):
            out |= bits[:, j].astype(np.uint32) << np.uint32(j)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(self.vec_col))
        return batch.append_column("bucket", pa.array(self.signature(m), pa.uint32()))


def lsh_cosine_topk(
    ds: ray.data.Dataset, query: np.ndarray, k: int = 10, bits: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 42,
    n_flip: int = 1,
) -> pa.Table:
    """Approximate top-k with MULTI-PROBE: scan the query's signature
    bucket plus every bucket within Hamming distance ``n_flip``
    (bits+1 buckets at n_flip=1) — bounds the recall loss of
    single-probe LSH while still scanning ~(bits+1)/2^bits of the
    corpus. Same output schema as brute_cosine_topk."""
    q = np.asarray(query, np.float64).reshape(1, -1)
    bucketer = LshBucketer(q.shape[1], bits, seed, vec_col, id_col)
    target = int(bucketer.signature(q)[0])
    probes = {target}
    if n_flip >= 1:
        probes |= {target ^ (1 << j) for j in range(bits)}
    if n_flip >= 2:
        probes |= {
            target ^ (1 << i) ^ (1 << j)
            for i in range(bits) for j in range(i + 1, bits)
        }
    expr = " or ".join(f"bucket == {p}" for p in sorted(probes))
    bucketed = ds.map_batches(
        LshBucketer(q.shape[1], bits, seed, vec_col, id_col), batch_format="pyarrow"
    ).filter(expr=f"({expr})")
    return brute_cosine_topk(bucketed, q, k, id_col, vec_col)


# ------------------------------------------------------------------ IVF-PQ

def _kmeans_l2(m: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Plain L2 k-means (no normalization) for PQ subspace codebooks."""
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(m))
    cent = m[rng.choice(len(m), size=k, replace=False)].copy()
    for _ in range(iters):
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
        d = -2.0 * (m @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = m[mask].mean(axis=0)
    return cent


class IvfPqIndex:
    """IVF + product quantization: coarse lists as in :class:`IvfIndex`,
    vectors stored as M uint8 codes of their RESIDUAL to the list
    centroid (Jegou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011 — the public PQ formulation; nothing here
    derives from the reference repo, which has no vector search).

    This is the memory path for web-scale embedding search: M bytes per
    vector (e.g. 8) instead of 8*d (64-dim float64 = 512 bytes, a 64x
    reduction), so a probed list's codes stream through a worker at
    object-store speed. Queries score candidates with an asymmetric
    distance table (ADC): one (M x n_codes) table per probed list, then
    a vectorized gather-sum over the codes.
    """

    def __init__(self, index_dir: str):
        import json
        import os

        import pyarrow.parquet as pq

        with open(os.path.join(index_dir, "meta.json")) as fh:
            self.meta = json.load(fh)
        self.dir = index_dir
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        self.codebooks = np.load(os.path.join(index_dir, "codebooks.npy"))

    @staticmethod
    def build(
        ds: ray.data.Dataset, index_dir: str, n_lists: int = 16,
        m_subspaces: int = 8, n_codes: int = 256,
        vec_col: str = "embedding", id_col: str = "vec_id",
        seed: int = 42, sample_cap: int = 50_000,
    ) -> "IvfPqIndex":
        import json
        import os

        n_rows = ds.count()
        mod = max(1, n_rows // sample_cap) if n_rows else 1
        sample = _hash_sample(ds, id_col, vec_col, sample_cap, mod)
        sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        dim = sample.shape[1]
        if dim % m_subspaces:
            raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
        sub = dim // m_subspaces
        cent = _kmeans(sample, n_lists, seed=seed)
        # residual codebooks per subspace, trained on the sample
        d2 = -2.0 * (sample @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        res = sample - cent[d2.argmin(axis=1)]
        books = np.stack([
            _kmeans_l2(res[:, j * sub : (j + 1) * sub], n_codes, seed=seed + j)
            for j in range(m_subspaces)
        ])  # (M, n_codes, sub)
        cent_ref = ray.put((cent, books))

        def encode(batch: pa.Table) -> pa.Table:
            c, bk = ray.get(cent_ref)
            m = _to_matrix(batch.column(vec_col))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            d = -2.0 * (mn @ c.T) + (c * c).sum(axis=1)[None, :]
            lists = d.argmin(axis=1)
            r = mn - c[lists]
            codes = np.empty((len(mn), len(bk)), np.uint8)
            for j in range(len(bk)):
                rj = r[:, j * sub : (j + 1) * sub]
                dj = -2.0 * (rj @ bk[j].T) + (bk[j] * bk[j]).sum(axis=1)[None, :]
                codes[:, j] = dj.argmin(axis=1).astype(np.uint8)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "ivf_list": pa.array(lists.astype(np.int32), pa.int32()),
                    "pq_code": pa.array(list(codes), pa.list_(pa.uint8())),
                }
            )

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(encode, batch_format="pyarrow").write_parquet(
            os.path.join(index_dir, "lists"), partition_cols=["ivf_list"]
        )
        np.save(os.path.join(index_dir, "centroids.npy"), cent)
        np.save(os.path.join(index_dir, "codebooks.npy"), books)
        with open(os.path.join(index_dir, "meta.json"), "w") as fh:
            json.dump(
                {"n_lists": int(len(cent)), "dim": int(dim), "m": int(m_subspaces),
                 "sub": int(sub), "n_codes": int(n_codes), "vec_col": vec_col,
                 "id_col": id_col, "seed": seed},
                fh,
            )
        return IvfPqIndex(index_dir)

    def query(
        self, query: np.ndarray, k: int = 10, n_probe: int = 4,
        refine: int = 0, source_ds: "ray.data.Dataset | None" = None,
    ) -> pa.Table:
        """ADC top-k over the probed lists' codes. With ``refine=R > 0``
        and a ``source_ds``, the ADC shortlist of R*k candidates is
        re-ranked with exact vectors read back from the source via a
        vec-id predicate-pushdown scan (IVFADC+R: plain ADC recall@10
        is ~0.4-0.5 by construction — the 8-byte code can't separate
        near-ties; re-ranking restores it while still reading only the
        shortlist's row groups)."""
        import glob
        import os

        import pyarrow.parquet as pq

        meta = self.meta
        sub, m_sub = meta["sub"], meta["m"]
        q = np.asarray(query, np.float64).ravel()
        qn = q / max(np.linalg.norm(q), 1e-12)
        order = np.argsort(-(self.centroids @ qn))
        probes = order[: min(n_probe, len(order))].tolist()
        best: list[tuple[float, int]] = []
        for p in probes:
            files = glob.glob(os.path.join(self.dir, "lists", f"ivf_list={p}", "*.parquet"))
            if not files:
                continue
            qr = qn - self.centroids[p]
            # ADC table: T[j, c] = ||qr_j - codebook[j, c]||^2
            T = np.stack([
                ((qr[j * sub : (j + 1) * sub][None, :] - self.codebooks[j]) ** 2).sum(axis=1)
                for j in range(m_sub)
            ])
            for f in files:
                t = pq.read_table(f, columns=[meta["id_col"], "pq_code"])
                ids = t.column(meta["id_col"]).to_numpy(zero_copy_only=False)
                codes_col = t.column("pq_code")
                if isinstance(codes_col, pa.ChunkedArray):
                    codes_col = codes_col.combine_chunks()
                codes = codes_col.values.to_numpy(zero_copy_only=False).reshape(len(ids), m_sub)
                d2 = T[np.arange(m_sub)[None, :], codes].sum(axis=1)
                # unit vectors: cos = 1 - d^2/2 (approximate, via PQ)
                sims = 1.0 - d2 / 2.0
                keep = (refine if refine else 1) * k
                for i in np.argsort(-sims)[: keep]:
                    best.append((float(sims[i]), int(ids[i])))
        best.sort(key=lambda t: (-t[0], t[1]))
        if refine and source_ds is not None and best:
            shortlist = [b[1] for b in best[: refine * k]]
            import pyarrow.dataset as pads

            cand = source_ds.filter(
                expr=f"{meta['id_col']} in {shortlist}"
            )
            q2 = np.asarray(query, np.float64).reshape(1, -1)
            return brute_cosine_topk(cand, q2, k, meta["id_col"], meta["vec_col"])
        best = best[:k]
        return pa.table(
            {
                meta["id_col"]: pa.array([b[1] for b in best], pa.int64()),
                "sim": pa.array([round(b[0], 4) for b in best], pa.float64()),
                "rank": pa.array(range(1, len(best) + 1), pa.int32()),
            }
        )


def ivfpq_cosine_topk(
    ds: ray.data.Dataset, query: np.ndarray, k: int = 10, n_lists: int = 16,
    n_probe: int = 4, m_subspaces: int = 8, n_codes: int = 256,
    vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 42,
    index_dir: str | None = None, refine: int = 0,
) -> pa.Table:
    """IVF-PQ ANN through a persisted index (built once, reused)."""
    import hashlib
    import json
    import os

    if index_dir is None:
        try:
            ident = sorted(ds.input_files())
        except Exception:
            ident = None
        if not ident:
            raise ValueError("ivfpq_cosine_topk: pass index_dir= for datasets "
                             "without stable input_files()")
        key = hashlib.md5(
            json.dumps([ident, n_lists, m_subspaces, n_codes, vec_col, id_col, seed]).encode()
        ).hexdigest()[:12]
        index_dir = f"/tmp/groonga_ray_cache/ivfpq_{key}"
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        IvfPqIndex.build(ds, index_dir, n_lists, m_subspaces, n_codes, vec_col, id_col, seed)
    return IvfPqIndex(index_dir).query(
        query, k, n_probe, refine=refine, source_ds=ds if refine else None
    )
