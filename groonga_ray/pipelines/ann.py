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


def train_ivf_centroids(
    ds: ray.data.Dataset, n_centroids: int = 16, iters: int = 8,
    vec_col: str = "embedding", seed: int = 42, sample_limit: int = 50_000,
) -> np.ndarray:
    """Mini k-means on a bounded sample (deterministic seed): the IVF
    coarse quantizer. At scale the sample is a `random_sample` of the
    Dataset; iterations run driver-side on the small sample."""
    sample = ds.limit(sample_limit).to_pandas()
    m = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
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


def ivf_cosine_topk(
    ds: ray.data.Dataset, query: np.ndarray, k: int = 10, n_centroids: int = 16,
    n_probe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 42,
) -> pa.Table:
    """IVF ANN: assign every vector to its nearest centroid inside
    map_batches (centroids broadcast once), scan only the query's
    ``n_probe`` nearest lists. Same output schema as brute_cosine_topk;
    recall < 1 by design (n_probe/n_centroids trades recall for scan)."""
    q = np.asarray(query, np.float64).reshape(1, -1)
    cent = train_ivf_centroids(ds, n_centroids, vec_col=vec_col, seed=seed)
    cent_ref = ray.put(cent)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = set(np.argsort(-(cent @ qn.ravel()))[:n_probe].tolist())

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _to_matrix(batch.column(vec_col))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        lists = (mn @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists, pa.int32()))

    probe_expr = " or ".join(f"ivf_list == {p}" for p in sorted(probes))
    candidates = ds.map_batches(assign, batch_format="pyarrow").filter(expr=f"({probe_expr})")
    return brute_cosine_topk(candidates, q, k, id_col, vec_col)


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
) -> pa.Table:
    """Approximate top-k: scan only vectors whose signature equals the
    query's (single-probe). Same output schema as brute_cosine_topk."""
    q = np.asarray(query, np.float64).reshape(1, -1)
    bucketer = LshBucketer(q.shape[1], bits, seed, vec_col, id_col)
    target = int(bucketer.signature(q)[0])
    bucketed = ds.map_batches(
        LshBucketer(q.shape[1], bits, seed, vec_col, id_col), batch_format="pyarrow"
    ).filter(expr=f"bucket == {target}")
    return brute_cosine_topk(bucketed, q, k, id_col, vec_col)
