#!/usr/bin/env python3
"""ANN scale probe: build the persisted IVF index on N million vectors
and measure recall@10 vs exact brute force at several n_probe values.

Vectors are a deterministic Gaussian-mixture (clustered, like real
embeddings — uniform vectors would make IVF look artificially bad),
written as chunked parquet under /tmp so generation is streaming and
cached across runs.

Usage: python tools/ann_probe.py --rows 5000000 --dim 64 --lists 1024
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_build import MemSampler  # noqa: E402


def gen_vectors(out_dir: str, rows: int, dim: int, n_clusters: int = 512,
                chunk: int = 250_000, seed: int = 9) -> list[str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    files = []
    rng = np.random.default_rng(seed)
    # center spread ~ noise spread: clusters overlap (like real
    # embedding spaces), so n_probe=1 misses cross-boundary neighbors
    # and the recall/n_probe tradeoff is visible
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * 1.2
    base = 0
    for ci, lo in enumerate(range(0, rows, chunk)):
        n = min(chunk, rows - lo)
        path = os.path.join(out_dir, f"vec-{ci:04d}.parquet")
        files.append(path)
        if os.path.exists(path):
            base += n
            continue
        # per-chunk stream: resuming over cached chunks yields the SAME
        # vectors a fresh run would (one shared stream would skip the
        # cached chunks' draws and shift every later chunk)
        crng = np.random.default_rng(seed + 1000 + ci)
        assign = crng.integers(0, n_clusters, size=n)
        m = centers[assign] + crng.normal(size=(n, dim)).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(base, base + n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.astype(np.float64).ravel()), dim
                ).cast(pa.list_(pa.float64())),
            }
        )
        pq.write_table(tbl, path)
        base += n
    return files


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--lists", type=int, default=1024)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--fresh", action="store_true", help="rebuild the index dir")
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from groonga_ray.pipelines.ann import IvfIndex, brute_cosine_topk

    out: dict = {"rows": args.rows, "dim": args.dim, "lists": args.lists,
                 "cpus": args.cpus}
    vec_dir = f"/tmp/ann_vectors_{args.rows}_{args.dim}"
    t0 = time.time()
    files = gen_vectors(vec_dir, args.rows, args.dim)
    out["gen_sec"] = round(time.time() - t0, 1)

    idx_dir = f"/tmp/ann_ivf_{args.rows}_{args.dim}_{args.lists}"
    if args.fresh:
        shutil.rmtree(idx_dir, ignore_errors=True)
    ds = ray.data.read_parquet(files)
    if not os.path.exists(os.path.join(idx_dir, "meta.json")):
        ms = MemSampler(); ms.start()
        t0 = time.time()
        idx = IvfIndex.build(
            ds, idx_dir, n_lists=args.lists, sample_cap=200_000
        )
        out["build_sec"] = round(time.time() - t0, 1)
        out["build_peak_mem_gb"] = ms.stop()
    else:
        idx = IvfIndex(idx_dir)

    # deterministic queries: perturbations of stored vectors, so each
    # has a meaningful neighborhood
    rng = np.random.default_rng(17)
    import pyarrow.parquet as pq

    probe_tbl = pq.read_table(files[0], columns=["embedding"]).slice(0, args.queries)
    qm = np.stack([np.asarray(v, np.float64) for v in probe_tbl.column("embedding").to_pylist()])
    qm += rng.normal(size=qm.shape) * 0.05

    t0 = time.time()
    truth = brute_cosine_topk(ds, qm, k=10)
    out["brute_50q_sec"] = round(time.time() - t0, 1)
    tdf = truth.to_pandas()
    truth_ids = {
        int(q): set(g.sort_values("rank")["vec_id"].head(10))
        for q, g in tdf.groupby("qid")
    }

    for n_probe in (1, 4, 8):
        t0 = time.time()
        hits = 0
        for qq in range(len(qm)):
            got = idx.query(qm[qq], k=10, n_probe=n_probe).to_pandas()
            hits += len(set(got["vec_id"].head(10)) & truth_ids[qq])
        out[f"recall10_probe{n_probe}"] = round(hits / (10 * len(qm)), 3)
        out[f"query_sec_probe{n_probe}"] = round((time.time() - t0) / len(qm), 2)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
