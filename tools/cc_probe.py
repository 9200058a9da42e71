#!/usr/bin/env python3
"""Scale probe for the distributed connected-components path
(dedup.dup_clusters large-star/small-star rounds) — the branch above
driver_threshold has only unit-test-sized coverage otherwise.

Generates a deterministic synthetic dup graph whose ground truth is
computable per node WITHOUT running CC: component i owns the
contiguous id range [i*span, i*span + size_i), every component
includes its minimum id, so expected cluster(n) = (n // span) * span.
Components mix chain edges (worst case for star-round depth) with
random intra-component pairs (volume), plus a few 10k-node chains to
stress round count.

Records edges, rounds (via max_rounds bisection is overkill — we log
wall + verify), wall seconds, and peak memory; verifies EVERY output
label against the analytic ground truth (distributed, vectorized) and
cross-checks the distributed path against the driver-numpy path on a
~2M-edge boundary subgraph.

Usage: python tools/cc_probe.py --edges 25000000 --cpus 32
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_build import MemSampler  # noqa: E402


def gen_edges(target_edges: int, span: int = 16, seed: int = 7):
    """Edge arrays (u, v) in components of `span`-aligned id ranges."""
    rng = np.random.default_rng(seed)
    per_comp = span - 1 + span // 2          # chain + random extras
    n_comp = max(1, target_edges // per_comp)
    base = (np.arange(n_comp, dtype=np.int64) * span)

    # chain edges: (base+j, base+j+1) for j in 0..span-2
    us = [
        (base[:, None] + np.arange(span - 1, dtype=np.int64)[None, :]).ravel()
    ]
    vs = [us[0] + 1]
    # random intra-component extras (span//2 per component)
    k = span // 2
    a = rng.integers(0, span, size=(n_comp, k))
    b = rng.integers(0, span, size=(n_comp, k))
    us.append((base[:, None] + a).ravel())
    vs.append((base[:, None] + b).ravel())
    # a few deep chains (10k nodes each) appended after the grid
    deep_base = int(base[-1]) + span
    for d in range(4):
        lo = deep_base + d * 10_000
        us.append(np.arange(lo, lo + 9_999, dtype=np.int64))
        vs.append(np.arange(lo + 1, lo + 10_000, dtype=np.int64))
    u = np.concatenate(us)
    v = np.concatenate(vs)
    keep = u != v
    return u[keep], v[keep], span, deep_base


def expected_cluster(doc: np.ndarray, span: int, deep_base: int) -> np.ndarray:
    exp = (doc // span) * span
    deep = doc >= deep_base
    exp[deep] = deep_base + ((doc[deep] - deep_base) // 10_000) * 10_000
    return exp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=25_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--boundary-check", type=int, default=2_000_000,
                    help="cross-check distributed vs driver-numpy on this many edges")
    args = ap.parse_args()

    import pyarrow as pa
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from groonga_ray.pipelines.dedup import dup_clusters

    out: dict = {"cpus": args.cpus, "partitions": args.partitions}
    u, v, span, deep_base = gen_edges(args.edges)
    out["edges"] = int(len(u))
    n_blocks = max(8, args.cpus)
    step = -(-len(u) // n_blocks)
    pairs = ray.data.from_arrow(
        [
            pa.table({"doc_a": pa.array(u[i:i + step]), "doc_b": pa.array(v[i:i + step])})
            for i in range(0, len(u), step)
        ]
    )

    ms = MemSampler(); ms.start()
    t0 = time.time()
    labels = dup_clusters(
        pairs, num_partitions=args.partitions, driver_threshold=0
    ).materialize()
    out["wall_sec"] = round(time.time() - t0, 1)
    out["peak_mem_gb"] = ms.stop()
    out["label_rows"] = labels.count()

    # ---- verify every label against the analytic ground truth
    def check(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc").to_numpy(zero_copy_only=False)
        got = batch.column("cluster").to_numpy(zero_copy_only=False)
        exp = expected_cluster(doc, span, deep_base)
        return pa.table({"bad": pa.array([int((got != exp).sum())], pa.int64()),
                         "n": pa.array([len(doc)], pa.int64())})

    chk = labels.map_batches(check, batch_format="pyarrow").to_pandas()
    out["verified_rows"] = int(chk["n"].sum())
    out["mismatches"] = int(chk["bad"].sum())

    # ---- boundary cross-check: distributed vs driver numpy, same input
    nb = min(args.boundary_check, len(u))
    bp = ray.data.from_arrow(
        pa.table({"doc_a": pa.array(u[:nb]), "doc_b": pa.array(v[:nb])})
    ).repartition(8)
    t0 = time.time()
    d1 = dup_clusters(bp, num_partitions=8, driver_threshold=0).to_pandas()
    t_dist = time.time() - t0
    t0 = time.time()
    d2 = dup_clusters(bp, num_partitions=8, driver_threshold=nb + 1).to_pandas()
    t_np = time.time() - t0
    d1 = d1.sort_values(["doc"]).reset_index(drop=True)
    d2 = d2.sort_values(["doc"]).reset_index(drop=True)
    out["boundary_edges"] = int(nb)
    out["boundary_equal"] = bool(
        (d1["doc"].values == d2["doc"].values).all()
        and (d1["cluster"].values == d2["cluster"].values).all()
    )
    out["boundary_dist_sec"] = round(t_dist, 1)
    out["boundary_numpy_sec"] = round(t_np, 1)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
