#!/usr/bin/env python3
"""LSM incremental-update probe at medium scale: base build, N delta
ingests (add_documents), query latency as read amplification grows,
then compaction (compact_index) and latency again.

The ft_delta/ft_delete/ft_compact gates prove correctness at sf0.01;
this records the SCALE story: delta build throughput vs the base
build's, per-delta query-latency growth (each delta adds one more
segment whose postings concatenate at read time), and how much
compaction claws back.

Usage: python tools/lsm_probe.py --base-rows 1000000 --deltas 4 --delta-rows 50000
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-rows", type=int, default=1_000_000)
    ap.add_argument("--deltas", type=int, default=4)
    ap.add_argument("--delta-rows", type=int, default=50_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from groonga_ray.build import BuildConfig, add_documents, build_index, compact_index
    from groonga_ray.corpus import corpus_cache_dir, generate_code_corpus
    from groonga_ray.engine import IndexedTable, select

    out: dict = {"base_rows": args.base_rows, "deltas": args.deltas,
                 "delta_rows": args.delta_rows, "cpus": args.cpus}

    base_dir = corpus_cache_dir(args.base_rows)
    base_files = sorted(
        os.path.join(base_dir, f) for f in os.listdir(base_dir) if f.endswith(".parquet")
    )
    # delta corpora: fresh deterministic docs (different seed per delta)
    delta_sets = []
    for d in range(args.deltas):
        ddir = f"/tmp/lsm_delta_{args.delta_rows}_{d}"
        if not os.path.isdir(ddir) or not os.listdir(ddir):
            generate_code_corpus(ddir, n_rows=args.delta_rows, n_files=4, seed=100 + d)
        delta_sets.append(sorted(
            os.path.join(ddir, f) for f in os.listdir(ddir) if f.endswith(".parquet")
        ))

    idx = f"/tmp/lsm_idx_{args.base_rows}"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = BuildConfig(text_columns=("content",), n_buckets=64,
                      target_rows_per_shard=8192, hot_local_df=8192, salt_group=4,
                      runs_root="/dev/shm/lsm_runs")
    shutil.rmtree("/dev/shm/lsm_runs", ignore_errors=True)

    t0 = time.time()
    meta = build_index(base_files, idx, cfg, concurrency=max(4, args.cpus - 2))
    out["base_build_sec"] = round(time.time() - t0, 1)
    out["base_docs_per_sec"] = meta["docs_per_sec"]

    def lat(files) -> float:
        t = IndexedTable(idx, files)
        # warm with DIFFERENT terms: loads lexicon/doclens/metadata but
        # leaves the timed terms' postings out of the decoded-postings
        # LRU, so the timed pass still pays one posting fetch per
        # segment — the read amplification this probe measures
        for term in ("open_token", "close_block", "push_state", "make_value"):
            select(t, query=term, match_columns="content", scorer="bm25", limit=10)
        times = []
        for term in ("get_value", "parse_token", "def", "return", "while"):
            t1 = time.time()
            select(t, query=f"{term} OR set_index", match_columns="content",
                   scorer="bm25", limit=10)
            times.append(time.time() - t1)
        return round(float(np.median(times)) * 1000, 2)

    all_files = list(base_files)
    out["q_p50_ms_base"] = lat(all_files)

    delta_secs = []
    for d, files in enumerate(delta_sets):
        t0 = time.time()
        dmeta = add_documents(idx, files, cfg)
        delta_secs.append(round(time.time() - t0, 1))
        all_files += files
    out["delta_build_sec_each"] = delta_secs
    out["delta_docs_per_sec"] = round(
        args.delta_rows * args.deltas / max(1e-9, sum(delta_secs)), 1
    )
    out[f"q_p50_ms_after_{args.deltas}_deltas"] = lat(all_files)

    # delete ~2% of the base (tombstones), then compact — WITHOUT
    # tombstones compact_index is a no-op (deltas are already optimal)
    from groonga_ray.build import delete_documents

    n_del = args.base_rows // 50
    rng = np.random.default_rng(23)
    dels = rng.choice(args.base_rows, size=n_del, replace=False) + 1
    t0 = time.time()
    delete_documents(idx, dels.tolist())
    out["delete_sec"] = round(time.time() - t0, 2)
    out["n_deleted"] = int(n_del)
    out["q_p50_ms_with_tombstones"] = lat(all_files)

    t0 = time.time()
    cres = compact_index(idx, concurrency=max(4, args.cpus - 2))
    out["compact_sec"] = round(time.time() - t0, 1)
    out["compact_rewrites"] = cres.get("rewritten", cres) if isinstance(cres, dict) else cres
    out["q_p50_ms_after_compact"] = lat(all_files)
    out["total_docs"] = args.base_rows + args.deltas * args.delta_rows

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
