"""``ray job submit`` entry point for cluster builds and query sweeps.

The north-star build runs on a fixed-size multi-node Ray cluster via::

    ray job submit --working-dir . -- \
        python -m groonga_ray.job build \
            --input '/data/code/*.parquet' --index /data/index \
            --columns content --metrics /data/index/job_metrics.json

    ray job submit --working-dir . -- \
        python -m groonga_ray.job query \
            --index /data/index --files '/data/code/*.parquet' \
            --queries-file queries.txt --output /data/results.jsonl

In this sandbox (and in tests) the same module runs standalone:
``python -m groonga_ray.job build ...`` connects to the local Ray
session (``RAY_ADDRESS=local``). Inside a ``ray job submit`` runtime
the driver is already attached to the cluster, so ``ray.init`` is
guarded with ``ray.is_initialized()`` and ``address="auto"`` is picked
up from the job environment automatically.

Lineage + metrics: every build partition already writes an atomic
manifest (per-shard runs, per-bucket postings — build.py stage A/B),
which is what makes a killed job resumable (``tests/test_resume_kill.py``).
This driver aggregates those manifests into ONE job-level metrics JSON:
wall-clock per stage, docs/sec, per-shard lineage rows (shard id, row
count, token count, elapsed, whether the shard was reused from a prior
attempt) and per-bucket merge metrics. Re-submitting the same job after
a crash re-validates fingerprints and reports the skipped partitions in
``lineage.shards_reused``.

Reference parity: this is the cluster stand-in for the reference's
single-process offline build entry (`grn_ii_build`, lib/ii.c:8029,
driven by groonga's `index_column_create` + load path) — the reference
has no job system; resumability/lineage is where the Ray rebuild
diverges by design (SURVEY §7).
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import sys
import time


def _expand_inputs(specs: list[str]) -> list[str]:
    files: list[str] = []
    for spec in specs:
        if os.path.isdir(spec):
            files.extend(sorted(_glob.glob(os.path.join(spec, "*.parquet"))))
        elif any(ch in spec for ch in "*?["):
            files.extend(sorted(_glob.glob(spec)))
        else:
            files.append(spec)
    if not files:
        raise SystemExit(f"no input parquet files match {specs!r}")
    return sorted(dict.fromkeys(files))


def _ray_connect(num_cpus: int | None) -> None:
    import ray

    if ray.is_initialized():
        return
    addr = os.environ.get("RAY_ADDRESS", "local")
    kwargs: dict = {"include_dashboard": False, "ignore_reinit_error": True}
    if addr == "local" and num_cpus:
        kwargs["num_cpus"] = num_cpus
    ray.init(address=addr, **kwargs)


def _job_id() -> str | None:
    # set by the Ray job agent inside `ray job submit` runtimes
    return os.environ.get("RAY_JOB_ID") or os.environ.get("RAY_JOB_SUBMISSION_ID")


def _write_metrics(path: str | None, payload: dict) -> None:
    if not path:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    os.replace(tmp, path)


def cmd_build(args: argparse.Namespace) -> int:
    from .build import BuildConfig, build_index, runs_base
    from .utils import read_manifest

    files = _expand_inputs(args.input)
    _ray_connect(args.num_cpus)
    t0 = time.time()
    cfg = BuildConfig(
        text_columns=tuple(args.columns.split(",")),
        docid_column=args.docid_column,
        n_buckets=args.buckets,
        target_rows_per_shard=args.rows_per_shard,
    )
    if getattr(args, "sort_by", None):
        from .build import sort_build_index

        sorted_dir = args.sorted_dir or os.path.join(args.index, "_sorted")
        meta = sort_build_index(
            files, args.sort_by.split(","), sorted_dir, args.index, cfg,
            concurrency=args.concurrency,
        )
    else:
        meta = build_index(files, args.index, cfg, concurrency=args.concurrency)
    wall = time.time() - t0

    # aggregate the per-partition manifests into job-level lineage
    shards = []
    reused = 0
    for section in meta["sections"]:
        for man_path in sorted(
            _glob.glob(
                os.path.join(runs_base(cfg, args.index), f"sec={section}", "runs", "shard=*", "manifest.json")
            )
        ):
            man = read_manifest(man_path) or {}
            # a manifest older than this job's start was validated and
            # reused from a prior attempt (resume path) rather than built
            was_reused = os.path.getmtime(man_path) < t0
            shards.append(
                {
                    "section": section,
                    "shard_id": man.get("shard_id"),
                    "rows": man.get("rows"),
                    "tokens": man.get("tokens"),
                    "elapsed_sec": man.get("elapsed_sec"),
                    "reused": was_reused,
                }
            )
            reused += was_reused
    buckets = []
    for section in meta["sections"]:
        for man_path in sorted(
            _glob.glob(
                os.path.join(args.index, f"sec={section}", "postings", "bucket=*", "manifest.json")
            )
        ):
            man = read_manifest(man_path) or {}
            buckets.append(
                {
                    "section": section,
                    "bucket": man.get("bucket"),
                    "terms": man.get("terms"),
                    "elapsed_sec": man.get("elapsed_sec"),
                }
            )

    payload = {
        "job": "build",
        "job_id": _job_id(),
        "index_dir": os.path.abspath(args.index),
        "input_files": len(files),
        "wall_sec": round(wall, 3),
        "docs_per_sec": meta["docs_per_sec"],
        "n_docs": meta["n_docs"],
        "timings": meta["timings"],
        "stats": meta["stats"],
        "lineage": {
            "n_shards": meta["n_shards"],
            "shards_reused": reused,
            "n_buckets": len(buckets),
            "shards": shards,
            "buckets": buckets,
        },
    }
    _write_metrics(args.metrics, payload)
    print(json.dumps({k: payload[k] for k in ("job", "job_id", "wall_sec", "docs_per_sec", "n_docs", "timings")}))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from .engine import IndexedTable, select_v1

    files = _expand_inputs(args.files)
    _ray_connect(args.num_cpus)
    queries: list[str] = []
    if args.query:
        queries.append(args.query)
    if args.queries_file:
        with open(args.queries_file) as fh:
            queries.extend(q.strip() for q in fh if q.strip())
    if not queries:
        raise SystemExit("no queries: pass --query or --queries-file")

    table = IndexedTable(args.index, files, args.docid_column)
    out_fh = open(args.output, "w") if args.output else sys.stdout
    t0 = time.time()
    lat = []
    try:
        for q in queries:
            tq = time.time()
            env = select_v1(
                table,
                query=q,
                match_columns=args.match_columns,
                scorer=args.scorer,
                limit=args.limit,
                output_columns=tuple(args.output_columns.split(",")),
            )
            lat.append(time.time() - tq)
            out_fh.write(json.dumps({"query": q, "result": env}, ensure_ascii=False) + "\n")
    finally:
        if out_fh is not sys.stdout:
            out_fh.close()
    wall = time.time() - t0
    lat.sort()
    payload = {
        "job": "query",
        "job_id": _job_id(),
        "index_dir": os.path.abspath(args.index),
        "n_queries": len(queries),
        "wall_sec": round(wall, 3),
        "qps": round(len(queries) / max(wall, 1e-9), 1),
        "p50_ms": round(1000 * lat[len(lat) // 2], 3),
        "p95_ms": round(1000 * lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3),
    }
    _write_metrics(args.metrics, payload)
    print(json.dumps(payload), file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m groonga_ray.job")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="offline index build (resumable)")
    b.add_argument("--input", nargs="+", required=True, help="parquet files, globs or directories")
    b.add_argument("--index", required=True)
    b.add_argument("--columns", default="content")
    b.add_argument("--docid-column", default=None)
    b.add_argument("--buckets", type=int, default=64)
    b.add_argument("--rows-per-shard", type=int, default=None)
    b.add_argument("--concurrency", type=int, default=None)
    b.add_argument("--num-cpus", type=int, default=None)
    b.add_argument("--metrics", default=None, help="job metrics JSON path (default <index>/job_metrics.json)")
    b.add_argument("--sort-by", default=None,
                   help="comma-separated key columns for UNSORTED input: "
                        "fused distributed sort + build (docids = key rank)")
    b.add_argument("--sorted-dir", default=None,
                   help="fused path's key-sorted corpus dir (default <index>/_sorted)")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="run a query sweep against an index")
    q.add_argument("--index", required=True)
    q.add_argument("--files", nargs="+", required=True)
    q.add_argument("--docid-column", default=None)
    q.add_argument("--query", default=None)
    q.add_argument("--queries-file", default=None)
    q.add_argument("--match-columns", default=None)
    q.add_argument("--scorer", default=None)
    q.add_argument("--limit", type=int, default=10)
    q.add_argument("--output-columns", default="_id,_score")
    q.add_argument("--output", default=None, help="JSONL results path (default stdout)")
    q.add_argument("--num-cpus", type=int, default=None)
    q.add_argument("--metrics", default=None)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    if args.cmd == "build" and args.metrics is None:
        args.metrics = os.path.join(args.index, "job_metrics.json")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
