"""`python -m groonga_ray.job` — the `ray job submit` driver.

Runs the module as a subprocess (its own Ray session, like a job
runtime would give it) and checks the job-level metrics/lineage JSON
plus the query sweep output.
"""

import json
import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"
ENV = dict(os.environ, RAY_ADDRESS="local")


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "groonga_ray.job", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=timeout, env=ENV,
    )


def test_job_build_and_query(tmp_path):
    idx = str(tmp_path / "idx")
    metrics = str(tmp_path / "m.json")
    r = _run([
        "build", "--input", f"{SF}/documents.parquet", "--index", idx,
        "--columns", "text", "--docid-column", "doc_id", "--buckets", "8",
        "--num-cpus", "4", "--metrics", metrics,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics))
    assert m["job"] == "build" and m["n_docs"] == 500
    assert m["lineage"]["n_shards"] >= 1 and m["lineage"]["n_buckets"] == 8
    assert m["lineage"]["shards_reused"] == 0
    assert all(not s["reused"] for s in m["lineage"]["shards"])
    assert {"stage_a_sec", "stage_b_sec", "stage_c_sec", "total_sec"} <= set(m["timings"])
    # stdout carries the one-line summary a job log would show
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["docs_per_sec"] > 0

    # resubmit: per-partition lineage marks every shard reused
    r = _run([
        "build", "--input", f"{SF}/documents.parquet", "--index", idx,
        "--columns", "text", "--docid-column", "doc_id", "--buckets", "8",
        "--num-cpus", "4", "--metrics", metrics,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.load(open(metrics))
    assert m["lineage"]["shards_reused"] == m["lineage"]["n_shards"]

    # query sweep over the built index
    qfile = tmp_path / "q.txt"
    qfile.write_text("hash join\nwindow\n")
    out = str(tmp_path / "res.jsonl")
    qmetrics = str(tmp_path / "qm.json")
    r = _run([
        "query", "--index", idx, "--files", f"{SF}/documents.parquet",
        "--docid-column", "doc_id", "--queries-file", str(qfile),
        "--match-columns", "text", "--output", out, "--metrics", qmetrics,
        "--num-cpus", "4",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in open(out)]
    assert len(lines) == 2
    # v1 envelope: [[count], [schema], rows...] with hits for in-vocab terms
    assert lines[0]["result"][0][0] > 0 and lines[1]["result"][0][0] > 0
    qm = json.load(open(qmetrics))
    assert qm["n_queries"] == 2 and qm["qps"] > 0
