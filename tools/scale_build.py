#!/usr/bin/env python3
"""Scale-up evidence run: build an N-million-doc corpus end-to-end and
record per-stage wall times + peak memory, verifying that the
8M-tokens/shard law and the stage-B slice memory bound extrapolate
past the 1M-doc record (BASELINE.md).

Pipeline (the full unsorted-ingest path):
  1. corpus     — chunk-generated large corpus (bounded-memory,
                  resumable; groonga_ray.corpus.large_corpus_cache_dir)
  2. input sort — distributed range-partitioned sort for docid
                  assignment (docids.sort_input_files; chunks are NOT
                  globally key-sorted, like any real multi-source
                  ingest)
  3. build      — two-stage index build (build.build_index), stage
                  times from its meta

Usage:
  python tools/scale_build.py --rows 4000000 --cpus 32
  python tools/scale_build.py --rows 4000000 --kill-after 20  # resume demo:
      run under a fresh process, SIGKILL the build after N seconds,
      re-run to completion, report how many shard runs were reused.

Peak memory is sampled from /proc/meminfo (MemTotal - MemAvailable)
across ALL processes — driver + ray workers — every 0.5 s.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class MemSampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.peak_used_gb = 0.0
        self.base_used_gb = self._used()
        self._stop = threading.Event()

    @staticmethod
    def _used() -> float:
        mi = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                k, v = line.split(":", 1)
                mi[k] = int(v.split()[0])
        return (mi["MemTotal"] - mi["MemAvailable"]) / 1024 / 1024

    def run(self):
        while not self._stop.is_set():
            self.peak_used_gb = max(self.peak_used_gb, self._used())
            time.sleep(0.5)

    def stop(self) -> float:
        self._stop.set()
        return round(self.peak_used_gb, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--chunk-rows", type=int, default=1_000_000,
                    help="corpus generation chunk size (bounds generator memory)")
    ap.add_argument("--shard-rows", type=int, default=8192,
                    help="target_rows_per_shard (8192 = the measured 8M-tokens/shard optimum)")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--merge-slice-postings", type=int, default=None,
                    help="stage-B decoded-postings-per-slice cap (per-worker memory "
                         "bound; default = BuildConfig's conservative 4M). Raise on "
                         "high-memory workers to cut stage-B re-read passes")
    ap.add_argument("--out", default=None, help="index dir (default /tmp/scale_idx_<rows>)")
    ap.add_argument("--kill-after", type=float, default=None,
                    help="resume demo: SIGKILL a subprocess build after this many seconds, then rebuild")
    ap.add_argument("--skip-sort", action="store_true",
                    help="reuse an existing sorted dir from a prior run")
    ap.add_argument("--fused", action="store_true",
                    help="use build.sort_build_index (sort finalize tasks "
                         "tokenize in-memory): one cold path, no corpus "
                         "re-read between sort and stage A")
    ap.add_argument("--keep-runs", action="store_true",
                    help="do NOT wipe the stage-A run dir before building (the "
                         "kill-resume demo needs surviving manifests; a timed "
                         "fresh build must not reuse them)")
    args = ap.parse_args()

    if args.kill_after is not None:
        run_kill_resume(args)
        return

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from groonga_ray.build import BuildConfig, build_index
    from groonga_ray.corpus import large_corpus_cache_dir
    from groonga_ray.docids import sort_input_files

    out: dict = {"rows": args.rows, "cpus": args.cpus,
                 "shard_rows": args.shard_rows, "buckets": args.buckets}

    t0 = time.time()
    corpus_dir = large_corpus_cache_dir(args.rows, chunk_rows=args.chunk_rows)
    out["corpus_gen_sec"] = round(time.time() - t0, 1)  # ~0 when cached
    files = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    out["corpus_files"] = len(files)
    out["corpus_gb"] = round(sum(os.path.getsize(f) for f in files) / 1e9, 2)

    sorted_dir = f"/tmp/scale_sorted_{args.rows}"
    if args.fused:
        sorted_dir += "_fused"
        if not args.skip_sort:
            shutil.rmtree(sorted_dir, ignore_errors=True)
        sorted_files = None  # sort_build_index owns the sort
    elif not (args.skip_sort and os.path.isdir(sorted_dir)):
        shutil.rmtree(sorted_dir, ignore_errors=True)
        ms = MemSampler(); ms.start()
        t0 = time.time()
        sorted_files = sort_input_files(files, ["repo", "path"], sorted_dir)
        out["input_sort_sec"] = round(time.time() - t0, 1)
        out["input_sort_peak_mem_gb"] = ms.stop()
    else:
        sorted_files = sorted(
            os.path.join(sorted_dir, f) for f in os.listdir(sorted_dir)
            if f.endswith(".parquet")
        )
    if sorted_files is not None:
        out["sorted_files"] = len(sorted_files)

    # untimed warm build (same recipe as bench.py): this sandbox's
    # first-touch page-fault path is ~60x slow, so a fresh process
    # otherwise pays a large cold-worker tax inside the timed build
    # (measured: stage A 171 s cold vs 112 s warm on the 4M corpus)
    from groonga_ray.corpus import corpus_cache_dir

    warm_dir = corpus_cache_dir(2000)
    warm_files = sorted(
        os.path.join(warm_dir, f) for f in os.listdir(warm_dir) if f.endswith(".parquet")
    )
    shutil.rmtree("/tmp/scale_warmup_idx", ignore_errors=True)
    conc = max(4, args.cpus - 2)
    build_index(
        warm_files, "/tmp/scale_warmup_idx",
        BuildConfig(text_columns=("content",), n_buckets=8,
                    target_rows_per_shard=max(16, 2000 // (2 * conc))),
        concurrency=conc,
    )

    idx_dir = args.out or f"/tmp/scale_idx_{args.rows}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    if not args.keep_runs:
        shutil.rmtree("/dev/shm/scale_runs", ignore_errors=True)
    # hot_local_df = shard size: a term is hot-salted only when its
    # LOCAL df reaches the whole shard — the config the scaling bench
    # validated. A lower threshold (2048 at 8192-row shards) pushes
    # every corpus keyword in every shard through the hot-parts path
    # and measured ~2.7x slower per shard at 4M docs.
    cfg_kw = dict(
        text_columns=("content",), n_buckets=args.buckets,
        target_rows_per_shard=args.shard_rows,
        hot_local_df=args.shard_rows, salt_group=4,
        runs_root="/dev/shm/scale_runs",
    )
    if args.merge_slice_postings:
        cfg_kw["merge_slice_postings"] = args.merge_slice_postings
    cfg = BuildConfig(**cfg_kw)
    ms = MemSampler(); ms.start()
    t0 = time.time()
    if args.fused:
        from groonga_ray.build import sort_build_index

        meta = sort_build_index(
            files, ["repo", "path"], sorted_dir, idx_dir, cfg,
            concurrency=max(4, args.cpus - 2),
        )
        out["fused_sort_tokenize_sec"] = meta["timings"]["fused_sort_tokenize_sec"]
        out["cold_total_sec"] = meta["timings"]["cold_total_sec"]
        out["sorted_files"] = len(meta["sorted_files"])
    else:
        meta = build_index(sorted_files, idx_dir, cfg, concurrency=max(4, args.cpus - 2))
    out["build_sec"] = round(time.time() - t0, 1)
    out["build_peak_mem_gb"] = ms.stop()
    out["stage_a_sec"] = meta["timings"]["stage_a_sec"]
    out["stage_b_sec"] = meta["timings"]["stage_b_sec"]
    out["docs_per_sec"] = meta["docs_per_sec"]
    out["n_docs"] = meta["n_docs"]
    out["total_tokens"] = meta["stats"]["sections"]["content"]["total_tokens"]
    print(json.dumps(out))
    ray.shutdown()


def run_kill_resume(args) -> None:
    """Resumability demo at scale: kill a fresh-process build mid-stage-A,
    rerun, and report reuse (manifests skip finished shard runs)."""
    idx_dir = args.out or f"/tmp/scale_idx_{args.rows}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree("/dev/shm/scale_runs", ignore_errors=True)
    base = [sys.executable, os.path.abspath(__file__),
            "--rows", str(args.rows), "--cpus", str(args.cpus),
            "--chunk-rows", str(args.chunk_rows),
            "--shard-rows", str(args.shard_rows), "--buckets", str(args.buckets),
            "--out", idx_dir, "--skip-sort", "--keep-runs"]
    if args.merge_slice_postings:
        base += ["--merge-slice-postings", str(args.merge_slice_postings)]
    if args.fused:
        # fused resume: --skip-sort keeps the sorted dir so the rerun
        # revalidates scatter.done.json / sort.done.json / shard
        # manifests instead of repeating finished work — wipe it only
        # here, before the first (killed) attempt
        shutil.rmtree(f"/tmp/scale_sorted_{args.rows}_fused", ignore_errors=True)
        base += ["--fused"]
    p = subprocess.Popen(base, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    time.sleep(args.kill_after)
    p.kill(); p.wait()
    # SIGKILL on the driver orphans the raylet + workers; they keep
    # burning CPU and poison the resume timing — tear the session down
    subprocess.run(["ray", "stop", "--force"], stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL, check=False)
    time.sleep(3)
    # count shard runs completed before the kill (validated manifests
    # under runs_root are exactly what the rerun reuses)
    import glob
    runs = glob.glob("/dev/shm/scale_runs/runs_*/sec=*/runs/shard=*/manifest.json")
    n_before = len(runs)
    t0 = time.time()
    res = subprocess.run(base, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, check=True)
    line = res.stdout.decode().strip().splitlines()[-1]
    out = json.loads(line)
    out["resume"] = {
        "killed_after_sec": args.kill_after,
        "shard_runs_reused": n_before,
        "resume_total_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
