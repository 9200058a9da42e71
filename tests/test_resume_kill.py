"""Kill a build mid-flight, restart, and require a byte-identical index
(the north rule's resumable-from-checkpoint criterion)."""

import glob
import hashlib
import os
import signal
import subprocess
import sys
import time

import pytest

SCRIPT = r"""
import sys, glob
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from groonga_ray.build import BuildConfig, build_index
from groonga_ray.corpus import corpus_cache_dir
d = corpus_cache_dir(4000)
files = sorted(glob.glob(d + "/*.parquet"))
cfg = BuildConfig(text_columns=("content",), n_buckets=8,
                  target_rows_per_shard=250, tokenize_rows_per_batch=128)
build_index(files, sys.argv[1], cfg, concurrency=3)
print("BUILD_DONE")
ray.shutdown()
"""


def _index_digest(index_dir: str) -> dict:
    out = {}
    for f in sorted(glob.glob(os.path.join(index_dir, "**", "*.parquet"), recursive=True)):
        rel = os.path.relpath(f, index_dir)
        out[rel] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


@pytest.mark.slow
def test_kill_restart_identical(tmp_path):
    idx_a = str(tmp_path / "idx_killed")
    idx_b = str(tmp_path / "idx_clean")

    # clean reference build
    r = subprocess.run([sys.executable, "-c", SCRIPT, idx_b],
                       capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert "BUILD_DONE" in r.stdout, r.stderr[-2000:]

    # start, kill while stage A is in flight, restart
    p = subprocess.Popen([sys.executable, "-c", SCRIPT, idx_a],
                         cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    deadline = time.time() + 300
    while time.time() < deadline:
        done = len(glob.glob(os.path.join(idx_a, "sec=content", "runs", "shard=*", "manifest.json")))
        if done >= 3:
            break
        if p.poll() is not None:
            break
        time.sleep(0.3)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait()
    interrupted = len(glob.glob(os.path.join(idx_a, "sec=content", "runs", "shard=*", "manifest.json")))

    r = subprocess.run([sys.executable, "-c", SCRIPT, idx_a],
                       capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert "BUILD_DONE" in r.stdout, r.stderr[-2000:]

    da, db = _index_digest(idx_a), _index_digest(idx_b)
    assert da == db, "restarted index differs from clean build"
    # sanity: the kill really interrupted something (not a no-op test)
    total = len(glob.glob(os.path.join(idx_a, "sec=content", "runs", "shard=*")))
    assert 0 < interrupted <= total
