#!/usr/bin/env python3
"""Parallel conformance sweep: run reference suite scripts across a
process pool (each worker owns a private local Ray instance). Prints
failures and a summary.

Usage:
  python tools/par_suite.py                 # all pinned scripts
  python tools/par_suite.py --all           # every reference script
  python tools/par_suite.py sel/filter ...  # specific dirs/scripts
  env PAR=8 to set worker count (default 8)
"""
import os
import sys
import tempfile
import traceback

SUITE = "/root/reference/test/command/suite"
PINS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "reference_suite_passing.txt",
)


def _init_worker():
    import logging

    logging.disable(logging.WARNING)
    os.environ.pop("RAY_ADDRESS", None)
    import ray

    ray.init(
        address="local", num_cpus=2, include_dashboard=False,
        logging_level="ERROR", object_store_memory=500 * 1024 * 1024,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_one(rel: str) -> tuple[str, bool, str]:
    from groonga_ray.conformance import ScriptRunner
    from groonga_ray.server import CommandServer

    test = os.path.join(SUITE, rel + ".test")
    exp = test[: -len(".test")] + ".expected"
    if not os.path.exists(test) or not os.path.exists(exp):
        return (rel, False, "missing fixture")
    try:
        with tempfile.TemporaryDirectory() as td:
            server = CommandServer(data_dir=td)
            runner = ScriptRunner(server)
            results = runner.run_conformance(test, exp)
        bad = [r for r in results if not r["ok"]]
        if bad:
            return (
                rel, False,
                f"{bad[0]['command']}: {str(bad[0]['detail'])[:400]}",
            )
        return (rel, True, "")
    except Exception as e:  # noqa: BLE001
        return (rel, False, f"{type(e).__name__}: {e}\n{traceback.format_exc()[-400:]}")


def main():
    import concurrent.futures as cf

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--all" in sys.argv:
        rels = []
        for root, _, fs in os.walk(SUITE):
            for f in fs:
                if f.endswith(".test"):
                    rels.append(os.path.relpath(os.path.join(root, f[:-5]), SUITE))
    elif args:
        rels = []
        for a in args:
            p = os.path.join(SUITE, a)
            if os.path.isdir(p):
                for root, _, fs in os.walk(p):
                    for f in fs:
                        if f.endswith(".test"):
                            rels.append(
                                os.path.relpath(os.path.join(root, f[:-5]), SUITE)
                            )
            else:
                rels.append(a)
    else:
        with open(PINS) as fh:
            rels = [ln.strip() for ln in fh if ln.strip()]
    rels = sorted(set(rels))
    n_workers = int(os.environ.get("PAR", "8"))
    ok = 0
    failed = []
    with cf.ProcessPoolExecutor(
        max_workers=n_workers, initializer=_init_worker
    ) as ex:
        for rel, good, detail in ex.map(run_one, rels, chunksize=4):
            if good:
                ok += 1
            else:
                failed.append((rel, detail))
                print(f"FAIL {rel}: {detail}", flush=True)
    print(f"\n== {ok} pass, {len(failed)} fail (of {len(rels)}) ==")
    for rel, _ in failed:
        print("  FAIL", rel)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
