#!/usr/bin/env python3
"""Dev harness: run one or more reference suite scripts through our
CommandServer and print per-command pass/fail with diffs.

Usage: python tools/run_suite.py select/filter/geo_in_circle/...  [more]
       python tools/run_suite.py --list-fail suggest/complete   (prefix sweep)
"""
import json
import logging
import os
import sys
import tempfile

import ray

logging.getLogger("ray").setLevel(logging.ERROR)
logging.getLogger("ray.data").setLevel(logging.ERROR)

SUITE = "/root/reference/test/command/suite"


def run_one(rel: str, verbose: bool = True) -> bool:
    from groonga_ray.conformance import ScriptRunner
    from groonga_ray.server import CommandServer

    test = os.path.join(SUITE, rel + ".test")
    exp = test[: -len(".test")] + ".expected"
    if not os.path.exists(test) or not os.path.exists(exp):
        print(f"SKIP (missing) {rel}")
        return False
    with tempfile.TemporaryDirectory() as td:
        server = CommandServer(data_dir=td)
        runner = ScriptRunner(server)
        try:
            results = runner.run_conformance(test, exp)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {rel}: {type(e).__name__}: {e}")
            if verbose:
                import traceback

                traceback.print_exc()
            return False
    bad = [r for r in results if not r["ok"]]
    if not bad:
        print(f"PASS {rel} ({len(results)} commands)")
        return True
    print(f"FAIL {rel}: {len(bad)}/{len(results)} commands diverge")
    if verbose:
        for r in bad[:4]:
            print(f"  cmd: {r['command'][:200]}")
            print(f"  detail: {r['detail'][:500]}")
            if r.get("ours") is not None:
                print(f"  ours:     {json.dumps(r['ours'], default=str)[:500]}")
            if r.get("expected") is not None:
                print(f"  expected: {json.dumps(r['expected'], default=str)[:500]}")
    return False


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sweep = "--list-fail" in sys.argv
    quiet = "--quiet" in sys.argv or sweep
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    rels = []
    for a in args:
        p = os.path.join(SUITE, a)
        if os.path.isdir(p):
            for root, _, fs in os.walk(p):
                for f in sorted(fs):
                    if f.endswith(".test"):
                        rels.append(
                            os.path.relpath(os.path.join(root, f[:-5]), SUITE)
                        )
        else:
            rels.append(a)
    ok = fail = 0
    failed = []
    for rel in sorted(set(rels)):
        if run_one(rel, verbose=not quiet):
            ok += 1
        else:
            fail += 1
            failed.append(rel)
    print(f"\n== {ok} pass, {fail} fail ==")
    for r in failed:
        print("  FAIL", r)
    ray.shutdown()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
