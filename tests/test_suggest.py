"""Suggest family unit tests: learner replay semantics on hand-crafted
logs (the 60 s break, the prior-submit stop, token interning with the
self-stop rule) and the query-side complete/correct/suggest paths
including the similar-search branch of correct.

Reference: plugins/suggest/suggest.c (learner 630-1003, query side
138-525)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from groonga_ray.pipelines import suggest as sg

S = 1_000_000  # one second in microseconds


def _events(rows):
    seq, doc, ordn, t, item, sub = zip(*rows)
    return pa.table(
        {
            "seq": pa.array(seq, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "ord": pa.array(ordn, pa.int64()),
            "time_us": pa.array(t, pa.int64()),
            "item": pa.array(item, pa.string()),
            "is_submit": pa.array(sub, pa.int64()),
        }
    )


def _learn(tmp_path, rows, weight=1):
    import ray.data

    out = str(tmp_path / "ds")
    sg.learn_to_dir(ray.data.from_arrow(_events(rows)), out, weight=weight)
    items = pq.read_table(os.path.join(out, "items.parquet"))
    pairs = pq.read_table(os.path.join(out, "pairs.parquet"))
    return out, items, pairs


def _pair_map(pairs):
    return {
        (p, q): (f0, f1, f2)
        for p, q, f0, f1, f2 in zip(
            pairs.column("pre").to_pylist(),
            pairs.column("post").to_pylist(),
            pairs.column("freq0").to_pylist(),
            pairs.column("freq1").to_pylist(),
            pairs.column("freq2").to_pylist(),
        )
    }


def test_learner_walkback_and_break(ray_session, tmp_path):
    # seq 0: A(input) .. B(submit) .. C(submit) .. D(submit after 80 s)
    rows = [
        (0, 1, 1, 0 * S, "aa", 0),
        (0, 1, 2, 10 * S, "aa bb", 1),
        (0, 1, 3, 20 * S, "aa bb cc", 1),
        (0, 1, 4, 100 * S, "dd ee", 1),
    ]
    out, items, pairs = _learn(tmp_path, rows)
    pm = _pair_map(pairs)
    # B's walk: A is a non-submit within 60 s -> freq0(A -> B)
    assert pm[("aa", "aa bb")][:2] == (1, 0)
    # C's walk: B is a prior submit -> freq1(B -> C), walk stops (A
    # untouched by C)
    assert pm[("aa bb", "aa bb cc")][:2] == (0, 1)
    assert ("aa", "aa bb cc") not in pm or pm[("aa", "aa bb cc")][:2] == (0, 0)
    # D's walk: gap to C is 80 s >= MIN_LEARN_DISTANCE -> no freq0/freq1
    for k, v in pm.items():
        if k[1] == "dd ee":
            assert v[:2] == (0, 0)
    # suggest learning: distinct tokens of each submitted key
    assert pm[("aa", "aa bb")][2] == 1
    assert pm[("bb", "aa bb")][2] == 1
    assert pm[("cc", "aa bb cc")][2] == 1
    assert pm[("dd", "dd ee")][2] == 1
    # item counters: freq counts every event, freq2 submits only
    it = {
        k: (f, f2)
        for k, f, f2 in zip(
            items.column("key").to_pylist(),
            items.column("freq").to_pylist(),
            items.column("freq2").to_pylist(),
        )
    }
    assert it["aa"] == (1, 0)  # typed once, never submitted
    assert it["aa bb"] == (1, 1)
    # token-only items interned with zero counters (GRN_TOKEN_ADD)
    assert it["bb"] == (0, 0)
    assert it["ee"] == (0, 0)


def test_learner_token_self_stop(ray_session, tmp_path):
    # a single-token submit: the token equals the key itself, so the
    # token walk stops immediately (suggest.c:911) -> no freq2 pairs
    rows = [(0, 1, 1, 0, "solo", 1)]
    out, items, pairs = _learn(tmp_path, rows)
    assert pairs.num_rows == 0
    it = dict(
        zip(items.column("key").to_pylist(), items.column("freq2").to_pylist())
    )
    assert it == {"solo": 1}


def test_learner_weight(ray_session, tmp_path):
    rows = [
        (0, 1, 1, 0 * S, "aa", 0),
        (0, 1, 2, 10 * S, "aa bb", 1),
    ]
    out, items, pairs = _learn(tmp_path, rows, weight=3)
    it = dict(zip(items.column("key").to_pylist(), items.column("freq").to_pylist()))
    assert it["aa"] == 3 and it["aa bb"] == 3
    pm = _pair_map(pairs)
    assert pm[("aa", "aa bb")] == (3, 0, 3)


def test_complete_prefix_modes(ray_session, tmp_path):
    rows = [
        (0, 1, 1, 0 * S, "spark", 0),
        (0, 1, 2, 10 * S, "spark sql", 1),
        (0, 2, 1, 2000 * S, "spark", 0),
        (0, 2, 2, 2010 * S, "spark sql", 1),
    ]
    out, _, _ = _learn(tmp_path, rows)
    sd = sg.SuggestDataset(out)
    got = sd.complete("spa", frequency_threshold=2, sortby="-_score,_key")
    # prefix pass: score = 1 + freq; "spark" freq 2 -> 3, "spark sql"
    # freq 2 -> 3; token "sql" doesn't prefix-match
    assert got.column("_key").to_pylist() == ["spark", "spark sql"]
    assert got.column("_score").to_pylist() == [3, 3]
    # prefix_search=yes re-adds the fallback pass (kana == key): doubles
    got2 = sd.complete(
        "spa", frequency_threshold=2, sortby="-_score,_key", prefix_search="yes"
    )
    assert got2.column("_score").to_pylist() == [6, 6]
    # cooccurrence on exact item: freq0(spark -> spark sql) = 2
    got3 = sd.complete(
        "spark",
        frequency_threshold=2,
        conditional_probability_threshold=0.1,
        sortby="-_score,_key",
    )
    scores = dict(
        zip(got3.column("_key").to_pylist(), got3.column("_score").to_pylist())
    )
    # "spark sql": prefix 1+2 plus pair freq0 2 = 5; "spark": prefix 3
    assert scores["spark sql"] == 5
    assert scores["spark"] == 3


def test_suggest_and_correct_cooccurrence(ray_session, tmp_path):
    rows = [
        (0, 1, 1, 0 * S, "big data", 1),
        (0, 1, 2, 10 * S, "big data spark", 1),
    ]
    out, _, _ = _learn(tmp_path, rows)
    sd = sg.SuggestDataset(out)
    # freq1 pair: ("big data" -> "big data spark")
    got = sd.correct(
        "big data",
        frequency_threshold=1,
        conditional_probability_threshold=0.05,
        similar_search="no",
    )
    assert got.column("_key").to_pylist() == ["big data spark"]
    # freq2 pairs: token "big" co-occurs with both submitted keys
    got2 = sd.suggest(
        "big", frequency_threshold=1, conditional_probability_threshold=0.05,
        sortby="-_score,_key",
    )
    assert got2.column("_key").to_pylist() == ["big data", "big data spark"]


def test_correct_similar_branch(ray_session, tmp_path):
    # no freq1 pairs at all -> max_score 0 < threshold -> similar search
    # fires in auto mode: items sharing rare tokens of the query,
    # rescored by 1 + (freq2>>4) + boost then penalized by edit distance
    rows = [
        (0, 1, 1, 0 * S, "spark sql", 1),
        (1, 2, 1, 0 * S, "spark row", 1),
    ]
    out, _, _ = _learn(tmp_path, rows)
    sd = sg.SuggestDataset(out)
    got = sd.correct(
        "spark sqk",  # typo'd query; shares token "spark"
        frequency_threshold=1,
        conditional_probability_threshold=0.05,
        similar_search="auto",
        sortby="-_score,_key",
    )
    scores = dict(zip(got.column("_key").to_pylist(), got.column("_score").to_pylist()))
    # similar adds 1 per shared selected token, rescore adds 1 (+freq2>>4=0),
    # then subtracts edit distance: "spark sql" -> 1+1-1 = 1
    assert scores["spark sql"] == 1
    # threshold drops everything with negative final score
    assert all(s >= 0 for s in scores.values())


def test_suggest_cli(tmp_path):
    # CLI command over a learned dataset (owns its ray session contract:
    # suggest query side needs no ray)
    import json
    import subprocess
    import sys

    ds = str(tmp_path / "cli_ds")
    os.makedirs(ds, exist_ok=True)
    items = pa.table(
        {
            "key": pa.array(["ml", "ml ops", "ops"], pa.string()),
            "freq": pa.array([4, 3, 0], pa.int64()),
            "freq2": pa.array([2, 3, 0], pa.int64()),
            "last_us": pa.array([0, 0, None], pa.int64()),
        }
    )
    pairs = pa.table(
        {
            "pre": pa.array(["ml"], pa.string()),
            "post": pa.array(["ml ops"], pa.string()),
            "freq0": pa.array([3], pa.int64()),
            "freq1": pa.array([0], pa.int64()),
            "freq2": pa.array([2], pa.int64()),
        }
    )
    pq.write_table(items, os.path.join(ds, "items.parquet"))
    pq.write_table(pairs, os.path.join(ds, "pairs.parquet"))
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "groonga_ray.cli",
            "suggest",
            "--dataset",
            ds,
            "--types",
            "complete|suggest",
            "--query",
            "ml",
            "--frequency-threshold",
            "2",
            "--conditional-probability-threshold",
            "0.1",
            "--sortby=-_score,_key",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    env = json.loads(res.stdout)
    comp = env["complete"]
    # rows: [ _key, _score ]; "ml" prefix 1+4=5, "ml ops" prefix 1+3=4
    # plus pair freq0 3 (ifreq 3 >= 2, cp 3/3 >= 0.1) = 7
    assert comp[0] == [2]
    body = {r[0]: r[1] for r in comp[2:]}
    assert body == {"ml ops": 7, "ml": 5}
    sug = env["suggest"]
    body2 = {r[0]: r[1] for r in sug[2:]}
    assert body2 == {"ml ops": 2}
