"""Hash-collision fallback of the stage-A word path.

The scale path groups tokens by a 64-bit FNV term hash with a
composite (top-32-bits | index) sort. Both collision classes must be
detected and routed to the exact string path (build.py
_tokenize_group_word docstring):
  (a) equal full hashes for distinct terms -> docids repeat in a group
  (b) distinct hashes sharing their top 32 bits -> alternating
      fragment segments
"""

import numpy as np
import pyarrow as pa

from groonga_ray import build as build_mod
from groonga_ray.build import BuildConfig, _tokenize_group_word
from groonga_ray.tokenize import WordTokenizer


COL = pa.array(
    ["alpha beta alpha", "beta gamma", "alpha delta beta delta"],
    type=pa.large_string(),
)
DOCIDS = np.array([1, 2, 3], np.uint64)


def _run(monkeypatch, fake_hash):
    monkeypatch.setattr(build_mod, "fnv1a", fake_hash)
    cfg = BuildConfig(text_columns=("content",))
    return _tokenize_group_word(cfg, COL, DOCIDS, WordTokenizer())


def test_full_hash_collision_falls_back(monkeypatch):
    # every term hashes to the same 64-bit value -> detected exactly at
    # the vocab->term dict (two distinct terms, one hash) -> None
    res = _run(monkeypatch, lambda arr, seed=0: np.full(len(arr), 7, np.uint64))
    assert res is None


def test_top32_collision_falls_back(monkeypatch):
    # distinct low-32 hashes under a constant top-32: the composite
    # sort degenerates to input order, fragmenting term groups into
    # alternating segments that share their top 32 bits
    def weak(arr, seed=0):
        # deterministic distinct low bits per distinct string
        vals = [abs(hash(s)) % 0xFFFFFFFF for s in arr.to_pylist()]
        return np.array(vals, np.uint64)  # top 32 bits all zero

    res = _run(monkeypatch, weak)
    assert res is None


def test_healthy_hash_groups(monkeypatch):
    from groonga_ray.utils import fnv1a

    res = _run(monkeypatch, fnv1a)
    assert res is not None
    terms, term_offsets, docids, tf, pos_off, pos, n_tokens, n_trunc = res
    got = {}
    for i, t in enumerate(terms.to_pylist()):
        for j in range(term_offsets[i], term_offsets[i + 1]):
            got[(t, int(docids[j]))] = int(tf[j])
    assert got[("alpha", 1)] == 2
    assert got[("beta", 3)] == 1
    assert got[("delta", 3)] == 2
    assert ("gamma", 1) not in got and got[("gamma", 2)] == 1
    assert n_tokens.tolist() == [3, 2, 4]
