"""EXACT distributed quantiles without a global sort.

``ds.sort(col)`` makes order statistics trivial but costs an
all-to-all exchange of the whole column. This instead runs a
distributed quickselect: (1) one pass for count/min/max plus a
deterministic hash-sample, (2) a bracket [lo, hi] per target rank from
the sample's order statistics with a generous safety margin, (3) one
pass counting values below the bracket and collecting ONLY the
in-bracket values (expected O(n/sqrt(m)) rows) to the driver, where
the exact rank is read off. Widens and retries (rare) if the sample
misled. 2 passes over the data in the common case; the shuffle-free
analogue of Spark/Flink's approx-percentile machinery but exact.

Rank convention matches DuckDB ``quantile_disc``: the value at sorted
index ``max(0, ceil(q*n) - 1)``. Use binary-exact q values (k/2^m:
0.25, 0.5, 0.875, ...) so ceil(q*n) is float-unambiguous on both
sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def exact_quantiles(
    ds: "ray.data.Dataset",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    val_col: str = "value",
    sample_target: int = 20_000,
    collect_cap: int = 2_000_000,
    max_attempts: int = 6,
) -> pa.Table:
    """Returns a small Arrow table (q, value) — exact order statistics."""

    # ---- pass 1: count + deterministic hash sample. The hash mixes a
    # per-row component (block-local index) with the value bits: keying
    # on the value alone would sample every duplicate of a value
    # together, shrinking the effective sample on heavy-tie
    # distributions until the 6-sigma bracket misses.
    def stats(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        rowmix = _splitmix(
            np.arange(len(v), dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        )
        h = _splitmix(v.view(np.uint64) ^ rowmix)
        # rate applied on the driver: emit hash + value for a fixed
        # top slice of hash space (oversample; trimmed below)
        samp = v[h < np.uint64(int(0.05 * (1 << 64)))]
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "samp": pa.array([samp.tolist()], pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(stats, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())})
    sample = np.sort(np.concatenate([np.asarray(p["samp"], np.float64) for p in parts]))
    if len(sample) > sample_target:
        step = len(sample) / sample_target
        sample = sample[(np.arange(sample_target) * step).astype(np.int64)]
    m = len(sample)

    targets = {q: max(0, math.ceil(q * n) - 1) for q in qs}

    # margin_mult search is a monotone bisection: `narrow` is the
    # largest multiplier that missed a rank, `wide` the smallest that
    # overflowed collect_cap — the next probe is their geometric mean,
    # so the widen/tighten ladder cannot oscillate.
    margin_mult, narrow, wide = 1.0, None, None
    for _ in range(max_attempts):
        # bracket each rank via sample order statistics; margin from
        # the binomial deviation of sample ranks (generous 6 sigma)
        brackets = {}
        for q, r in targets.items():
            if m == 0:
                brackets[q] = (-np.inf, np.inf)
                continue
            j = int(r / n * m)
            dev = int(margin_mult * (6.0 * math.sqrt(m) + 8))
            lo = sample[max(0, j - dev)] if j - dev >= 0 else -np.inf
            hi = sample[min(m - 1, j + dev)] if j + dev <= m - 1 else np.inf
            brackets[q] = (lo, hi)

        glo = min(b[0] for b in brackets.values())
        ghi = max(b[1] for b in brackets.values())

        # ---- pass 2: count below the bracket + collect in-bracket
        def bracket_pass(batch: pa.Table, glo=glo, ghi=ghi) -> pa.Table:
            v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            below = int((v < glo).sum())
            inr = v[(v >= glo) & (v <= ghi)]
            return pa.table(
                {
                    "below": pa.array([below], pa.int64()),
                    "inr": pa.array([inr.tolist()], pa.list_(pa.float64())),
                }
            )

        parts2 = ds.map_batches(bracket_pass, batch_format="pyarrow").take_all()
        n_below = sum(p["below"] for p in parts2)
        inrange = np.sort(
            np.concatenate([np.asarray(p["inr"], np.float64) for p in parts2])
        )
        if len(inrange) > collect_cap:
            wide = margin_mult   # bracket too wide — tighten
            margin_mult = (
                math.sqrt(narrow * wide) if narrow is not None else margin_mult * 0.5
            )
            continue
        ranks = list(targets.values())
        if all(n_below <= r < n_below + len(inrange) for r in ranks):
            out_q, out_v = [], []
            for q, r in sorted(targets.items()):
                out_q.append(q)
                out_v.append(float(inrange[r - n_below]))
            return pa.table(
                {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
            )
        narrow = margin_mult     # bracket missed a rank — widen
        margin_mult = (
            math.sqrt(narrow * wide) if wide is not None else margin_mult * 4.0
        )
    raise RuntimeError("exact_quantiles failed to bracket the target ranks")
