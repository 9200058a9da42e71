"""Cardinality operators: exact distinct counts and HyperLogLog.

* :func:`distinct_count` — exact count(DISTINCT val) per key. Batches
  pre-dedup locally, one hash groupby over the (key, val) pairs, then
  a per-key count — the exchange carries unique pairs, never raw rows.
  The oracle path (SQL-exact).
* :func:`hll_count` — HyperLogLog++-style estimate per key (Flajolet
  et al.; the standard distributed sketch). Each batch folds its
  values into 2^b byte registers per key; the per-(key, batch)
  partials are merged IN THE CLUSTER by a hash-partitioned groupby
  whose per-partition collapse is one vectorized maximum.reduceat over
  the stacked register matrix — the driver only ever sees the final
  (key, estimate) rows. Register memory is O(keys_in_partition x 2^b)
  regardless of n; one pass over the data plus one partials exchange
  (partials are 2^b bytes per key per batch, not raw rows). The
  100 TB path when 1-2% error is fine. (Mergeable-sketch precedent in
  the reference: the df estimate counters, lib/ii.c:2802.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..utils import fnv1a


def distinct_count(
    ds: "ray.data.Dataset", key_col: str = "event_type", val_col: str = "user_id"
) -> "ray.data.Dataset":
    """(key, n_distinct) — exact, via a unique-pairs exchange."""

    def local_pairs(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).cast(pa.large_string())
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = pc.dictionary_encode(key)
        kc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, kc))
        kc, v = kc[order], v[order]
        keep = np.concatenate([[True], (kc[1:] != kc[:-1]) | (v[1:] != v[:-1])]) if len(kc) else np.zeros(0, bool)
        return pa.table(
            {
                key_col: enc.dictionary.take(pa.array(kc[keep])),
                val_col: pa.array(v[keep], pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(local_pairs, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .count()
    )

    def drop(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key_col not in batch.schema.names:
            return pa.schema([(key_col, pa.large_string())]).empty_table()
        return batch.select([key_col])

    def rename(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns < 2:
            return pa.schema(
                [(key_col, pa.large_string()), ("n_distinct", pa.int64())]
            ).empty_table()
        return batch.rename_columns([key_col, "n_distinct"])

    return (
        pairs.map_batches(drop, batch_format="pyarrow")
        .groupby(key_col)
        .count()
        .map_batches(rename, batch_format="pyarrow")
    )


def hll_count(
    ds: "ray.data.Dataset", key_col: str = "event_type", val_col: str = "user_id",
    b: int = 12, n_parts: int = 32, collect: bool = True,
) -> "pa.Table | ray.data.Dataset":
    """HyperLogLog distinct estimate per key. One streaming pass
    emitting (key, 2^b-byte register) partials; the max-merge runs
    distributed (hash-partitioned groupby, vectorized reduceat per
    partition), so exactly one row per key leaves the merge.

    ``collect=True`` (convenience, for modest key cardinality) returns
    a small key-sorted Arrow table on the driver. ``collect=False`` is
    the fully streaming path: returns the key-sorted ``(key,
    estimate)`` Dataset — at extreme key cardinality the result itself
    is large, so consume it with ``write_parquet``/``iter_batches``."""
    m = 1 << b

    def partial(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).cast(pa.large_string())
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = pc.dictionary_encode(key)
        kc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(val_col).cast(pa.large_string())
        h = fnv1a(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
        bucket = (h & np.uint64(m - 1)).astype(np.int64)
        rest = h >> np.uint64(b)
        # rank = leading-zero count of the remaining 64-b bits + 1,
        # capped; computed via bit_length
        nonzero = rest != 0
        rank = np.full(len(h), 64 - b + 1, np.uint8)
        if nonzero.any():
            bl = np.zeros(len(h), np.int64)
            r = rest.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                big = r >= (np.uint64(1) << np.uint64(shift))
                bl[big] += shift
                r[big] >>= np.uint64(shift)
            bl += 1  # bit length
            rank[nonzero] = ((64 - b) - bl[nonzero] + 1).astype(np.uint8)
        regs = {}
        for ki in range(len(enc.dictionary)):
            mask = kc == ki
            reg = np.zeros(m, np.uint8)
            np.maximum.at(reg, bucket[mask], rank[mask])
            regs[enc.dictionary[ki].as_py()] = reg
        key_arr = pa.array(list(regs), pa.large_string())
        return pa.table(
            {
                "key": key_arr,
                "reg": pa.array([r.tobytes() for r in regs.values()], pa.large_binary()),
                "p": pa.array(
                    (fnv1a(key_arr) % np.uint64(n_parts)).astype(np.int64), pa.int64()
                ),
            }
        )

    def merge_part(group: pa.Table) -> pa.Table:
        # one hash partition: stack registers, max-merge runs of equal
        # keys with a single maximum.reduceat, estimate per row — no
        # per-key Python even at high key cardinality
        if group.num_rows == 0:
            return pa.schema(
                [("key", pa.large_string()), ("estimate", pa.float64())]
            ).empty_table()
        keys = group.column("key").cast(pa.large_string())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = pc.dictionary_encode(keys)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        regcol = group.column("reg")
        if isinstance(regcol, pa.ChunkedArray):
            regcol = regcol.combine_chunks()
        regs = np.frombuffer(
            b"".join(regcol.to_pylist()), np.uint8
        ).reshape(group.num_rows, m)
        order = np.argsort(codes, kind="stable")
        codes, regs = codes[order], regs[order]
        first = np.concatenate([[True], codes[1:] != codes[:-1]])
        starts = np.flatnonzero(first)
        merged = np.maximum.reduceat(regs, starts, axis=0)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-merged.astype(np.float64)), axis=1)
        zeros = (merged == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            est[small] = m * np.log(m / zeros[small])   # small-range correction
        return pa.table(
            {
                "key": enc.dictionary.take(pa.array(codes[starts])),
                "estimate": pa.array(est, pa.float64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .map_groups(merge_part, batch_format="pyarrow")
    )
    if not collect:
        return merged.sort("key")
    out = merged.take_all()
    out.sort(key=lambda r: r["key"])
    return pa.table(
        {
            "key": pa.array([r["key"] for r in out], pa.large_string()),
            "estimate": pa.array([r["estimate"] for r in out], pa.float64()),
        }
    )
