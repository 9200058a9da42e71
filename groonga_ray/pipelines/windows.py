"""Event-time window aggregations over a Ray Dataset.

The reference is batch-only (SURVEY §1.2: no streaming machinery
anywhere in Groonga); these realize the stream-shaped patterns
batch-side: window assignment is a vectorized map_batches (each event
expands to its member windows), the aggregation is one hash groupby
with algebraic combiners — the expansion factor is size/hop, the
shuffle carries (key, window) partials, never raw events per window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset, size_us: int,
    ts_col: str = "ts", key_col: str = "event_type", val_col: str = "value",
) -> ray.data.Dataset:
    """Non-overlapping windows: floor(ts/size)*size buckets."""
    return sliding_window_agg(ds, size_us, size_us, ts_col, key_col, val_col)


def sliding_window_agg(
    ds: ray.data.Dataset, size_us: int, hop_us: int,
    ts_col: str = "ts", key_col: str = "event_type", val_col: str = "value",
) -> ray.data.Dataset:
    """Overlapping windows (size, hop): an event at t belongs to the
    k = size/hop windows starting at floor(t/hop)*hop - j*hop for
    j in [0, k). Returns (key, window_us, n, sum_value)."""
    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    k = size_us // hop_us

    def expand(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        epoch = pc.cast(b.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        base = epoch // hop_us * hop_us
        n = len(epoch)
        # n x k window starts, flattened — pure numpy, no row loop
        starts = (base[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_us).ravel()
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        keys = b.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = b.column(val_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        take = pa.array(idx)
        return pa.table(
            {
                key_col: keys.take(take),
                "window_us": pa.array(starts, pa.int64()),
                val_col: vals.take(take),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby([key_col, "window_us"])
        .aggregate(Count(alias_name="n"), Sum(val_col, alias_name="sum_value"))
    )


def sessionize(
    ds: ray.data.Dataset, gap_us: int,
    ts_col: str = "ts", key_col: str = "user_id", id_col: str = "event_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Gap-based sessionization: within each key, a new session starts
    when the time since the previous event exceeds ``gap_us``.

    Output: (id_col, key_col, session_seq, session_start_us) — session
    ids are per-key ordinals (0-based, in time order), session_start is
    the first event's timestamp, so ids are stable under repartitioning.

    Shape: ONE hash exchange (groupby on a key partition), then a
    single vectorized pass per partition: lexsort (key, ts, id), gap
    detection via shifted comparison, per-key cumsum for the ordinal,
    first-of-session scatter for the start. No per-key Python — a
    partition with 10^6 users is still three numpy passes.
    """
    import pyarrow.compute as pc

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        return pa.table(
            {
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                "ts_us": ts,
                "p": pa.array((k % num_partitions), pa.int64()),
            }
        )

    def assign(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema(
                [(id_col, pa.int64()), (key_col, pa.int64()),
                 ("session_seq", pa.int64()), ("session_start_us", pa.int64())]
            ).empty_table()
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        eid = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, k))
        k, t, eid = k[order], t[order], eid[order]
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        new_sess = new_key | np.concatenate([[True], (t[1:] - t[:-1]) > gap_us])
        # per-key 0-based session ordinal: global cumsum minus the
        # cumsum value at each key's first row
        sid = np.cumsum(new_sess) - 1
        key_base = sid[np.flatnonzero(new_key)]
        key_idx = np.cumsum(new_key) - 1
        seq = sid - key_base[key_idx]
        # session start = first ts of each session, gathered by sid
        start = t[np.flatnonzero(new_sess)][sid]
        return pa.table(
            {
                id_col: pa.array(eid, pa.int64()),
                key_col: pa.array(k, pa.int64()),
                "session_seq": pa.array(seq.astype(np.int64), pa.int64()),
                "session_start_us": pa.array(start, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("p")
        .map_groups(assign, batch_format="pyarrow")
    )


def grouped_topk(
    ds: ray.data.Dataset, k: int,
    key_col: str = "event_type", val_col: str = "value", id_col: str = "event_id",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Top-k rows per key by value (desc), ties broken by id asc.

    Pre-prune inside each batch BEFORE the exchange (a batch can
    contribute at most k rows per key), then one hash exchange on a
    key partition and a vectorized final prune — the shuffle carries
    O(batches x keys x k) rows, never the corpus.
    """
    import pyarrow.compute as pc

    def topk_pass(batch: pa.Table, final: bool) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [(id_col, pa.int64()), (key_col, pa.large_string()),
                 (val_col, pa.float64()), ("p", pa.int64())]
            ).empty_table()
        key = batch.column(key_col).cast(pa.large_string())
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = pc.dictionary_encode(key)
        kc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False)
        eid = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -v, kc))
        kc_s = kc[order]
        first = np.concatenate([[True], kc_s[1:] != kc_s[:-1]])
        starts = np.flatnonzero(first)
        gid = np.cumsum(first) - 1
        rank = np.arange(len(kc_s)) - starts[gid]
        keep = order[rank < k]
        keep.sort()
        out = batch.take(pa.array(keep))
        from ..utils import fnv1a as _f

        p = (
            _f(out.column(key_col).cast(pa.large_string()).combine_chunks())
            % np.uint64(num_partitions)
        ).astype(np.int64)
        cols = {
            id_col: out.column(id_col).cast(pa.int64()),
            key_col: out.column(key_col).cast(pa.large_string()),
            val_col: out.column(val_col).cast(pa.float64()),
            "p": pa.array(p, pa.int64()),
        }
        return pa.table(cols)

    pruned = ds.map_batches(
        lambda b: topk_pass(b, False), batch_format="pyarrow"
    )

    def final(group: pa.Table) -> pa.Table:
        out = topk_pass(group, True)
        return out.drop_columns(["p"])

    return pruned.groupby("p").map_groups(final, batch_format="pyarrow")
