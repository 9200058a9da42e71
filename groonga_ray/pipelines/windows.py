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
