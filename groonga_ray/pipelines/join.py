"""Broadcast (map-side) join — the small-side pattern for 100 TB.

``Dataset.join`` hash-partitions BOTH sides; when one side fits in
memory (dimension tables, per-language weights, eval-set metadata),
the right move is to put it in the object store ONCE (``ray.put``) and
join inside ``map_batches`` with a vectorized ``pc.index_in`` lookup —
zero shuffle, the big side streams through untouched.

The small side is shipped to each actor via the object store (not
re-serialized per batch): the callable class resolves the ObjectRef in
``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


class _BroadcastJoiner:
    def __init__(self, small_ref, left_on: str, right_on: str, how: str):
        small = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.keys = small.column(right_on).combine_chunks()
        self.payload = small.drop_columns([right_on])
        self.left_on = left_on
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        lk = batch.column(self.left_on)
        if isinstance(lk, pa.ChunkedArray):
            lk = lk.combine_chunks()
        idx = pc.index_in(lk.cast(self.keys.type), value_set=self.keys)
        if self.how == "inner":
            valid = pc.is_valid(idx)
            batch = batch.filter(valid)
            idx = idx.filter(valid)
        out = batch
        for name in self.payload.column_names:
            out = out.append_column(name, self.payload.column(name).take(idx))
        return out


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pa.Table,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Join ``ds`` with an in-memory Arrow table without a shuffle.

    ``small`` must have unique keys in ``right_on`` (first match wins
    otherwise — index_in semantics). ``how`` is "inner" or "left"
    (left emits nulls for the payload columns of unmatched rows).
    """
    right_on = right_on or left_on
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if concurrency is None:
        # leave a CPU for upstream read tasks or the pool starves them
        concurrency = max(2, min(8, int(ray.cluster_resources().get("CPU", 4)) - 1))
    ref = ray.put(small.combine_chunks())
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(ref, left_on, right_on, how),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
