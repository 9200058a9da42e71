"""Deterministic sampling / data-mixing operators.

A 100 TB pre-training pipeline re-weights domains ("2x code, 0.3x
crawl") and carves out held-out splits. Doing that with ``ds.
random_sample`` is non-reproducible and non-resumable; these operators
key every decision on a *hash of the row id*, so membership is a pure
function of the row — stable across reruns, partitions-independent,
and resumable for free (matching the per-partition lineage story of
the index build).

Two hash paths, same contract as dedup.exact_dedup/exact_dedup_fast:

* ``method="md5"`` — hash = first 8 hex digits of md5(str(id)), u32 /
  2^32. Per-row hashlib on the id column only (NOT the payload);
  SQL-oracle-exact (DuckDB ``md5()``), the interop/verification path.
* ``method="fnv"`` — vectorized 64-bit FNV-1a over the decimal id
  string (utils.fnv1a); the 100 TB path, no Python loop. Same keep
  semantics, different hash stream (rows-only invariants in tests).

Both are a single streaming ``map_batches`` filter — no shuffle, no
driver materialization, independent of partitioning.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..utils import fnv1a

_U32 = float(1 << 32)
_U64 = float(1 << 64)


def _id_fraction(ids: pa.Array, method: str, salt: str) -> np.ndarray:
    """Uniform [0,1) fraction per id, deterministic in (id, salt)."""
    s = ids.cast(pa.large_string())
    if method == "md5":
        py = s.to_pylist()
        out = np.empty(len(py), np.float64)
        for i, v in enumerate(py):  # id column only; the md5 interop path
            h = hashlib.md5((salt + v).encode()).hexdigest()
            out[i] = int(h[:8], 16) / _U32
        return out
    if method == "fnv":
        if salt:
            import pyarrow.compute as pc

            s = pc.binary_join_element_wise(
                pa.scalar(salt, pa.large_string()), s, pa.scalar("", pa.large_string())
            )
        h = fnv1a(s)
        # FNV-1a of short decimal strings clusters in the high bits;
        # run a splitmix64 finalizer so the [0,1) fraction is uniform
        with np.errstate(over="ignore"):
            h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            h = h ^ (h >> np.uint64(31))
        return h.astype(np.float64) / _U64
    raise ValueError(f"unknown hash method {method!r}")


def stratified_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    method: str = "md5",
    salt: str = "",
) -> "ray.data.Dataset":
    """Keep each row iff hash_frac(id) < rates[group] (domain mixing).

    ``rates`` maps group values to keep probabilities; groups absent
    from the map use ``default_rate``. Deterministic: the same row is
    kept in every run and at any partitioning.
    """
    items = sorted(rates.items())

    def keep(batch: pa.Table) -> pa.Table:
        frac = _id_fraction(batch.column(id_col), method, salt)
        g = batch.column(group_col).cast(pa.large_string()).to_numpy(zero_copy_only=False)
        rate = np.full(batch.num_rows, float(default_rate))
        for k, v in items:
            rate[g == k] = float(v)
        return batch.filter(pa.array(frac < rate))

    return ds.map_batches(keep, batch_format="pyarrow")


def train_eval_split(
    ds: "ray.data.Dataset",
    eval_frac: float,
    id_col: str = "doc_id",
    method: str = "md5",
    salt: str = "split",
) -> "ray.data.Dataset":
    """Add a ``split`` column ('eval' iff hash_frac(id) < eval_frac).

    One streaming pass; a row's split never changes as the corpus
    grows (new rows hash independently), which is what makes held-out
    sets stable across ingestion increments.
    """

    def tag(batch: pa.Table) -> pa.Table:
        frac = _id_fraction(batch.column(id_col), method, salt)
        split = np.where(frac < float(eval_frac), "eval", "train")
        return batch.append_column("split", pa.array(split.tolist(), pa.large_string()))

    return ds.map_batches(tag, batch_format="pyarrow")
