"""Deterministic global docid assignment.

The reference assigns dense 1-based record ids in load order
(grn_table_add, include/groonga/groonga.h:36-40); our rule (SURVEY.md
§1.1) is: ``docid = rank of (repo, path) in the global sort`` — the
same rank ``row_number() OVER (ORDER BY repo, path)`` computes in the
DuckDB oracle, so rank-identity is well-defined.

Two paths:

* :func:`sorted_file_shards` — metadata-only. When the input Parquet
  files are globally sorted by the key (our corpus writer guarantees
  it), per-shard docid bases are prefix sums of row counts read from
  file metadata. Zero data movement — this is the 10^12-row path, and
  it is what makes shards contiguous docid ranges (which the salted
  posting merge relies on).

* :func:`compute_rank_mapping` — general inputs. A range-partitioned
  rank: sample split boundaries, count rows per range (one cheap
  column-pruned pass), prefix-sum the counts, then rank within ranges.
  Any correct boundary sample yields the same ranks (keys are unique),
  so determinism does not depend on the sample.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq


@dataclass
class Shard:
    """A contiguous row range of one input file.

    Shards may be finer than row groups: reading then slices the
    overlapping row groups. Shard size bounds each build task's peak
    memory footprint — size it so tokenize temporaries fit comfortably
    in a worker's heap (SURVEY.md §4, block/batch sizing).
    """

    shard_id: int
    file: str
    row_start: int   # absolute row offset within the file
    num_rows: int
    docid_base: int  # first docid of this shard (docids are 1-based)


def sorted_file_shards(
    files: list[str],
    target_rows_per_shard: int = 200_000,
    first_docid: int = 1,
) -> list[Shard]:
    """Split key-sorted files into contiguous row-range shards.

    docid of row r within a shard = ``shard.docid_base + r`` (rows keep
    file order, which is global key order by precondition). Uses only
    file metadata — no data pass.
    """
    shards: list[Shard] = []
    base = first_docid
    sid = 0
    for f in sorted(files):
        n = pq.ParquetFile(f).metadata.num_rows
        n_shards = max(1, -(-n // target_rows_per_shard))
        per = -(-n // n_shards)
        start = 0
        while start < n:
            count = min(per, n - start)
            shards.append(Shard(sid, f, start, count, base))
            base += count
            sid += 1
            start += count
    return shards


def read_shard(shard: Shard, columns: list[str] | None = None):
    """Read one shard's rows (pyarrow Table): reads the overlapping row
    groups only, then slices to the exact row range."""
    pf = pq.ParquetFile(shard.file)
    meta = pf.metadata
    cum = 0
    groups = []
    first_grp_start = 0
    for i in range(meta.num_row_groups):
        g = meta.row_group(i).num_rows
        if cum + g > shard.row_start and cum < shard.row_start + shard.num_rows:
            if not groups:
                first_grp_start = cum
            groups.append(i)
        cum += g
    tbl = pf.read_row_groups(groups, columns=columns)
    return tbl.slice(shard.row_start - first_grp_start, shard.num_rows)


def compute_rank_mapping(files: list[str], key_columns: list[str], n_ranges: int = 64):
    """General-input global rank: returns a pyarrow table
    ``(key..., docid)`` sorted by key. Intended for moderate key
    cardinality (the mapping must be joinable); at extreme scale prefer
    pre-sorted inputs + :func:`sorted_file_shards`.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    tables = [pq.read_table(f, columns=key_columns) for f in sorted(files)]
    keys = pa.concat_tables(tables)
    order = pc.sort_indices(keys, sort_keys=[(c, "ascending") for c in key_columns])
    ranked = keys.take(order)
    return ranked.append_column("docid", pa.array(np.arange(1, len(ranked) + 1, dtype=np.uint64)))
