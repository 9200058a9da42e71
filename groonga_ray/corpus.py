"""Deterministic synthetic corpora (FIXTURES.md F1/F2/F3, seed=42).

The primary fixture is ``code_corpus``: Parquet files with the
BASELINE.json input_hint schema ``(repo, path, commit, lang, content)``
plus a ``content_sha256`` column for the per-row invariant. Files are
written globally sorted by (repo, path) so docid assignment can use the
metadata-only sorted-files path (docids.py); keys are unique by
construction.

Skew knobs: language keywords (``def return if ...``) appear in the
vast majority of rows (hot terms, df ~ N) while a tail of unique
identifiers appears exactly once (df=1 — the reference's
inline-single-posting path, lib/ii.c:7701-7740).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42

KEYWORDS = "def return if for while class import static void int else elif try except self".split()
DIRS = "core util io net index store query parser codec build".split()
NAMES = "reader writer buffer cursor token table column merge scan heap".split()
EXTS = ["py", "c", "h", "rs", "go", "js", "md"]
EXT_LANG = {"py": "python", "c": "c", "h": "c", "rs": "rust", "go": "go", "js": "javascript", "md": "markdown"}

# identifier vocabulary (Zipf-ranked)
_V = [
    f"{a}_{b}" for a in "get set make parse read write open close push pop".split()
    for b in "value index buffer token record chunk block offset length state".split()
]
_CAMEL = [f"{a.capitalize()}{b.capitalize()}" for a in "token index query".split() for b in "Stream Builder Cursor".split()]
VOCAB = KEYWORDS + _V + _CAMEL
NON_ASCII_SAMPLES = ["café", "naïve", "Ｗｉｄｅ", "überschrift"]


def generate_code_corpus(
    out_dir: str,
    n_rows: int = 10_000,
    n_files: int = 8,
    min_tokens: int = 50,
    max_tokens: int = 2000,
    seed: int = SEED,
    row_offset: int = 0,
    file_prefix: str = "corpus",
) -> list[str]:
    """Write the corpus as ``n_files`` Parquet files sorted by (repo, path).

    Deterministic in (n_rows, n_files, seed, row_offset). ``row_offset``
    shifts the global row ids that repo/path/unique-identifier naming
    derive from, so multi-chunk corpora (:func:`large_corpus_cache_dir`)
    get globally unique keys. Returns the file paths.
    """
    rng = np.random.default_rng(seed)
    i = np.arange(row_offset, row_offset + n_rows)
    repo = np.array([f"org{a % 7}/proj{a % 23}" for a in i])
    path = np.array(
        [
            f"src/{DIRS[a % len(DIRS)]}/{NAMES[(a // 7) % len(NAMES)]}_{a:06x}.{EXTS[a % len(EXTS)]}"
            for a in i
        ]
    )
    commit = np.array([hashlib.sha1(f"{r}/{p}".encode()).hexdigest() for r, p in zip(repo, path)])
    lang = np.array([EXT_LANG[p.rsplit(".", 1)[1]] for p in path])

    # Zipf-weighted token stream over VOCAB + per-row unique identifiers
    # (flat token array -> ListArray -> vectorized join, no Python loop)
    probs = 1.0 / np.arange(1, len(VOCAB) + 1)
    probs /= probs.sum()
    lens = rng.integers(min_tokens, max_tokens + 1, size=n_rows)
    total = int(lens.sum())
    tok_idx = rng.choice(len(VOCAB), size=total, p=probs)
    tokens = np.array(VOCAB, dtype=object)[tok_idx]
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    rows = np.arange(n_rows)
    # unique tail identifier once per row (df=1 terms; named by the
    # GLOBAL row id so multi-chunk corpora never repeat one)
    tokens[offsets[:-1] + lens // 2] = np.array(
        [f"uniq_{r:08d}_{seed}" for r in i], dtype=object
    )
    # occasional non-ASCII (NFKC exercise) + symbol runs
    na = rows[i % 251 == 0]
    tokens[offsets[na]] = np.array(NON_ASCII_SAMPLES, dtype=object)[
        i[na] % len(NON_ASCII_SAMPLES)
    ]
    sym = rows[i % 17 == 0]
    tokens[offsets[sym] + 1] = "x->y(*z)"
    tok_arr = pa.array(tokens, pa.large_string())
    if isinstance(tok_arr, pa.ChunkedArray):
        tok_arr = tok_arr.combine_chunks()
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), tok_arr)
    content_arr = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
    contents = content_arr.to_pylist()

    sha = np.array([hashlib.sha256(c.encode()).hexdigest() for c in contents])
    table = pa.table(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": content_arr,  # large_string: >2GB total content
            "content_sha256": sha,
        }
    )
    order = pc.sort_indices(table, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    table = table.take(order)

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_rows + n_files - 1) // n_files
    for f in range(n_files):
        part = table.slice(f * per, per)
        if part.num_rows == 0:
            break
        p = os.path.join(out_dir, f"{file_prefix}-{f:04d}.parquet")
        pq.write_table(part, p, row_group_size=max(1024, per // 4))
        paths.append(p)
    return paths


def corpus_cache_dir(n_rows: int, seed: int = SEED, root: str = "/tmp/groonga_ray_cache") -> str:
    """Deterministic on-disk location; generate on first use."""
    d = os.path.join(root, f"code_corpus_n{n_rows}_s{seed}")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        generate_code_corpus(d, n_rows=n_rows, seed=seed)
        with open(marker, "w") as fh:
            fh.write("ok")
    return d


def large_corpus_cache_dir(
    n_rows: int,
    chunk_rows: int = 1_000_000,
    seed: int = SEED,
    root: str = "/tmp/groonga_ray_cache",
) -> str:
    """Multi-million-row corpus generated in bounded-memory chunks.

    One chunk = one :func:`generate_code_corpus` call with a distinct
    seed and ``row_offset`` (globally unique repo/path keys and
    df=1 identifiers). Chunks are each internally key-sorted but NOT
    globally sorted against each other — exactly the shape real
    multi-source ingests have — so a build over this corpus goes
    through :func:`groonga_ray.docids.sort_input_files` (the
    distributed range-partitioned sort) for docid assignment. Chunk
    markers make generation resumable."""
    d = os.path.join(root, f"code_corpus_large_n{n_rows}_c{chunk_rows}_s{seed}")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        n_chunks = -(-n_rows // chunk_rows)
        for c in range(n_chunks):
            cm = os.path.join(d, f"_chunk_{c:03d}_done")
            if os.path.exists(cm):
                continue
            rows_c = min(chunk_rows, n_rows - c * chunk_rows)
            generate_code_corpus(
                d,
                n_rows=rows_c,
                n_files=max(8, rows_c // 125_000),
                seed=seed + 1000 * c,
                row_offset=c * chunk_rows,
                file_prefix=f"chunk{c:03d}",
            )
            with open(cm, "w") as fh:
                fh.write("ok")
        with open(marker, "w") as fh:
            fh.write("ok")
    return d
