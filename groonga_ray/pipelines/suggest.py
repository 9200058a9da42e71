"""Suggest family — completion / correction / suggestion over a learned
query-log dataset.

Reference: plugins/suggest/suggest.c (query side complete/correct/
suggest 299-525, cooccurrence_search 138-225, learner 630-1003) and the
dataset DDL src/suggest/groonga_suggest_ddl.txt.

Data model (DDL §2-3):

* ``events(seq, time_us, item, is_submit)`` — the append-only work
  tables (``event_<dataset>`` + ``sequence_<dataset>``).
* ``items(key, freq, freq2, last_us, boost)`` — learned fact table:
  ``freq`` = times the string was typed, ``freq2`` = times submitted,
  ``boost`` = exposure control (−1 hides).
* ``pairs(pre, post, freq0, freq1, freq2)`` — learned co-occurrence:
  freq0 feeds ``complete``, freq1 ``correct``, freq2 ``suggest``.
  The reference keys pairs by ``(pre_id<<32)|post_id``
  (suggest.c:800-808); string ``(pre, post)`` is the same identity.

Learner semantics (suggest.c:959-990 ``learner_learn``), replayed
exactly per event in sequence-append order:

* every valid event: ``items.freq += w``; ``items.last = time``.
* submit events additionally (``post_type_id != 0``):
  ``items.freq2 += w``; then

  - *complete/correct learning* (suggest.c:848-897): walk this
    sequence's prior events newest→oldest; break once
    ``post_time - pre_time >= MIN_LEARN_DISTANCE`` (60 s,
    suggest.c:38); a prior **submit** gets ``pairs.freq1 += w`` and
    stops the walk; each prior non-submit on the way gets
    ``pairs.freq0 += w``.
  - *suggest learning* (suggest.c:899-955): tokenize the submitted key
    with the items table's tokenizer (TokenDelimit analogue:
    whitespace split), stopping at a token equal to the key itself
    (the ``tid != post_item_id`` loop condition), and give each
    **distinct** token ``t`` a ``pairs(t → key).freq2 += w``; every
    walked token is interned into items (``GRN_TOKEN_ADD``) with zero
    frequencies.

Ray shape: the learner is a per-sequence replay —
``groupby(seq).map_groups`` over event rows (sequences are user
sessions, naturally bounded in length) emitting increment rows, then a
global ``groupby(pre, post).sum``; item counters are fully vectorized
column aggregations. At 100 TB the all-to-all cost is one hash shuffle
on ``seq`` plus sum-combinable groupbys on item / pair keys — no stage
materializes the corpus, and the learned tables are vocabulary-sized.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: MIN_LEARN_DISTANCE (suggest.c:38): a gap of 60 s of inactivity ends
#: the walk back through the sequence.
MIN_LEARN_DISTANCE_US = 60 * 1_000_000

DEFAULT_LIMIT = 10  # suggest.c:226
DEFAULT_SORTBY = "-_score"  # suggest.c:227
DEFAULT_OUTPUT_COLUMNS = ("_key", "_score")  # suggest.c:228
DEFAULT_FREQUENCY_THRESHOLD = 100  # suggest.c:229
DEFAULT_CONDITIONAL_PROBABILITY_THRESHOLD = 0.2  # suggest.c:230


# --------------------------------------------------------------- query log
#
# The sandbox has no real query log, so the suggest pipelines run over a
# deterministic synthetic log derived from the ``documents`` table (the
# same formula is restated in SQL for the DuckDB oracle gates):
#
#   per document with whitespace tokens t1 t2 t3 ...:
#     seq      = doc_id % 29
#     e1: ord=1 time=base          item="t1"        input (type=0)
#     e2: ord=2 time=base+10s      item="t1 t2"     submit
#     e3: ord=3 time=base+10s+Δ    item="t1 t2 t3"  submit,
#         Δ = 70 s when doc_id % 5 == 0 (exercises the 60 s break),
#             20 s otherwise
#     base = doc_id * 1000 s  (sequences never chain across documents)


def query_log_dataset(sf_dir: str):
    """The synthetic query log as a Ray Dataset of event rows
    ``(seq, doc_id, ord, time_us, item, is_submit)``."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(_log_batch, batch_format="pyarrow")


def _log_batch(batch: pa.Table) -> pa.Table:
    doc = batch.column("doc_id").to_numpy().astype(np.int64)
    toks = pc.split_pattern(batch.column("text"), " ")
    t1 = pc.list_element(toks, 0)
    i2 = pc.binary_join_element_wise(t1, pc.list_element(toks, 1), " ")
    i3 = pc.binary_join_element_wise(i2, pc.list_element(toks, 2), " ")
    seq = doc % 29
    base = doc * 1_000_000_000
    off3 = 10_000_000 + np.where(doc % 5 == 0, 70_000_000, 20_000_000)
    n = len(doc)
    return pa.table(
        {
            "seq": pa.array(np.concatenate([seq, seq, seq])),
            "doc_id": pa.array(np.concatenate([doc, doc, doc])),
            "ord": pa.array(
                np.concatenate(
                    [np.full(n, 1, np.int64), np.full(n, 2, np.int64), np.full(n, 3, np.int64)]
                )
            ),
            "time_us": pa.array(np.concatenate([base, base + 10_000_000, base + off3])),
            "item": pa.concat_arrays(
                [t1.combine_chunks(), i2.combine_chunks(), i3.combine_chunks()]
            ),
            "is_submit": pa.array(
                np.concatenate(
                    [np.zeros(n, np.int64), np.ones(n, np.int64), np.ones(n, np.int64)]
                )
            ),
        }
    )


# ----------------------------------------------------------------- learner


def _split_tokens_with_stop(item: str) -> list[str]:
    """Distinct tokens of a submitted key in first-seen order, honoring
    the reference's stop rule: the token walk ends at a token equal to
    the key itself (suggest.c:911 ``tid != post_item_id``)."""
    seen: set[str] = set()
    out: list[str] = []
    for t in item.split(" "):
        if t == item:
            break
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def _item_increments(batch: pa.Table) -> pa.Table:
    """Per-event item counter increments + token interning rows."""
    item = batch.column("item")
    sub = batch.column("is_submit").to_numpy()
    time_us = batch.column("time_us").to_numpy()
    keys = [item]
    freq = [np.ones(batch.num_rows, np.int64)]
    freq2 = [sub.astype(np.int64)]
    last = [time_us.astype(np.int64)]
    # GRN_TOKEN_ADD interning (suggest.c:906): tokens of submitted keys
    # become items with zero counters.
    sub_items = item.filter(pa.array(sub != 0))
    toks = pc.split_pattern(sub_items, " ")
    flat = pc.list_flatten(toks).combine_chunks()
    # stop rule: a token equal to its own key ends that key's walk. Our
    # synthetic log never hits it (multi-word keys vs single-word
    # tokens), but honor it for arbitrary logs:
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    parent = np.repeat(np.arange(len(lens)), lens)
    eq = pc.equal(flat, sub_items.combine_chunks().take(pa.array(parent))).to_numpy(
        zero_copy_only=False
    )
    if eq.any():
        keep = np.ones(len(parent), bool)
        for p in np.unique(parent[eq]):
            rows = np.flatnonzero(parent == p)
            stop = rows[eq[rows]].min()
            keep[rows[rows >= stop]] = False
        flat = flat.filter(pa.array(keep))
    if len(flat):
        keys.append(flat)
        z = np.zeros(len(flat), np.int64)
        freq.append(z)
        freq2.append(z)
        last.append(np.full(len(flat), -1, np.int64))  # no event time
    return pa.table(
        {
            "key": pa.concat_arrays([k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in keys]),
            "freq": pa.array(np.concatenate(freq)),
            "freq2": pa.array(np.concatenate(freq2)),
            "last_us": pa.array(np.concatenate(last)),
        }
    )


def _replay_sequence(group: "pa.Table") -> pa.Table:
    """Replay one sequence's events in append order, emitting pair
    increments (suggest.c:848-955). Vectorized: the walk back from each
    submit covers the indices inside its 60 s window (searchsorted,
    valid because session timestamps are appended nondecreasing),
    cut at the first prior submit — which pairs with kind 1. Token
    pairs (kind 2) come from one batched split. A non-monotone log
    falls back to the literal per-event walk."""
    g = group if isinstance(group, pa.Table) else pa.Table.from_pandas(group)
    order = pc.sort_indices(
        g.select(["doc_id", "ord"]),
        sort_keys=[("doc_id", "ascending"), ("ord", "ascending")],
    )
    g = g.take(order)
    times = g.column("time_us").to_numpy(zero_copy_only=False).astype(np.int64)
    items_arr = g.column("item").combine_chunks()
    sub = g.column("is_submit").to_numpy(zero_copy_only=False).astype(bool)
    subs = np.flatnonzero(sub)
    pre_idx: list[np.ndarray] = []
    post_idx: list[np.ndarray] = []
    kind_parts: list[np.ndarray] = []
    if len(subs):
        if np.all(np.diff(times) >= 0):
            # window start: first j with times[i]-times[j] < 60 s
            lo = np.searchsorted(
                times, times[subs] - MIN_LEARN_DISTANCE_US, side="right"
            )
            # last submit strictly before i (or -1)
            last_sub = np.full(len(times), -1, np.int64)
            last_sub[subs] = subs
            last_sub = np.maximum.accumulate(last_sub)
            psub = np.where(subs > 0, last_sub[np.maximum(subs - 1, 0)], -1)
            start = np.where(psub >= lo, psub, lo)
            counts = subs - start  # pairs per submit (j in [start, i))
            if counts.sum() > 0:
                rep_i = np.repeat(subs, counts)
                # j runs start..i-1 for each i
                base = np.repeat(start, counts)
                offs = np.arange(counts.sum()) - np.repeat(
                    np.cumsum(counts) - counts, counts
                )
                js = base + offs
                pre_idx.append(js)
                post_idx.append(rep_i)
                kind_parts.append(np.where(sub[js], 1, 0).astype(np.int64))
        else:  # rare: out-of-order session log — literal walk
            for i in subs:
                j = i - 1
                while j >= 0 and times[i] - times[j] < MIN_LEARN_DISTANCE_US:
                    pre_idx.append(np.array([j]))
                    post_idx.append(np.array([i]))
                    kind_parts.append(np.array([1 if sub[j] else 0]))
                    if sub[j]:
                        break
                    j -= 1
    if pre_idx:
        js = np.concatenate(pre_idx)
        is_ = np.concatenate(post_idx)
        kinds = np.concatenate(kind_parts)
        pre_vals = items_arr.take(pa.array(js))
        post_vals = items_arr.take(pa.array(is_))
    else:
        kinds = np.zeros(0, np.int64)
        pre_vals = pa.array([], pa.string())
        post_vals = pa.array([], pa.string())
    # kind-2 token pairs: batched split of the submitted keys
    tok_pre: list[str] = []
    tok_post: list[str] = []
    for i in subs:
        it = items_arr[int(i)].as_py()
        for t in _split_tokens_with_stop(it):
            tok_pre.append(t)
            tok_post.append(it)
    k = np.concatenate([kinds, np.full(len(tok_pre), 2, np.int64)])
    pre_all = pa.concat_arrays(
        [pc.cast(pre_vals, pa.string()), pa.array(tok_pre, pa.string())]
    )
    post_all = pa.concat_arrays(
        [pc.cast(post_vals, pa.string()), pa.array(tok_post, pa.string())]
    )
    return pa.table(
        {
            "pre": pre_all,
            "post": post_all,
            "freq0": pa.array((k == 0).astype(np.int64)),
            "freq1": pa.array((k == 1).astype(np.int64)),
            "freq2": pa.array((k == 2).astype(np.int64)),
        }
    )


def learn(events, weight: int = 1):
    """Aggregate a query-log Dataset into (items_ds, pairs_ds).

    ``weight`` is the per-dataset configuration weight
    (suggest.c:714-741 learner_init_weight, default 1)."""
    from ray.data.aggregate import Max, Sum

    items = (
        events.map_batches(_item_increments, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Sum("freq", alias_name="freq"),
            Sum("freq2", alias_name="freq2"),
            Max("last_us", alias_name="last_us"),
        )
    )
    if weight != 1:
        w = weight

        def scale(b: pa.Table) -> pa.Table:
            return b.set_column(
                b.schema.get_field_index("freq"), "freq", pc.multiply(b.column("freq"), w)
            ).set_column(
                b.schema.get_field_index("freq2"), "freq2", pc.multiply(b.column("freq2"), w)
            )

        items = items.map_batches(scale, batch_format="pyarrow")
    pairs = (
        events.groupby("seq")
        .map_groups(_replay_sequence, batch_format="pyarrow")
        .groupby(["pre", "post"])
        .aggregate(
            Sum("freq0", alias_name="freq0"),
            Sum("freq1", alias_name="freq1"),
            Sum("freq2", alias_name="freq2"),
        )
    )
    if weight != 1:

        def scale_pairs(b: pa.Table) -> pa.Table:
            for c in ("freq0", "freq1", "freq2"):
                b = b.set_column(
                    b.schema.get_field_index(c), c, pc.multiply(b.column(c), weight)
                )
            return b

        pairs = pairs.map_batches(scale_pairs, batch_format="pyarrow")
    return items, pairs


def build_suggest_dataset(sf_dir: str, out_dir: str, weight: int = 1) -> None:
    """Learn from the synthetic query log and persist the learned
    tables (items.parquet / pairs.parquet) under ``out_dir`` — the
    analogue of groonga-suggest-learner materializing the dataset
    (src/suggest/groonga_suggest_learner.c)."""
    learn_to_dir(query_log_dataset(sf_dir), out_dir, weight=weight)


def learn_to_dir(events, out_dir: str, weight: int = 1) -> None:
    """Run :func:`learn` over an event Dataset and persist the learned
    tables key-sorted under ``out_dir``."""
    items, pairs = learn(events, weight=weight)
    os.makedirs(out_dir, exist_ok=True)
    it = _concat_sorted(
        items,
        "key",
        empty_schema=pa.schema(
            [
                ("key", pa.string()),
                ("freq", pa.int64()),
                ("freq2", pa.int64()),
                ("last_us", pa.int64()),
            ]
        ),
    )
    # ``last_us`` uses -1 as "never evented" (token-only items); map to
    # null for the stored table (grn time 0 analogue).
    last = it.column("last_us")
    it = it.set_column(
        it.schema.get_field_index("last_us"),
        "last_us",
        pc.if_else(pc.equal(last, -1), pa.nulls(len(last), pa.int64()), last),
    )
    pq.write_table(it, os.path.join(out_dir, "items.parquet"))
    pairs_schema = pa.schema(
        [
            ("pre", pa.string()),
            ("post", pa.string()),
            ("freq0", pa.int64()),
            ("freq1", pa.int64()),
            ("freq2", pa.int64()),
        ]
    )
    pq.write_table(
        _concat_sorted(pairs, "pre", "post", empty_schema=pairs_schema),
        os.path.join(out_dir, "pairs.parquet"),
    )


def _concat_sorted(ds, *keys: str, empty_schema: pa.Schema | None = None) -> pa.Table:
    tables = [t for t in ray_to_tables(ds) if t.num_rows]
    if not tables:
        # an empty groupby result carries no schema
        return pa.table({f.name: pa.array([], f.type) for f in (empty_schema or pa.schema([]))})
    t = pa.concat_tables(tables)
    return t.sort_by([(k, "ascending") for k in keys])


def ray_to_tables(ds) -> list[pa.Table]:
    import ray

    return [ray.get(ref) for ref in ds.to_arrow_refs()]


# -------------------------------------------------------------- query side


@dataclass
class _Items:
    keys: pa.Array
    freq: np.ndarray
    freq2: np.ndarray
    boost: np.ndarray
    index: dict  # key -> row


class SuggestDataset:
    """Query-time handle over the learned tables — the analogue of the
    ``suggest`` command family (suggest.c:548-627 command_suggest).

    The learned tables are vocabulary-sized (not corpus-sized), so a
    per-actor in-memory load mirrors the reference's mmap'd pat/hash
    tables; the heavy distributed work happened in :func:`learn`."""

    def __init__(self, dataset_dir: str):
        it = pq.read_table(os.path.join(dataset_dir, "items.parquet"))
        pr = pq.read_table(os.path.join(dataset_dir, "pairs.parquet"))
        self._init_from_tables(it, pr)

    @classmethod
    def from_tables(cls, items: pa.Table, pairs: pa.Table) -> "SuggestDataset":
        """In-memory construction (the HTTP suggest command's learned
        state; items may carry a ``kana`` list column of readings that
        enables the RK completion pass)."""
        sd = cls.__new__(cls)
        sd._init_from_tables(items, pairs)
        return sd

    def _init_from_tables(self, it: pa.Table, pr: pa.Table) -> None:
        keys = it.column("key").combine_chunks()
        freq = it.column("freq").to_numpy().astype(np.int64)
        freq2 = it.column("freq2").to_numpy().astype(np.int64)
        boost = (
            it.column("boost").to_numpy().astype(np.int64)
            if "boost" in it.column_names
            else np.zeros(len(it), np.int64)
        )
        index = {k: i for i, k in enumerate(keys.to_pylist())}
        self.items = _Items(keys, freq, freq2, boost, index)
        self._kana: list[list[str]] | None = (
            it.column("kana").to_pylist() if "kana" in it.column_names else None
        )
        # items whose record add went through the indexed path (loaded
        # or typed as an event item). Token-interned-only items never
        # reach the _key bigram index in the reference (the token
        # cursor's low-level add skips index hooks), so the similar
        # search cannot surface them.
        self._indexed: np.ndarray | None = (
            it.column("indexed").to_numpy(zero_copy_only=False).astype(bool)
            if "indexed" in it.column_names
            else None
        )
        self._pairs = pr
        self._pre = pr.column("pre").combine_chunks()
        self._post = pr.column("post").to_pylist()
        self._pfreq = {
            0: pr.column("freq0").to_numpy().astype(np.int64),
            1: pr.column("freq1").to_numpy().astype(np.int64),
            2: pr.column("freq2").to_numpy().astype(np.int64),
        }

    # -- cooccurrence_search (suggest.c:138-225) ------------------------
    def _cooccurrence(
        self,
        res: dict,
        query: str,
        kind: int,
        frequency_threshold: int,
        conditional_probability_threshold: float,
    ) -> float:
        max_score = 0.0
        if query not in self.items.index:
            return max_score  # tid == GRN_ID_NIL
        rows = np.flatnonzero(
            pc.equal(self._pre, query).to_numpy(zero_copy_only=False)
        )
        pfreq_col = self._pfreq[kind]
        it = self.items
        for r in rows:
            pfreq = int(pfreq_col[r])
            post = self._post[r]
            pi = it.index.get(post)
            if pi is None:
                continue
            ifreq = int(it.freq[pi])
            ifreq2 = int(it.freq2[pi])
            boost = int(it.boost[pi])
            cp = (pfreq / ifreq2) if ifreq2 > 0 else 0.0
            if (
                pfreq >= frequency_threshold
                and ifreq >= frequency_threshold
                and cp >= conditional_probability_threshold
                and boost >= 0
            ):
                score = float(pfreq)
                if max_score < score + boost:
                    max_score = score + boost
                if post in res:
                    res[post] += score
                else:
                    res[post] = score + boost  # boost added once (suggest.c:212)
        return max_score

    # -- RK reading search (suggest.c:315-346: GRN_CURSOR_PREFIX|RK
    # over the kana lexicon, postings -> complete_add_item) ------------
    def _rk_pass(self, res: dict, query: str, frequency_threshold: int) -> None:
        from ..rk import rk_prefix_match

        for i, readings in enumerate(self._kana or []):
            if not readings:
                continue
            if not any(rk_prefix_match(query, r) for r in readings):
                continue
            boost = int(self.items.boost[i])
            if boost < 0:
                continue
            score = 1.0 + self.items.freq[i] + boost
            if score >= frequency_threshold:
                k = self.items.keys[i].as_py()
                res[k] = res.get(k, 0.0) + score

    # -- complete_add_item (suggest.c:273-297) --------------------------
    def _prefix_pass(self, res: dict, query: str, frequency_threshold: int) -> None:
        mask = pc.starts_with(self.items.keys, query).to_numpy(zero_copy_only=False)
        for i in np.flatnonzero(mask):
            boost = int(self.items.boost[i])
            if boost < 0:
                continue
            score = 1.0 + self.items.freq[i] + boost
            if score >= frequency_threshold:
                k = self.items.keys[i].as_py()
                res[k] = res.get(k, 0.0) + score

    def complete(
        self,
        query: str,
        *,
        sortby: str = DEFAULT_SORTBY,
        output_columns=DEFAULT_OUTPUT_COLUMNS,
        offset: int = 0,
        limit: int = DEFAULT_LIMIT,
        frequency_threshold: int = DEFAULT_FREQUENCY_THRESHOLD,
        conditional_probability_threshold: float = DEFAULT_CONDITIONAL_PROBABILITY_THRESHOLD,
        prefix_search: str = "auto",
    ) -> pa.Table:
        """suggest.c:299-371. The reference first prefix-searches the
        ``kana`` reading column's index (RK search); this corpus has no
        readings, so kana ≡ key and that pass is the plain key-prefix
        scan. The explicit fallback prefix pass then runs only when
        ``prefix_search`` is yes / auto-with-empty-result, exactly as
        upstream (suggest.c:348-361) — with kana ≡ key a ``yes`` re-adds
        the same scores, which is the reference behavior too."""
        res: dict[str, float] = {}
        if query:
            if self._kana is not None:
                # real readings: the RK pass over the kana lexicon
                self._rk_pass(res, query, frequency_threshold)
            else:
                # kana ≡ key corpus: the RK pass degenerates to the
                # plain key-prefix scan
                self._prefix_pass(res, query, frequency_threshold)
            self._cooccurrence(
                res, query, 0, frequency_threshold, conditional_probability_threshold
            )
            if prefix_search == "yes" or (prefix_search == "auto" and not res):
                self._prefix_pass(res, query, frequency_threshold)
        return self._output(res, sortby, output_columns, offset, limit)

    def correct(
        self,
        query: str,
        *,
        sortby: str = DEFAULT_SORTBY,
        output_columns=DEFAULT_OUTPUT_COLUMNS,
        offset: int = 0,
        limit: int = DEFAULT_LIMIT,
        frequency_threshold: int = DEFAULT_FREQUENCY_THRESHOLD,
        conditional_probability_threshold: float = DEFAULT_CONDITIONAL_PROBABILITY_THRESHOLD,
        similar_search: str = "auto",
    ) -> pa.Table:
        """suggest.c:373-507: freq1 cooccurrence, then — when forced or
        the cooccurrence score stayed under the threshold — a SIMILAR
        search over item keys rescored by ``1 + (freq2>>4) + boost`` and
        penalized by edit distance to the query."""
        res: dict[str, float] = {}
        max_score = self._cooccurrence(
            res, query, 1, frequency_threshold, conditional_probability_threshold
        )
        if query and (
            similar_search == "yes"
            or (similar_search == "auto" and max_score < frequency_threshold)
        ):
            self._similar_rescore(res, query, frequency_threshold)
        return self._output(res, sortby, output_columns, offset, limit)

    def _similar_rescore(self, res: dict, query: str, frequency_threshold: int) -> None:
        """The similar-search branch (suggest.c:391-505): OR in items
        sharing rare query tokens (grn_ii_select SIMILAR with
        similarity_threshold=0, max_size=2 — token weight c + 2/df̂,
        keep top (n>>3)+1 per lib/ii.c:5836-5960), then for EVERY
        result: score += 1 + (freq2>>4) + boost, drop when that
        increment is under the threshold or boost < 0, and finally
        score -= edit_distance(key, query), dropping scores under the
        threshold."""
        toks = query.split(" ")
        counts: dict[str, int] = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        # df per token over item keys
        weighted = []
        for t, c in counts.items():
            m = pc.match_substring(self.items.keys, t).to_numpy(zero_copy_only=False)
            if self._indexed is not None:
                m &= self._indexed
            df = int(m.sum())
            if df == 0:
                continue
            weighted.append((c + 2 // df, t, m))
        if not weighted:
            pass
        else:
            weighted.sort(key=lambda x: -x[0])
            keep = weighted[: (len(weighted) >> 3) + 1]
            for _, _t, m in keep:
                for i in np.flatnonzero(m):
                    k = self.items.keys[i].as_py()
                    res[k] = res.get(k, 0.0) + 1.0
        # rescore + filter every result entry (suggest.c:436-466)
        for k in list(res.keys()):
            pi = self.items.index.get(k)
            boost = int(self.items.boost[pi]) if pi is not None else 0
            f2 = int(self.items.freq2[pi]) if pi is not None else 0
            if boost >= 0:
                s2 = 1.0 + (f2 >> 4) + boost
                res[k] += s2
                if s2 >= frequency_threshold:
                    continue
            del res[k]
        # edit-distance penalty (suggest.c:467-505)
        if res:
            from ..script import edit_distance_batch

            keys = list(res.keys())
            dists = edit_distance_batch(
                pa.array(keys, pa.string()), pa.array([query] * len(keys), pa.string())
            )
            for k, d in zip(keys, dists):
                res[k] -= int(d)
                if res[k] < frequency_threshold:
                    del res[k]

    def suggest(
        self,
        query: str,
        *,
        sortby: str = DEFAULT_SORTBY,
        output_columns=DEFAULT_OUTPUT_COLUMNS,
        offset: int = 0,
        limit: int = DEFAULT_LIMIT,
        frequency_threshold: int = DEFAULT_FREQUENCY_THRESHOLD,
        conditional_probability_threshold: float = DEFAULT_CONDITIONAL_PROBABILITY_THRESHOLD,
    ) -> pa.Table:
        """suggest.c:509-525: pure freq2 cooccurrence."""
        res: dict[str, float] = {}
        self._cooccurrence(
            res, query, 2, frequency_threshold, conditional_probability_threshold
        )
        return self._output(res, sortby, output_columns, offset, limit)

    # -- output (suggest.c:232-271): sort, slice, project ---------------
    def _output(self, res: dict, sortby: str, output_columns, offset: int, limit: int) -> pa.Table:
        keys = list(res.keys())
        scores = np.array([res[k] for k in keys], np.float64)
        # multi-key sort via integer ranks + lexsort (stable, supports
        # descending string keys) — grn_table_sort_key_from_str syntax
        rank_keys = []
        for spec in [s.strip() for s in (sortby or DEFAULT_SORTBY).split(",") if s.strip()]:
            desc = spec.startswith("-")
            name = spec.lstrip("+-")
            if name == "_score":
                col = scores
            elif name == "_key":
                col = np.array(keys, dtype=object)
            else:
                it = self.items
                col = np.array(
                    [getattr(it, name)[it.index[k]] if k in it.index else 0 for k in keys]
                )
            _, inv = np.unique(col, return_inverse=True)
            rank_keys.append(-inv if desc else inv)
        order = (
            np.lexsort(rank_keys[::-1]) if rank_keys else np.arange(len(keys))
        )
        if limit < 0:
            limit = len(order)
        order = order[offset : offset + limit]
        cols: dict[str, pa.Array] = {}
        for name in output_columns:
            if name == "_key":
                cols["_key"] = pa.array([keys[i] for i in order], pa.string())
            elif name == "_score":
                # Int32 _score in the v1 envelope (lib/output.c:569)
                cols["_score"] = pa.array(
                    [int(scores[i]) for i in order], pa.int32()
                )
            else:
                it = self.items
                cols[name] = pa.array(
                    [
                        int(getattr(it, name)[it.index[keys[i]]]) if keys[i] in it.index else 0
                        for i in order
                    ],
                    pa.int64(),
                )
        return pa.table(cols)


def run_suggest(
    dataset_dir: str,
    types: str,
    query: str,
    **kwargs,
) -> dict[str, pa.Table]:
    """command_suggest analogue (suggest.c:548-627): ``types`` is a
    ``|``-joined subset of complete/correct/suggest; the result is one
    result set per requested type."""
    sd = SuggestDataset(dataset_dir)
    out: dict[str, pa.Table] = {}
    wanted = {t for t in types.split("|") if t}
    if "complete" in wanted:
        out["complete"] = sd.complete(
            query, **{k: v for k, v in kwargs.items() if k != "similar_search"}
        )
    if "correct" in wanted:
        out["correct"] = sd.correct(
            query, **{k: v for k, v in kwargs.items() if k != "prefix_search"}
        )
    if "suggest" in wanted:
        out["suggest"] = sd.suggest(
            query,
            **{
                k: v
                for k, v in kwargs.items()
                if k not in ("prefix_search", "similar_search")
            },
        )
    return out
