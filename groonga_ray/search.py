"""Match execution: term/phrase/prefix matches, boolean composition,
exhaustive scoring and block-max WAND top-k.

Semantics source (reimplemented, not ported):

* term & phrase match — grn_ii_select's conjunctive zipper
  (lib/ii.c:6319-6569): query tokens sorted by ascending df
  (token_compare, lib/ii.c:5532), docid intersection, consecutive
  position verification for phrases (token_info_skip_pos,
  lib/ii.c:5516-5530), ``noccur`` = occurrence count.
  The zipper is replaced by vectorized sorted-array set ops (same
  match set, same noccur) — per-posting pointer chasing would be a
  Python loop; numpy intersections are the Ray-idiomatic equivalent.
* prefix expansion — token_info_open EX_PREFIX (lib/ii.c:5415):
  lexicon range scan + cursor-heap union; here union_postings.
* boolean ops — grn_table_setoperation semantics (lib/db.c:3896):
  OR adds scores, AND intersects + accumulates, AND_NOT removes.
* match escalation — grn_ii_sel (lib/ii.c:6659-6721): when a match
  yields 0 hits, rerun with prefix expansion (our UNSPLIT/PARTIAL
  analogue for a word lexicon).
* top-k — sort by -score with docid-asc tiebreak (SURVEY.md §7 hard
  part 4: the reference's tie order is hash-insertion order; we pin
  docid asc as the deterministic tiebreak).
* block-max WAND — chunk-granular: per-term chunk directories carry
  (last_docid, max_tf); a docid window whose summed upper bounds can't
  beat the current k-th score is skipped without decoding. Exact
  results; the pruning is the scale path for 10^12-doc serving.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from . import codec, score as score_mod
from .codec import PostingList
from .index import IndexReader, SectionIndex


@dataclass
class MatchResult:
    """The Ray analogue of the reference's result-set hash
    (grn_rset_recinfo): parallel arrays docid -> score [, noccur]."""

    docids: np.ndarray                      # uint64 sorted
    scores: np.ndarray                      # float64
    nhits: int = 0

    def __post_init__(self):
        self.nhits = len(self.docids)

    @staticmethod
    def empty() -> "MatchResult":
        return MatchResult(np.empty(0, np.uint64), np.empty(0, np.float64))


def union_postings(pls: list[PostingList], with_positions: bool = False) -> PostingList:
    """Union several terms' postings (prefix expansion): docids merged,
    tf summed, positions merged sorted."""
    pls = [p for p in pls if len(p)]
    if not pls:
        return PostingList(np.empty(0, np.uint64), np.empty(0, np.uint64))
    if len(pls) == 1:
        return pls[0]
    docids = np.concatenate([p.docids for p in pls])
    tfs = np.concatenate([p.tfs for p in pls])
    if with_positions:
        # explode to (docid, pos) pairs, sort, regroup
        pair_doc = np.concatenate(
            [np.repeat(p.docids, p.tfs.astype(np.int64)) for p in pls]
        )
        pair_pos = np.concatenate([p.positions for p in pls])
        order = np.lexsort((pair_pos, pair_doc))
        pair_doc = pair_doc[order]
        pair_pos = pair_pos[order]
        starts = np.flatnonzero(np.concatenate([[True], pair_doc[1:] != pair_doc[:-1]]))
        u_docids = pair_doc[starts]
        u_tfs = np.diff(np.append(starts, len(pair_doc))).astype(np.uint64)
        pos_offsets = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(u_tfs.astype(np.int64), out=pos_offsets[1:])
        return PostingList(u_docids, u_tfs, pair_pos, pos_offsets)
    order = np.argsort(docids, kind="stable")
    docids = docids[order]
    tfs = tfs[order]
    starts = np.flatnonzero(np.concatenate([[True], docids[1:] != docids[:-1]]))
    u_docids = docids[starts]
    u_tfs = np.add.reduceat(tfs, starts)
    return PostingList(u_docids, u_tfs)


@dataclass
class TokenInfo:
    """One query token (possibly prefix-expanded to many tids) — the
    analogue of grn_ii's token_info (lib/ii.c:5540)."""

    postings: PostingList
    df: int                 # exact df of the union
    df_estimate: int        # reference-style estimate for tf_idf
    offset: int             # query position offset (phrase)
    term: str = ""


def build_token_infos(
    si: SectionIndex,
    tokens: list[tuple[str, int]],
    prefix_last: bool = False,
    with_positions: bool = False,
) -> list[TokenInfo] | None:
    """Look up each (term, query_pos); None when any token is absent
    (conjunctive match fails)."""
    infos: list[TokenInfo] = []
    for i, (term, qpos) in enumerate(tokens):
        expand_prefix = prefix_last and i == len(tokens) - 1
        if expand_prefix:
            rng = si.prefix_range(term)
            if len(rng) == 0:
                return None
            pls = [si.postings(t, with_positions=with_positions) for t in rng]
            pl = union_postings(pls, with_positions=with_positions)
            df_est = sum(si.df_estimate(t) for t in rng)
        else:
            tid = si.term_id(term)
            if tid is None:
                return None
            pl = si.postings(tid, with_positions=with_positions)
            df_est = si.df_estimate(tid)
        infos.append(TokenInfo(pl, len(pl.docids), df_est, qpos, term))
    return infos


def _phrase_noccur(infos: list[TokenInfo], cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Count consecutive-position phrase occurrences per candidate doc.

    Vectorized: explode each token's (docid in cand, pos - offset)
    pairs, sort, and count (doc, adjusted_pos) groups containing every
    token slot. Returns (docids, noccur) for docs with noccur > 0.
    """
    k = len(infos)
    pair_doc_all = []
    pair_pos_all = []
    pair_slot_all = []
    for slot, ti in enumerate(infos):
        pl = ti.postings
        mask = np.isin(pl.docids, cand)
        idx = np.flatnonzero(mask)
        if len(idx) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        tf = pl.tfs.astype(np.int64)
        sel_doc = np.repeat(pl.docids[idx], tf[idx])
        # vectorized range-gather of the selected postings' positions
        lens = tf[idx]
        starts = pl.pos_offsets[idx]
        out_off = np.zeros(len(idx) + 1, np.int64)
        np.cumsum(lens, out=out_off[1:])
        take = np.arange(int(out_off[-1]), dtype=np.int64)
        take -= np.repeat(out_off[:-1], lens)
        take += np.repeat(starts, lens)
        sel_pos = pl.positions[take].astype(np.int64) - (ti.offset - infos[0].offset)
        pair_doc_all.append(sel_doc)
        pair_pos_all.append(sel_pos)
        pair_slot_all.append(np.full(len(sel_doc), slot, np.int64))
    doc = np.concatenate(pair_doc_all)
    pos = np.concatenate(pair_pos_all)
    slot = np.concatenate(pair_slot_all)
    keep = pos >= 0
    doc, pos, slot = doc[keep], pos[keep], slot[keep]
    if len(doc) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    order = np.lexsort((slot, pos, doc))
    doc, pos, slot = doc[order], pos[order], slot[order]
    new_group = np.concatenate([[True], (doc[1:] != doc[:-1]) | (pos[1:] != pos[:-1])])
    gid = np.cumsum(new_group) - 1
    # a group matches when it has k distinct slots (slots unique per
    # group by construction: positions unique within a posting)
    slots_per_group = np.bincount(gid)
    full = slots_per_group == k
    g_start = np.flatnonzero(new_group)
    g_doc = doc[g_start]
    m_doc = g_doc[full]
    if len(m_doc) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    starts = np.flatnonzero(np.concatenate([[True], m_doc[1:] != m_doc[:-1]]))
    out_doc = m_doc[starts].astype(np.uint64)
    noccur = np.diff(np.append(starts, len(m_doc))).astype(np.int64)
    return out_doc, noccur


def term_match(
    si: SectionIndex,
    tokens: list[tuple[str, int]],
    scorer: str = "default",
    *,
    n_docs: int,
    avgdl: float = 1.0,
    doclens: np.ndarray | None = None,
    weight: float = 1.0,
    prefix_last: bool = False,
    escalate: bool = True,
    escalation_threshold: int = 0,
) -> MatchResult:
    """Execute one match op (one term, a phrase, or a prefix) and score.

    Equivalent of grn_ii_select for EXACT mode + the scorer plug.
    """
    need_pos = len(tokens) > 1
    infos = build_token_infos(si, tokens, prefix_last, with_positions=need_pos)
    result = MatchResult.empty()
    if infos is not None:
        if len(infos) == 1:
            pl = infos[0].postings
            docids = pl.docids
            noccur = pl.tfs.astype(np.int64)
        else:
            # conjunction: intersect docids (rarest first, like the
            # df-sorted zipper), then verify consecutive positions
            order = sorted(range(len(infos)), key=lambda i: infos[i].df)
            cand = infos[order[0]].postings.docids
            for i in order[1:]:
                cand = cand[np.isin(cand, infos[i].postings.docids)]
                if len(cand) == 0:
                    break
            if len(cand):
                docids, noccur = _phrase_noccur(infos, cand)
            else:
                docids = np.empty(0, np.uint64)
                noccur = np.empty(0, np.int64)
        if len(docids):
            result = MatchResult(docids, _apply_scorer(
                scorer, docids, noccur, infos, n_docs, avgdl, doclens, weight
            ))

    if (
        result.nhits <= escalation_threshold
        and escalate and not prefix_last and len(tokens) == 1
    ):
        # match escalation (grn_ii_sel lib/ii.c:6659: runs when nhits <=
        # match_escalation_threshold; negative threshold disables):
        # UNSPLIT ≈ prefix expansion, then PARTIAL ≈ suffix expansion
        esc = term_match(
            si, tokens, scorer, n_docs=n_docs, avgdl=avgdl, doclens=doclens,
            weight=weight, prefix_last=True, escalate=False,
        )
        # modes accumulate into the same result set (OR), so exact hits
        # below the threshold keep their scores and gain expansions
        result = op_or(result, esc) if result.nhits else esc
        if result.nhits <= escalation_threshold:
            tids = si.suffix_tids(tokens[0][0])
            if tids:
                pls = [si.postings(t) for t in tids]
                pl = union_postings(pls)
                if len(pl):
                    infos2 = [TokenInfo(pl, len(pl.docids), sum(si.df_estimate(t) for t in tids), 0, tokens[0][0])]
                    suf = MatchResult(
                        pl.docids,
                        _apply_scorer(scorer, pl.docids, pl.tfs.astype(np.int64),
                                      infos2, n_docs, avgdl, doclens, weight),
                    )
                    result = op_or(result, suf) if result.nhits else suf
    return result


CUSTOM_SCORERS: dict[str, "object"] = {}


def register_scorer(name: str, fn) -> None:
    """Plugin surface (grn_scorer_register, include/groonga/scorer.h:86):
    ``fn(tf, df, df_estimate, dl, n_docs, avgdl) -> scores`` receives
    the same matched-record quantities the reference hands scorers,
    vectorized over the match."""
    CUSTOM_SCORERS[name] = fn


def _apply_scorer(scorer, docids, noccur, infos, n_docs, avgdl, doclens, weight):
    if isinstance(scorer, str) and scorer.startswith("tf_at_most:"):
        # scorer_tf_at_most(max): score = min(tf, max)
        # (lib/scorers.c:54-88)
        mx = float(scorer.split(":", 1)[1])
        return np.minimum(noccur.astype(np.float64), mx) * weight
    if scorer in CUSTOM_SCORERS:
        dl = doclens[docids.astype(np.int64)] if doclens is not None else np.full(len(docids), avgdl)
        df = min(ti.df for ti in infos)
        df_est = sum(ti.df_estimate for ti in infos)
        return CUSTOM_SCORERS[scorer](
            noccur.astype(np.float64), df, df_est, dl, n_docs, avgdl
        ) * weight
    if scorer == "bm25":
        dl = doclens[docids.astype(np.int64)] if doclens is not None else np.full(len(docids), avgdl)
        # phrase: score by occurrence count as tf; single term: tf
        df_for_idf = min(ti.df for ti in infos)
        return score_mod.bm25(noccur, df_for_idf, dl, n_docs, avgdl) * weight
    if scorer == "tf_idf":
        n_cand = sum(ti.df_estimate for ti in infos)
        return score_mod.tf_idf(noccur, n_cand, len(infos), n_docs) * weight
    return score_mod.default_score(noccur.astype(np.float64), 0.0, weight)


def near_match(
    si: SectionIndex,
    tokens: list[tuple[str, int]],
    max_interval: int,
    *,
    n_docs: int,
    avgdl: float = 1.0,
    doclens: np.ndarray | None = None,
    weight: float = 1.0,
    use_offsets: bool = True,
    scorer: str = "default",
) -> MatchResult:
    """NEAR / NEAR2 match (reference lib/ii.c:6481-6497): all tokens in
    the same document with position span (max-min) <= max_interval.
    NEAR adjusts each token's positions by its query offset
    (``use_offsets=True``); NEAR2 uses raw positions
    (token_info_clear_offset, lib/ii.c:6364). ``noccur`` counts the
    windows found by the reference's sliding min/max walk.
    """
    infos = build_token_infos(si, tokens, with_positions=True)
    if infos is None:
        return MatchResult.empty()
    order = sorted(range(len(infos)), key=lambda i: infos[i].df)
    cand = infos[order[0]].postings.docids
    for i in order[1:]:
        cand = cand[np.isin(cand, infos[i].postings.docids)]
        if len(cand) == 0:
            return MatchResult.empty()

    # flatten each slot's positions over the SAME candidate-doc order:
    # the sliding min/max walk then runs LOCK-STEP across all candidate
    # docs at once (vectorized over docs; iterations amortize to the
    # total position count — the reference's per-record btr walk,
    # executed k-way across the whole candidate set)
    k = len(infos)
    flat: list[np.ndarray] = []
    offs: list[np.ndarray] = []
    for ti in infos:
        pl = ti.postings
        idx = np.flatnonzero(np.isin(pl.docids, cand))
        tf = pl.tfs.astype(np.int64)[idx]
        out_off = np.zeros(len(idx) + 1, np.int64)
        np.cumsum(tf, out=out_off[1:])
        take = np.arange(int(out_off[-1]), dtype=np.int64)
        take -= np.repeat(out_off[:-1], tf)
        take += np.repeat(pl.pos_offsets[idx], tf)
        off_adj = (ti.offset - infos[0].offset) if use_offsets else 0
        flat.append(pl.positions[take].astype(np.int64) - off_adj)
        offs.append(out_off)
    noccur = _near_count_lockstep(flat, offs, max_interval)
    keep = noccur > 0
    if not keep.any():
        return MatchResult.empty()
    docids = cand[keep].astype(np.uint64)
    noccur = noccur[keep]
    scores = _apply_scorer(scorer, docids, noccur, infos, n_docs, avgdl, doclens, weight)
    return MatchResult(docids, scores)


def _near_count_lockstep(
    flat: list[np.ndarray], offs: list[np.ndarray], interval: int
) -> np.ndarray:
    """Count NEAR windows per doc with the reference's sliding min/max
    walk (lib/ii.c:6481-6497), run lock-step across all docs: per
    iteration the (min, max) of the k heads is computed for every live
    doc at once; the min pointer advances to ``max+1`` on a hit or
    ``max-interval`` on a miss. Pointer advances amortize to the total
    number of positions, each step fully vectorized."""
    k = len(flat)
    n = len(offs[0]) - 1
    counts = np.zeros(n, np.int64)
    if n == 0:
        return counts
    ptr = np.stack([o[:-1].copy() for o in offs])     # (k, n)
    end = np.stack([o[1:] for o in offs])             # (k, n)
    alive = np.ones(n, bool)
    heads = np.zeros((k, n), np.int64)
    while alive.any():
        for s in range(k):
            heads[s][alive] = flat[s][ptr[s][alive]]
        mn = heads.min(axis=0)
        mx = heads.max(axis=0)
        match = alive & (mx - mn <= interval)
        counts[match] += 1
        target = np.where(match, mx + 1, mx - interval)
        mn_slot = np.argmin(heads, axis=0)            # first-min tie rule
        for s in range(k):
            adv = alive & (mn_slot == s)
            if not adv.any():
                continue
            p = ptr[s]
            while True:
                can = adv & (p < end[s])
                if not can.any():
                    break
                idx = np.flatnonzero(can)
                idx = idx[flat[s][p[idx]] < target[idx]]
                if len(idx) == 0:
                    break
                p[idx] += 1
                adv = np.zeros(n, bool)
                adv[idx] = True
            # recompute which docs this slot exhausted
            dead = alive & (mn_slot == s) & (p >= end[s])
            alive[dead] = False
    return counts


def similar_match(
    si: SectionIndex,
    text: str,
    similarity_threshold: int = 0,
    max_size: int = 1 << 20,
    *,
    n_docs: int,
    avgdl: float = 1.0,
    doclens: np.ndarray | None = None,
    weight: float = 1.0,
) -> MatchResult:
    """SIMILAR search (grn_ii_similar_search, lib/ii.c:5836-5960):
    tokenize the text, weight each distinct token by
    ``count_in_query + max_size/df̂`` (rarity), keep the top
    ``similarity_threshold`` tokens (default size/8+1), OR their
    postings with ``score = w1 * weight * tf``."""
    from .tokenize import WordTokenizer

    toks = WordTokenizer().tokenize_text(text)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    weighted: list = []  # (w1, tid, postings)
    for term, c in counts.items():
        tid = si.term_id(term)
        if tid is None:
            continue
        pl = si.postings(tid)
        # grn_ii_estimate_size approximates the posting BYTES — which
        # grow with total occurrences, not just df (a tf-3 singleton
        # estimates bigger than a tf-1 one), so rarity prefers the
        # token with the fewest occurrences
        est = int(pl.tfs.sum())
        if est == 0:
            continue
        weighted.append((c + max_size // est, tid, pl))
    if not weighted:
        return MatchResult.empty()
    limit = similarity_threshold if similarity_threshold else (len(weighted) >> 3) + 1
    limit = min(limit, len(weighted))
    weighted.sort(key=lambda x: -x[0])
    acc = MatchResult.empty()
    for w1, tid, pl in weighted[:limit]:
        scores = pl.tfs.astype(np.float64) * float(w1) * weight
        acc = op_or(acc, MatchResult(pl.docids.copy(), scores))
    return acc


def term_extract(si: SectionIndex, text: str) -> list[tuple[str, int]]:
    """TERM_EXTRACT (grn_ii_term_extract, lib/ii.c:5966-6046): walk the
    text; at each word boundary find the LONGEST lexicon term that is a
    prefix of the remaining normalized text (grn_table_lcp_search
    analogue over the sorted lexicon). Returns [(term, char_offset)]."""
    norm = text.lower()
    out: list[tuple[str, int]] = []
    i = 0
    n = len(norm)
    while i < n:
        # longest lexicon term that prefixes norm[i:]
        best = None
        rng = si.prefix_range(norm[i : i + 1])
        for tid in rng:
            t = si.term_at(tid)
            if norm.startswith(t, i) and (best is None or len(t) > len(best)):
                best = t
        if best:
            out.append((best, i))
            i += len(best)
        else:
            i += 1
    return out


# ---------------------------------------------------------------- booleans

def op_or(a: MatchResult, b: MatchResult) -> MatchResult:
    docids = np.concatenate([a.docids, b.docids])
    scores = np.concatenate([a.scores, b.scores])
    order = np.argsort(docids, kind="stable")
    docids, scores = docids[order], scores[order]
    if len(docids) == 0:
        return MatchResult.empty()
    starts = np.flatnonzero(np.concatenate([[True], docids[1:] != docids[:-1]]))
    return MatchResult(docids[starts], np.add.reduceat(scores, starts))


def op_and(a: MatchResult, b: MatchResult) -> MatchResult:
    common, ia, ib = np.intersect1d(a.docids, b.docids, return_indices=True)
    return MatchResult(common.astype(np.uint64), a.scores[ia] + b.scores[ib])


def op_and_not(a: MatchResult, b: MatchResult) -> MatchResult:
    mask = ~np.isin(a.docids, b.docids)
    return MatchResult(a.docids[mask], a.scores[mask])


def op_difference(a: MatchResult, b: MatchResult) -> tuple[MatchResult, MatchResult]:
    """Symmetric difference (grn_table_difference, lib/db.c:4010):
    removes the intersection from BOTH sides; returns the two pruned
    results."""
    in_b = np.isin(a.docids, b.docids)
    in_a = np.isin(b.docids, a.docids)
    return (
        MatchResult(a.docids[~in_b], a.scores[~in_b]),
        MatchResult(b.docids[~in_a], b.scores[~in_a]),
    )


def op_adjust(a: MatchResult, b: MatchResult) -> MatchResult:
    """ADJUST: add b's scores to docs already in a (no new docs)."""
    common, ia, ib = np.intersect1d(a.docids, b.docids, return_indices=True)
    scores = a.scores.copy()
    scores[ia] += b.scores[ib]
    return MatchResult(a.docids, scores)


def top_k(
    result: MatchResult, k: int, offset: int = 0, tie: str = "asc"
) -> tuple[np.ndarray, np.ndarray]:
    """(-score, docid) partial sort — grn_table_sort with limit.
    ``tie`` orders equal scores by docid: "asc" (the engine/oracle
    default) or "desc" (grn_table_sort's observed descending-scan
    order on score ties — select/match_columns/scorer/tf_at_most)."""
    n = result.nhits
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    take = min(n, offset + k)
    docids, scores = result.docids, result.scores
    if 0 < take and take * 16 < n:
        # partial sort: argpartition narrows to the candidates whose
        # score reaches the take-th boundary (ties at the boundary are
        # all kept so the docid tiebreak below stays exact), then the
        # full lexsort runs over that small set only
        part = np.argpartition(-scores, take - 1)[:take]
        kth = scores[part].min()
        cand = np.flatnonzero(scores >= kth)
        docids, scores = docids[cand], scores[cand]
    second = (
        docids if tie == "asc"
        else docids.astype(np.int64) * -1
    )
    order = np.lexsort((second, -scores))[:take]
    order = order[offset:]
    return docids[order], scores[order]


# ---------------------------------------------------------------- WAND

def wand_topk(
    si: SectionIndex,
    terms: list[str],
    k: int,
    scorer: str = "bm25",
    *,
    n_docs: int,
    avgdl: float,
    doclens: np.ndarray | None = None,
    mode: str = "or",
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND top-k over single-term disjuncts/conjuncts.

    Chunk-granular: candidate docid windows are chunk spans; a window is
    decoded only when the sum of overlapping chunks' score upper bounds
    beats the current threshold θ. Exact same results as the exhaustive
    path (verified by tests); prunes I/O + decode at scale.
    """
    term_rows = []
    for t in terms:
        tid = si.term_id(t)
        if tid is None:
            if mode == "and":
                return np.empty(0, np.uint64), np.empty(0, np.float64)
            continue
        rows = si.posting_rows(tid)
        row = rows[0] if len(rows) == 1 else codec.concat_posting_rows(rows)
        df = int(si.df[tid])
        term_rows.append((t, tid, row, df))
    if not term_rows:
        return np.empty(0, np.uint64), np.empty(0, np.float64)

    def chunk_ub(maxtf, df):
        if scorer == "bm25":
            return score_mod.bm25_upper_bound(maxtf, df, n_docs)
        if scorer == "tf_idf":
            return score_mod.tf_idf_upper_bound(maxtf, df + 2 if df > 1 else 1, 1, n_docs)
        return score_mod.default_upper_bound(maxtf)

    # chunk directories + per-term lazy chunk cursors: a chunk is
    # decoded at most once, and ONLY when a window overlapping it beats
    # the current θ (windows advance monotonically in docid, so decoded
    # chunks before the window are dropped — bounded memory)
    dirs = []
    cursors: list[dict[int, tuple[np.ndarray, np.ndarray]]] = []
    for t, tid, row, df in term_rows:
        cfirst = np.asarray(row["cfirst"], np.uint64)
        clast = np.asarray(row["clast"], np.uint64)
        cub = np.array([chunk_ub(m, df) for m in row["cmaxtf"]], np.float64)
        dirs.append((cfirst, clast, cub))
        cursors.append({})

    def window_postings(i: int, lo: np.uint64, hi: np.uint64):
        """(docids, tfs) of term i within [lo, hi] — chunk-lazy."""
        cfirst, clast, _ = dirs[i]
        c0 = int(np.searchsorted(clast, lo, side="left"))
        c1 = int(np.searchsorted(cfirst, hi, side="right"))
        if c0 >= c1:
            return None
        cur = cursors[i]
        for c in list(cur):
            if c < c0:
                del cur[c]
        parts = []
        run_start = None
        for c in range(c0, c1):
            if c in cur:
                if run_start is not None:
                    d, tf = codec.decode_chunks(term_rows[i][2], run_start, c)
                    for cc, (dd, tt) in _split_chunks(term_rows[i][2], run_start, c, d, tf):
                        cur[cc] = (dd, tt)
                    run_start = None
            elif run_start is None:
                run_start = c
        if run_start is not None:
            d, tf = codec.decode_chunks(term_rows[i][2], run_start, c1)
            for cc, (dd, tt) in _split_chunks(term_rows[i][2], run_start, c1, d, tf):
                cur[cc] = (dd, tt)
        d = np.concatenate([cur[c][0] for c in range(c0, c1)])
        tf = np.concatenate([cur[c][1] for c in range(c0, c1)])
        a = np.searchsorted(d, lo, side="left")
        b = np.searchsorted(d, hi, side="right")
        if a == b:
            return None
        return d[a:b], tf[a:b]

    # windows = consecutive pairs over union of all chunk boundaries
    edges = np.unique(np.concatenate([d[1] for d in dirs]))  # window ends = clasts
    heap: list[tuple[float, int]] = []   # (score, -docid) min-heap of k best
    theta = -np.inf

    lo = np.uint64(0)
    for hi in edges:
        # upper bound of this window
        ub = 0.0
        active = []
        for i, (cfirst, clast, cub) in enumerate(dirs):
            j = np.searchsorted(clast, lo, side="left")       # first chunk ending >= lo
            j2 = np.searchsorted(cfirst, hi, side="right")    # chunks starting <= hi
            if j < j2:
                ub += float(cub[j:j2].max())
                active.append(i)
        if (mode == "and" and len(active) < len(term_rows)) or not active:
            lo = hi + np.uint64(1)
            continue
        # ub == theta must still be scored: a doc scoring exactly theta
        # with a smaller docid wins the docid-asc tiebreak
        if len(heap) >= k and ub < theta:
            lo = hi + np.uint64(1)
            continue
        # decode + score the window fully vectorized (no per-doc dicts)
        d_parts, s_parts = [], []
        for i in active:
            got = window_postings(i, lo, hi)
            if got is None:
                continue
            d, tf64 = got
            tf = tf64.astype(np.int64)
            if scorer == "bm25":
                dl = doclens[d] if doclens is not None else np.full(len(d), avgdl)
                s = score_mod.bm25(tf, term_rows[i][3], dl, n_docs, avgdl)
            elif scorer == "tf_idf":
                df = term_rows[i][3]
                s = score_mod.tf_idf(tf, df + 2 if df > 1 else 1, 1, n_docs)
            else:
                s = score_mod.default_score(tf.astype(np.float64))
            d_parts.append(d)
            s_parts.append(s)
        if d_parts:
            all_d = np.concatenate(d_parts)
            all_s = np.concatenate(s_parts)
            order = np.argsort(all_d, kind="stable")
            d_s = all_d[order]
            s_s = all_s[order]
            bstarts = np.flatnonzero(np.concatenate([[True], d_s[1:] != d_s[:-1]]))
            doc = d_s[bstarts]
            score = np.add.reduceat(s_s, bstarts)
            if mode == "and":
                cnt = np.diff(np.append(bstarts, len(d_s)))
                keepm = cnt == len(term_rows)
                doc, score = doc[keepm], score[keepm]
            # heap updates only for docs that can enter the top-k
            if len(heap) >= k:
                cm = score >= theta
                doc, score = doc[cm], score[cm]
            for dd, ss in zip(doc.tolist(), score.tolist()):
                item = (ss, -dd)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                    if len(heap) == k:
                        theta = heap[0][0]
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                    theta = heap[0][0]
        lo = hi + np.uint64(1)

    out = sorted(heap, key=lambda x: (-x[0], -x[1]))
    return (
        np.array([-d for _, d in out], np.uint64),
        np.array([s for s, _ in out], np.float64),
    )


def _split_chunks(row: dict, c0: int, c1: int, d: np.ndarray, tf: np.ndarray):
    """Split a decoded chunk-range back into per-chunk arrays."""
    cn = np.asarray(row["cn"], np.int64)[c0:c1]
    pos = 0
    for j, c in enumerate(range(c0, c1)):
        n = int(cn[j])
        yield c, (d[pos : pos + n], tf[pos : pos + n])
        pos += n
