"""Tokenizers: Groonga-parity n-gram state machine + a fully vectorized
byte-level word tokenizer for the code-corpus hot path.

* :func:`ngram_tokenize` reimplements the semantics of the reference's
  ``grn_ngram_tokenizer`` / ``ngram_next`` (lib/tokenizers.c:355-455)
  plus the token-cursor ADD/GET handling (lib/token_cursor.c:241-252):
  runs of ALPHA (resp. DIGIT / SYMBOL, per the ``uni_*`` variant flags)
  are emitted as whole words; other scripts (CJK) get overlapping
  n-grams advancing one character; blank flags break runs; in GET
  (query) mode overlapping unmatured tails are skipped and a trailing
  short token forces prefix search. Positions are token ordinals
  (``token_cursor->pos``), not character offsets.

* :class:`WordTokenizer` is the scale-path tokenizer (the north rule's
  "unigram for code identifiers"): word = a maximal run of
  ``[a-z0-9_]`` bytes over the lowercased text. It is implemented with
  numpy over the concatenated UTF-8 buffer of a whole Arrow column —
  no per-row Python — and its output is exactly reproducible in SQL as
  ``regexp_split_to_array(lower(text), '[^a-z0-9_]+')``, which is what
  the DuckDB oracle uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .normalize import CHAR_ALPHA, CHAR_DIGIT, CHAR_SYMBOL, normalize

# token status flags (names follow the reference's grn_token_status)
TOKEN_OVERLAP = 1 << 0
TOKEN_UNMATURED = 1 << 1
TOKEN_LAST = 1 << 2
TOKEN_REACH_END = 1 << 3
TOKEN_FORCE_PREFIX = 1 << 4


@dataclass
class Token:
    term: str
    pos: int           # token ordinal (what goes into the posting position)
    status: int = 0


@dataclass
class TokenStream:
    tokens: list[Token] = field(default_factory=list)
    force_prefix: bool = False   # GET mode: last token should prefix-expand


def _ngram_raw(norm: str, classes: np.ndarray, blanks: np.ndarray, unit: int,
               uni_alpha: bool, uni_digit: bool, uni_symbol: bool,
               ignore_blank: bool):
    """Yield (start, length, status) over the normalized text, following
    the ngram_next state machine (one emission per call in the
    reference; a generator here)."""
    n = len(norm)
    pos = 0
    skip = 0
    overlap = False
    while True:
        p = pos + skip
        status = 0
        length = 0
        if p >= n:
            # p == r case: empty token, LAST — the cursor drops empties
            yield p, 0, TOKEN_LAST | TOKEN_REACH_END
            return
        cls = classes[p]
        if uni_alpha and cls == CHAR_ALPHA:
            i = p
            while i < n:
                length += 1
                brk = blanks[i]
                i += 1
                if brk:
                    break
                if i >= n or classes[i] != CHAR_ALPHA:
                    break
            overlap = False
            next_i = i
        elif uni_digit and cls == CHAR_DIGIT:
            i = p
            while i < n:
                length += 1
                brk = blanks[i]
                i += 1
                if brk:
                    break
                if i >= n or classes[i] != CHAR_DIGIT:
                    break
            overlap = False
            next_i = i
        elif uni_symbol and cls == CHAR_SYMBOL:
            i = p
            while i < n:
                length += 1
                brk = blanks[i] and not ignore_blank
                i += 1
                if brk:
                    break
                if i >= n or classes[i] != CHAR_SYMBOL:
                    break
            overlap = False
            next_i = i
        else:
            # n-gram branch: consume one char, extend to `unit`, advance 1
            i = p
            length = 1
            i += 1
            next_i = i
            while length < unit and i < n:
                if not ignore_blank and blanks[i - 1]:
                    break
                c2 = classes[i]
                if (uni_alpha and c2 == CHAR_ALPHA) or \
                   (uni_digit and c2 == CHAR_DIGIT) or \
                   (uni_symbol and c2 == CHAR_SYMBOL):
                    break
                length += 1
                i += 1
            if overlap:
                status |= TOKEN_OVERLAP
            if length < unit:
                status |= TOKEN_UNMATURED
            overlap = length > 1
        pos = p
        end = p + length
        if next_i >= n:
            skip = 0
            status |= TOKEN_LAST
        else:
            skip = 1 if overlap else length
        if end >= n:
            status |= TOKEN_REACH_END
        yield p, length, status
        if status & TOKEN_LAST:
            return


def ngram_tokenize(
    text: str,
    mode: str = "add",
    unit: int = 2,
    uni_alpha: bool = True,
    uni_digit: bool = True,
    uni_symbol: bool = True,
    ignore_blank: bool = False,
    nfkc: bool = True,
    max_token_bytes: int = 4096,
    raw: bool = False,
) -> TokenStream:
    """TokenBigram-family tokenization (unit=1/2/3 → Unigram/Bigram/Trigram).

    ``mode='add'`` is index-build tokenization; ``mode='get'`` is query
    tokenization (skips overlapping unmatured tails, stops at the end of
    text, marks a trailing unmatured token as force-prefix) — the
    token-cursor rules of lib/token_cursor.c:241-252.
    """
    if raw:
        # no normalizer (tokenize command without one): every char is
        # type-less → no alpha/digit grouping, pure overlapping n-grams
        # over the raw text including blanks (lib/proc.c proc_tokenize
        # with a NULL normalizer)
        from .normalize import CHAR_OTHERS

        norm = text
        classes = np.full(len(text), CHAR_OTHERS, np.uint8)
        blanks = np.zeros(len(text), bool)
    else:
        norm, classes, blanks = normalize(text, nfkc=nfkc)
    stream = TokenStream()
    get = mode == "get"
    tpos = 0  # token ordinal, the reference's token_cursor->pos
    for start, length, status in _ngram_raw(
        norm, classes, blanks, unit, uni_alpha, uni_digit, uni_symbol, ignore_blank
    ):
        done = bool(status & TOKEN_LAST) or (get and (status & TOKEN_REACH_END))
        force_prefix = False
        if length == 0:
            if done:
                break
            continue
        term = norm[start : start + length]
        if len(term.encode("utf-8")) > max_token_bytes:
            # too-long tokens are dropped WITHOUT consuming a position
            # (reference lib/token_cursor.c:233-243; golden:
            # tokenizers/bigram/long_token/middle.test gives "after"
            # position 4 right after the dropped 4096-byte run)
            if done:
                break
            continue
        if status & TOKEN_UNMATURED:
            if status & TOKEN_OVERLAP:
                if get:
                    tpos += 1
                    continue
            elif status & TOKEN_REACH_END:
                force_prefix = True
        stream.tokens.append(Token(term, tpos, status))
        stream.force_prefix = force_prefix
        tpos += 1
        if done:
            break
    return stream


def delimit_tokenize(
    text: str, delimiter: str = " ", nfkc: bool = True, raw: bool = False
) -> TokenStream:
    """TokenDelimit / TokenDelimitNull (lib/tokenizers.c:101-236): split
    the *raw* text on a single-byte delimiter; tokens are then
    normalized individually (or kept raw without a normalizer)."""
    stream = TokenStream()
    tpos = 0
    for piece in text.split(delimiter):
        if not piece:
            continue
        norm = piece if raw else normalize(piece, nfkc=nfkc)[0]
        if norm:
            stream.tokens.append(Token(norm, tpos))
            tpos += 1
    return stream


# ------------------------------------------------------------------
# Vectorized word tokenizer (scale path)
# ------------------------------------------------------------------

def _word_byte_table(extra: bytes = b"_") -> np.ndarray:
    tbl = np.zeros(256, bool)
    for lo, hi in ((ord("a"), ord("z")), (ord("0"), ord("9"))):
        tbl[lo : hi + 1] = True
    for b in extra:
        tbl[b] = True
    return tbl


@dataclass
class TokenizedBatch:
    """Exploded tokens of one Arrow string column batch."""

    terms: pa.Array          # large_string, one per token
    row_idx: np.ndarray      # int64 row index of each token within the batch
    positions: np.ndarray    # uint32 token ordinal within its row
    n_tokens_per_row: np.ndarray  # int64 per input row (doc length in tokens)
    n_truncated_rows: int = 0     # rows clipped at max_tokens_per_doc


class WordTokenizer:
    """Maximal-run [a-z0-9_] tokenizer, vectorized over whole batches.

    The entire column is processed as one concatenated UTF-8 byte
    buffer: per-byte word/non-word classification via a 256-entry
    lookup table, run boundaries via a shifted comparison, token
    extraction via a vectorized range-gather. SQL-oracle equivalent:
    ``list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '')``.

    Multi-byte UTF-8 characters (bytes >= 0x80) are non-word bytes,
    which matches the ASCII character class in the SQL regex.
    """

    def __init__(self, word_chars_extra: bytes = b"_", max_tokens_per_doc: int = 1_000_000):
        self._tbl = _word_byte_table(word_chars_extra)
        # cap mirrors Groonga's est_len guard for absurd rows (lib/ii.c:7403)
        self.max_tokens_per_doc = max_tokens_per_doc

    def tokenize_column(self, col: pa.Array) -> TokenizedBatch:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lowered = pc.utf8_lower(col).cast(pa.large_string())
        buf = np.frombuffer(lowered.buffers()[2], np.uint8) if lowered.buffers()[2] is not None else np.empty(0, np.uint8)
        offsets = np.frombuffer(lowered.buffers()[1], np.int64)[lowered.offset : lowered.offset + len(lowered) + 1]
        base = offsets[0]
        view = buf[base : offsets[-1]]
        offsets = offsets - base
        n_rows = len(lowered)
        if len(view) == 0:
            return TokenizedBatch(
                pa.array([], type=pa.large_string()),
                np.empty(0, np.int64),
                np.empty(0, np.uint32),
                np.zeros(n_rows, np.int64),
            )

        # word-run boundaries from ONE signed diff over the class flags
        # (+1 at run starts, -1 one past run ends) — half the byte-wide
        # passes of the shifted-comparison formulation, which matters in
        # the many-worker regime where memory bandwidth is the ceiling
        iw8 = self._tbl[view].view(np.int8)
        d = np.empty(len(view) + 1, np.int8)
        d[0] = iw8[0]
        np.subtract(iw8[1:], iw8[:-1], out=d[1:-1])
        d[-1] = -iw8[-1]
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        # force breaks where a word run spans a row boundary (the rare
        # case; O(n_rows) extra boundary points merged in)
        ob = offsets[1:-1]
        ob = ob[(ob > 0) & (ob < len(view))]
        # unique: empty rows repeat their offset and would otherwise
        # split twice, fabricating an empty token
        sp = np.unique(ob[(iw8[ob] == 1) & (iw8[ob - 1] == 1)])
        if len(sp):
            starts = np.sort(np.concatenate([starts, sp]))
            ends = np.sort(np.concatenate([ends, sp]))
        assert len(starts) == len(ends)
        lens = ends - starts

        # token -> row assignment + per-row ordinals
        row_idx = np.searchsorted(offsets, starts, side="right") - 1
        tokens_per_row = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
        first_tok = np.zeros(n_rows, np.int64)
        np.cumsum(tokens_per_row[:-1], out=first_tok[1:])
        positions = (np.arange(len(starts)) - first_tok[row_idx]).astype(np.uint32)

        # vectorized range-gather of token bytes (int32 arithmetic: the
        # gather index is the largest temporary; batches are < 2 GiB)
        out_off = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(lens, out=out_off[1:])
        total = int(out_off[-1])
        gather = np.arange(total, dtype=np.int32)
        # one fused repeat: (start - cumulative output offset) per token
        gather += np.repeat(
            (starts - out_off[:-1]).astype(np.int32), lens
        )
        token_bytes = view[gather]
        terms = pa.LargeStringArray.from_buffers(
            len(starts), pa.py_buffer(out_off), pa.py_buffer(token_bytes)
        )
        # wide-row guard (the reference's II_BUFFER est_len cap,
        # lib/ii.c:7403): drop positions beyond max_tokens_per_doc and
        # surface the truncation count as a metric
        n_trunc = 0
        cap = self.max_tokens_per_doc
        if len(positions) and int(positions.max()) >= cap:
            keep = positions < cap
            n_trunc = int(np.count_nonzero(tokens_per_row > cap))
            terms = terms.filter(pa.array(keep))
            row_idx = row_idx[keep]
            positions = positions[keep]
            tokens_per_row = np.minimum(tokens_per_row, cap)
        return TokenizedBatch(terms, row_idx, positions, tokens_per_row, n_trunc)

    def tokenize_text(self, text: str) -> list[str]:
        tb = self.tokenize_column(pa.array([text], type=pa.large_string()))
        return tb.terms.to_pylist()


TOKENIZERS = {
    "TokenBigram": dict(unit=2),
    "TokenUnigram": dict(unit=1),
    "TokenTrigram": dict(unit=3),
    "TokenBigramSplitAlpha": dict(unit=2, uni_alpha=False),
    "TokenBigramSplitDigit": dict(unit=2, uni_digit=False),
    "TokenBigramSplitSymbol": dict(unit=2, uni_symbol=False),
    "TokenBigramSplitSymbolAlpha": dict(unit=2, uni_symbol=False, uni_alpha=False),
    "TokenBigramSplitSymbolAlphaDigit": dict(
        unit=2, uni_symbol=False, uni_alpha=False, uni_digit=False
    ),
    "TokenBigramIgnoreBlank": dict(unit=2, ignore_blank=True),
    "TokenBigramIgnoreBlankSplitSymbol": dict(unit=2, ignore_blank=True, uni_symbol=False),
    "TokenBigramIgnoreBlankSplitSymbolAlpha": dict(
        unit=2, ignore_blank=True, uni_symbol=False, uni_alpha=False
    ),
    "TokenBigramIgnoreBlankSplitSymbolAlphaDigit": dict(
        unit=2, ignore_blank=True, uni_symbol=False, uni_alpha=False, uni_digit=False
    ),
}


# TokenRegexp begin/end anchors (GRN_TOKENIZER_BEGIN/END_MARK_UTF8,
# include/groonga/tokenizer.h) — \A / \z become lexicon terms
REGEXP_BEGIN_MARK = "￯"
REGEXP_END_MARK = "￰"


def regexp_tokenize(text: str, mode: str = "add", nfkc: bool = True) -> TokenStream:
    """TokenRegexp (lib/tokenizers.c:472-730): overlapping character
    bigrams bracketed by begin/end marks so a REGEXP index can verify
    ``\\A``/``\\z`` anchors.

    ADD emits the begin mark, a bigram per character step (unmatured
    single-char tail at text/blank boundaries; a position-consuming
    skip after each blank), and the end mark. GET tokenizes a query
    literal (which may embed the marks): overlapping bigrams with every
    other one skipped (n_skip_tokens), except the token that reaches
    the end — an unmatured final token force-prefix-expands unless the
    end mark anchors it.
    """
    norm, _, blanks = normalize(text, nfkc=nfkc)
    stream = TokenStream()
    out = stream.tokens
    n = len(norm)
    if mode != "get":
        tpos = 0
        out.append(Token(REGEXP_BEGIN_MARK, tpos))
        tpos += 1
        i = 0
        while i < n:
            if i > 0 and blanks[i - 1]:
                tpos += 1          # empty SKIP token consumes a position
            two = i + 1 < n and not blanks[i]
            out.append(Token(norm[i : i + 2 if two else i + 1], tpos))
            tpos += 1
            i += 1
        out.append(Token(REGEXP_END_MARK, tpos))
        return stream

    i = 0
    if n and norm[0] == REGEXP_BEGIN_MARK:
        out.append(Token(REGEXP_BEGIN_MARK, 0))
        i = 1
    has_end = n > i and norm[n - 1] == REGEXP_END_MARK
    n_eff = n - 1 if has_end else n
    n_skip = 0
    is_start = i == 0
    while i < n_eff:
        two = i + 1 < n_eff and not blanks[i]
        L = 2 if two else 1
        term = norm[i : i + L]
        reach_end = not has_end and i + L == n
        by_blank = bool(blanks[i]) or (L == 2 and bool(blanks[i + 1]))
        by_end_mark = has_end and i + L == n_eff
        if reach_end:
            out.append(Token(term, i))
            if L < 2:
                stream.force_prefix = True
            break
        if by_blank:
            # pre-blank unmatured tail: UNMATURED|OVERLAP tokens are
            # position-consuming skips in GET mode (token_cursor.c:
            # 241-246); a run-initial single char is not overlapping
            # and is kept
            if L == 2 or i == 0 or bool(blanks[i - 1]):
                out.append(Token(term, i))
            n_skip = 0
        elif by_end_mark:
            if is_start or L == 2:
                out.append(Token(term, i))
        elif n_skip > 0:
            n_skip -= 1
        else:
            out.append(Token(term, i))
            n_skip = 1
        is_start = by_blank
        i += 1
    if has_end:
        out.append(Token(REGEXP_END_MARK, n - 1))
    return stream


CUSTOM_TOKENIZERS: dict[str, "object"] = {}


def register_tokenizer(name: str, fn) -> None:
    """Plugin surface (grn_proc_create PROC_TOKENIZER,
    include/groonga/groonga.h:490): ``fn(text, mode) -> TokenStream``
    becomes addressable by name everywhere a tokenizer name is taken."""
    CUSTOM_TOKENIZERS[name] = fn


def is_known_tokenizer(name: str) -> bool:
    """True iff ``name`` resolves to a tokenizer (built-in table,
    special dispatches below, or the plugin registry). table_create
    rejects unknown names exactly like grn_table_create's
    default-tokenizer lookup failing (lib/db.c)."""
    return (
        name in TOKENIZERS
        or name in CUSTOM_TOKENIZERS
        or name in (
            "TokenRegexp", "TokenDelimit", "TokenDelimitNull",
            "TokenCodeWord", "TokenUvector",
        )
    )


def tokenize(
    text: str,
    tokenizer: str = "TokenBigram",
    mode: str = "add",
    normalizer: str | None = "NormalizerAuto",
    enable_tokenized_delimiter: bool = False,
) -> TokenStream:
    """Registry entry point mirroring the reference's named tokenizers
    (registration: lib/tokenizers.c:783-828).

    ``normalizer=None`` (or "NONE") is the tokenize command's raw path
    — no case folding, no char classes, blanks tokenized. When
    ``enable_tokenized_delimiter`` and the text contains U+FFFE, every
    tokenizer switches to tokenized-delimiter mode
    (grn_tokenizer_have_tokenized_delimiter,
    lib/tokenizer.c: pieces between delimiters become the tokens)."""
    raw = normalizer in (None, "", "NONE", "NormalizerNone")
    if enable_tokenized_delimiter and "￾" in text:
        from .normalize import normalize_detailed

        stream = TokenStream()
        tpos = 0
        for piece in text.split("￾"):
            if not raw:
                piece = normalize_detailed(piece)[0]  # NFKC+lower, blanks kept
            if piece:
                stream.tokens.append(Token(piece, tpos))
                tpos += 1
        return stream
    if tokenizer in CUSTOM_TOKENIZERS:
        return CUSTOM_TOKENIZERS[tokenizer](text, mode)
    if tokenizer == "TokenRegexp":
        return regexp_tokenize(text, mode=mode)
    if tokenizer in ("TokenDelimit",):
        return delimit_tokenize(text, " ", raw=raw)
    if tokenizer in ("TokenDelimitNull",):
        return delimit_tokenize(text, "\x00", raw=raw)
    if tokenizer == "TokenCodeWord":
        ts = TokenStream()
        ts.tokens = [Token(t, i) for i, t in enumerate(WordTokenizer().tokenize_text(text))]
        return ts
    if tokenizer == "TokenUvector":
        # vector-element index: query pieces (whitespace-split) are
        # element keys with consecutive positions, so phrase queries
        # match consecutive elements
        ts = TokenStream()
        ts.tokens = [Token(p, i) for i, p in enumerate(text.split()) if p]
        return ts
    kwargs = TOKENIZERS[tokenizer]
    return ngram_tokenize(text, mode=mode, raw=raw, **kwargs)
