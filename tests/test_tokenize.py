"""Tokenizer conformance vectors (FIXTURES.md F5).

Golden expectations are hand-derived from the reference state machine
(lib/tokenizers.c ngram_next + lib/token_cursor.c GET-mode rules) and
cross-checked against the reference's own golden files under
test/command/suite/tokenizers/ (cited per case).
"""

import numpy as np
import pyarrow as pa
import pytest

from groonga_ray.normalize import normalize
from groonga_ray.tokenize import (
    TOKEN_FORCE_PREFIX,
    WordTokenizer,
    delimit_tokenize,
    ngram_tokenize,
    tokenize,
)


def toks(stream):
    return [(t.term, t.pos) for t in stream.tokens]


# ---------------------------------------------------------------- normalize

def test_normalize_blank_flags():
    norm, classes, blanks = normalize("ab cd")
    assert norm == "abcd"
    assert blanks.tolist() == [False, True, False, False]


def test_normalize_nfkc_lower():
    # fullwidth A (U+FF21) -> NFKC "A" -> "a"
    norm, classes, _ = normalize("Ａbc")
    assert norm == "abc"
    assert classes.tolist() == [1, 1, 1]


# ------------------------------------------------------------ bigram / ADD

def test_bigram_ascii_words():
    # alpha runs are whole words (uni_alpha), symbol run separate
    s = ngram_tokenize("snake_case", unit=2)
    assert toks(s) == [("snake", 0), ("_", 1), ("case", 2)]


def test_bigram_alnum_boundaries():
    s = ngram_tokenize("a1b2", unit=2)
    assert toks(s) == [("a", 0), ("1", 1), ("b", 2), ("2", 3)]


def test_bigram_blank_breaks_runs():
    s = ngram_tokenize("abc def", unit=2)
    assert toks(s) == [("abc", 0), ("def", 1)]


def test_bigram_symbol_run():
    s = ngram_tokenize("->*&", unit=2)
    assert toks(s) == [("->*&", 0)]


def test_bigram_cjk_overlap_add():
    s = ngram_tokenize("日本語", unit=2, mode="add")
    assert toks(s) == [("日本", 0), ("本語", 1), ("語", 2)]


def test_bigram_cjk_get_drops_overlap_tail():
    s = ngram_tokenize("日本語", unit=2, mode="get")
    assert toks(s) == [("日本", 0), ("本語", 1)]
    assert not s.force_prefix


def test_get_force_prefix_single_unmatured():
    # reference golden: tokenizers/bigram/force_prefix/single_token/
    # unmatured.test -> "da" alone => force_prefix true
    s = ngram_tokenize("だ", unit=2, mode="get")
    assert toks(s) == [("だ", 0)]
    assert s.force_prefix


def test_get_force_prefix_matured_false():
    s = ngram_tokenize("だよ", unit=2, mode="get")
    assert toks(s) == [("だよ", 0)]
    assert not s.force_prefix


def test_get_force_prefix_after_alpha():
    # reference golden: force_prefix/multiple_tokens/unmatured.test:
    # "ABCda" => [abc(0), da(1) force_prefix]
    s = ngram_tokenize("ABCだ", unit=2, mode="get")
    assert toks(s) == [("abc", 0), ("だ", 1)]
    assert s.force_prefix


def test_long_token_dropped_without_position():
    # reference golden: tokenizers/bigram/long_token/middle.test —
    # the 4096-byte X-run is dropped and "after" takes position 4
    text = "4097byte string: " + "X" * 4097 + " after string"
    s = ngram_tokenize(text, unit=2)
    assert toks(s) == [
        ("4097", 0),
        ("byte", 1),
        ("string", 2),
        (":", 3),
        ("after", 4),
        ("string", 5),
    ]


def test_trigram_force_prefix_two_chars():
    # trigram golden: unmatured_two_characters => force_prefix true
    s = ngram_tokenize("だよ", unit=3, mode="get")
    assert toks(s) == [("だよ", 0)]
    assert s.force_prefix


def test_unigram_cjk():
    s = ngram_tokenize("日本", unit=1, mode="add")
    assert toks(s) == [("日", 0), ("本", 1)]
    # alpha runs still whole words under TokenUnigram (uni_alpha=1)
    s = ngram_tokenize("abc", unit=1, mode="add")
    assert toks(s) == [("abc", 0)]


def test_delimit():
    s = delimit_tokenize("Hello  World X")
    assert toks(s) == [("hello", 0), ("world", 1), ("x", 2)]


def test_registry_variants():
    assert toks(tokenize("a_b", "TokenBigramSplitSymbol")) == [
        ("a", 0),
        ("_", 1),
        ("b", 2),
    ]
    # SplitSymbolAlpha: alpha not unified -> bigram over letters
    assert toks(tokenize("abc", "TokenBigramSplitSymbolAlpha")) == [
        ("ab", 0),
        ("bc", 1),
        ("c", 2),
    ]


# ---------------------------------------------------------- word tokenizer

def test_word_tokenizer_matches_regex_oracle():
    import re

    texts = [
        "def foo_bar(x1, y2): return x1+y2  # comment",
        "",
        "UPPER lower_case 123abc __init__",
        "日本語 mixed ascii",
        "tabs\tand\nnewlines",
        None,
        "trailing_token",
    ]
    col = pa.array(texts, type=pa.large_string())
    wt = WordTokenizer()
    tb = wt.tokenize_column(col)
    # independent oracle: the SQL-equivalent regex per row
    pat = re.compile(r"[a-z0-9_]+")
    expect = []
    for i, t in enumerate(texts):
        words = pat.findall(t.lower()) if t else []
        expect.extend((i, p, w) for p, w in enumerate(words))
    got = list(zip(tb.row_idx.tolist(), tb.positions.tolist(), tb.terms.to_pylist()))
    assert got == expect
    assert tb.n_tokens_per_row.tolist() == [
        len(pat.findall(t.lower())) if t else 0 for t in texts
    ]


def test_word_tokenizer_large_random():
    import re

    rng = np.random.default_rng(5)
    vocab = ["foo", "bar_baz", "x1", "return", "def", "été", "A-B"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(500)
    ]
    col = pa.array(texts, type=pa.large_string())
    tb = WordTokenizer().tokenize_column(col)
    pat = re.compile(r"[a-z0-9_]+")
    expect_counts = [len(pat.findall(t.lower())) for t in texts]
    assert tb.n_tokens_per_row.tolist() == expect_counts
    # spot check a random row end-to-end
    i = 137
    mask = tb.row_idx == i
    assert (
        np.array(tb.terms.to_pylist())[mask].tolist()
        == pat.findall(texts[i].lower())
    )


def test_word_tokenizer_sliced_input():
    col = pa.array(["aa bb", "cc dd", "ee ff"], type=pa.large_string())
    tb = WordTokenizer().tokenize_column(col.slice(1, 2))
    assert tb.terms.to_pylist() == ["cc", "dd", "ee", "ff"]
    assert tb.row_idx.tolist() == [0, 0, 1, 1]


# ---------------------------------------------------------------- filters

def test_token_filter_chain():
    import numpy as np
    import pyarrow as pa

    from groonga_ray.tokenfilters import (
        TokenFilterStem, TokenFilterStopWord, apply_chain, build_chain, porter_stem,
    )

    terms = pa.array(["the", "queries", "spark", "a", "running"], type=pa.large_string())
    chain = build_chain(
        {"token_filters": ["TokenFilterStem", "TokenFilterStopWord"],
         "stop_words": ["the", "a"]}
    )
    # ADD mode: stems map, stop words stay (they are indexed)
    out, idx = apply_chain(chain, terms, "add")
    assert out.to_pylist() == ["the", "queri", "spark", "a", "run"]
    assert idx.tolist() == [0, 1, 2, 3, 4]
    # GET mode: stop words drop, ordinals of survivors preserved
    out, idx = apply_chain(chain, terms, "get")
    assert out.to_pylist() == ["queri", "spark", "run"]
    assert idx.tolist() == [1, 2, 4]
    assert porter_stem("query") == porter_stem("queries") == "queri"


def test_stemmed_build_matches_manual(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from groonga_ray.build import BuildConfig, build_index
    from groonga_ray.index import IndexReader
    from groonga_ray.tokenfilters import porter_stem

    rows = {
        "doc_id": [1, 2, 3],
        "text": ["running queries fast", "the query runs", "spark sparks sparked"],
    }
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table(rows), src)
    idx_dir = str(tmp_path / "idx")
    cfg = BuildConfig(
        text_columns=("text",), docid_column="doc_id", n_buckets=4,
        target_rows_per_shard=10, token_filters=("TokenFilterStem",),
    )
    build_index([src], idx_dir, cfg)
    r = IndexReader(idx_dir)
    si = r.section("text")
    # manual oracle: stem every token, count (term, doc) postings
    want: dict[str, dict[int, int]] = {}
    for d, text in zip(rows["doc_id"], rows["text"]):
        for w in text.split():
            s = porter_stem(w)
            want.setdefault(s, {})[d] = want.setdefault(s, {}).get(d, 0) + 1
    lex_terms = [si.term_at(t) for t in si.all_tids()]
    assert sorted(lex_terms) == sorted(want)
    for term, docs in want.items():
        tid = si.term_id(term)
        pl = si.postings(tid)
        assert dict(zip(pl.docids.tolist(), pl.tfs.astype(int).tolist())) == docs, term


# ---- TokenRegexp (reference goldens: test/command/suite/tokenizers/regexp/) --

def _rx(text, mode):
    from groonga_ray.tokenize import regexp_tokenize

    ts = regexp_tokenize(text, mode=mode)
    return [(t.term, t.pos) for t in ts.tokens], ts.force_prefix


def test_regexp_add_goldens():
    B, E = "￯", "￰"
    # regexp/add/one two three four
    assert _rx("x", "add")[0] == [(B, 0), ("x", 1), (E, 2)]
    assert _rx("xy", "add")[0] == [(B, 0), ("xy", 1), ("y", 2), (E, 3)]
    assert _rx("xyz", "add")[0] == [(B, 0), ("xy", 1), ("yz", 2), ("z", 3), (E, 4)]
    assert _rx("abcd", "add")[0] == [(B, 0), ("ab", 1), ("bc", 2), ("cd", 3), ("d", 4), (E, 5)]
    # regexp/add/normalizer/blank — skip token consumes position 5
    assert _rx("abcd\nefgh", "add")[0] == [
        (B, 0), ("ab", 1), ("bc", 2), ("cd", 3), ("d", 4),
        ("ef", 6), ("fg", 7), ("gh", 8), ("h", 9), (E, 10),
    ]


def test_regexp_get_goldens():
    B, E = "￯", "￰"
    # regexp/get/long — every other bigram skipped, final kept
    toks, fp = _rx("abcdefghijk", "get")
    assert toks == [("ab", 0), ("cd", 2), ("ef", 4), ("gh", 6), ("ij", 8), ("jk", 9)]
    assert not fp
    # regexp/get/begin
    assert _rx(B + "x", "get") == ([(B, 0), ("x", 1)], True)
    assert _rx(B + "xy", "get")[0] == [(B, 0), ("xy", 1)]
    assert _rx(B + "xyz", "get")[0] == [(B, 0), ("xy", 1), ("yz", 2)]
    # regexp/get/end
    assert _rx("x" + E, "get") == ([("x", 0), (E, 1)], False)
    assert _rx("xy" + E, "get")[0] == [("xy", 0), (E, 2)]
    assert _rx("xyz" + E, "get")[0] == [("xy", 0), ("yz", 1), (E, 3)]
    assert _rx("abcd" + E, "get")[0] == [("ab", 0), ("cd", 2), (E, 4)]


def test_regexp_registry():
    from groonga_ray.tokenize import tokenize

    assert [t.term for t in tokenize("xyz", "TokenRegexp", "add").tokens] == [
        "￯", "xy", "yz", "z", "￰",
    ]
