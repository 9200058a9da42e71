"""Non-ASCII NormalizerAuto parity over the dumped nfkc.c tables.

Goldens were produced by compiling the reference's generated
lib/nfkc.c functions and running the faithful utf8_normalize port over
them (tools/gen_nfkc_tables.py build_so + an 8000-string fuzz with
zero mismatches); they pin the table-backed path byte-for-byte.
"""
import numpy as np

from groonga_ray.normalize import (
    CHAR_ALPHA,
    CHAR_DIGIT,
    CHAR_HIRAGANA,
    CHAR_KANJI,
    CHAR_KATAKANA,
    CHAR_SYMBOL,
    _nfkc_tables,
    normalize,
)


def test_tables_present():
    tabs = _nfkc_tables()
    assert tabs, "groonga_ray/data/nfkc.npz missing"
    assert len(tabs["map1"]) > 4000
    assert len(tabs["map2"]) > 10000  # incl. enumerated Hangul pairs


def test_fullwidth_and_space():
    n, t, b = normalize("ＡＢＣ　ｄｅｆ１２３")
    assert n == "abcdef123"
    assert list(t) == [CHAR_ALPHA] * 6 + [CHAR_DIGIT] * 3
    # ideographic space maps to ' ' and flags the preceding char blank
    assert list(b) == [False, False, True, False, False, False, False, False, False]


def test_halfwidth_katakana_voicing():
    # half-width katakana + voiced sound marks compose: ｶﾞ -> ガ
    n, t, _ = normalize("ｶﾞｷﾞﾊﾟ")
    assert n == "ガギパ"
    assert list(t) == [CHAR_KATAKANA] * 3


def test_hiragana_voicing_compose():
    # か + combining U+3099 -> が (map2 pair)
    n, t, _ = normalize("がぎ")
    assert n == "がぎ"
    assert list(t) == [CHAR_HIRAGANA] * 2


def test_accent_casefold_and_compose():
    # precomposed upper -> lower; base + combining mark -> composed lower
    n, t, _ = normalize("ÀÉ àé")
    assert n == "àéàé"
    assert list(t) == [CHAR_ALPHA] * 4


def test_custom_rule_wave_dash():
    # nfkc-custom-rules.txt: WAVE DASH U+301C -> ASCII tilde
    n, t, _ = normalize("〜～")
    assert n == "~~"
    assert list(t) == [CHAR_SYMBOL] * 2


def test_compat_forms():
    n, _, _ = normalize("①㌔ﬁ")
    assert n == "1キロfi"
    n2, t2, _ = normalize("ﾊﾝｶｸとカタカナと漢字")
    assert n2 == "ハンカクとカタカナと漢字"
    assert list(t2) == (
        [CHAR_KATAKANA] * 4 + [CHAR_HIRAGANA] + [CHAR_KATAKANA] * 4
        + [CHAR_HIRAGANA] + [CHAR_KANJI] * 2
    )


def test_hangul_jamo_compose():
    # conjoining jamo compose algorithmically: L+V+T -> syllable
    n, _, _ = normalize("\u1112\u1161\u11ab")
    assert n == "\ud55c"
    n2, _, _ = normalize("\u1100\u1161")  # LV alone
    assert n2 == "\uac00"


def test_ascii_unchanged_vs_fallback():
    # ASCII behavior identical between table path and fallback
    s = "Hello, World! 42\tmixed_case TEXT"
    a = normalize(s)
    import groonga_ray.normalize as nm

    saved = nm._NFKC_TABLES
    nm._NFKC_TABLES = False  # force the unicodedata fallback
    try:
        f = normalize(s)
    finally:
        nm._NFKC_TABLES = saved
    assert a[0] == f[0]
    assert list(a[1]) == list(f[1])
    assert list(a[2]) == list(f[2])
