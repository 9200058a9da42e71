"""RK (romaji-kana) prefix matching — the GRN_CURSOR_RK cursor mode
the suggest plugin's completion pass uses over the ``kana`` reading
lexicon (reference: lib/pat.c grn_pat_cursor RK branch + plugins/
suggest/suggest.c:299-346 complete()).

A katakana reading key matches a query when the query — any mix of
romaji, hiragana and katakana — is a prefix of the reading: leading
kana characters of the query compare directly (hiragana folds to
katakana), and a romaji tail matches if it is a prefix of SOME
romanization of the remaining reading (both Hepburn and Kunrei
spellings are accepted, mirroring the reference's rk table).
"""

from __future__ import annotations

# single katakana -> romaji alternatives (Hepburn first, Kunrei second)
_KATA: dict[str, tuple[str, ...]] = {
    "ア": ("a",), "イ": ("i",), "ウ": ("u",), "エ": ("e",), "オ": ("o",),
    "カ": ("ka",), "キ": ("ki",), "ク": ("ku",), "ケ": ("ke",), "コ": ("ko",),
    "サ": ("sa",), "シ": ("shi", "si"), "ス": ("su",), "セ": ("se",),
    "ソ": ("so",),
    "タ": ("ta",), "チ": ("chi", "ti"), "ツ": ("tsu", "tu"), "テ": ("te",),
    "ト": ("to",),
    "ナ": ("na",), "ニ": ("ni",), "ヌ": ("nu",), "ネ": ("ne",), "ノ": ("no",),
    "ハ": ("ha",), "ヒ": ("hi",), "フ": ("fu", "hu"), "ヘ": ("he",),
    "ホ": ("ho",),
    "マ": ("ma",), "ミ": ("mi",), "ム": ("mu",), "メ": ("me",), "モ": ("mo",),
    "ヤ": ("ya",), "ユ": ("yu",), "ヨ": ("yo",),
    "ラ": ("ra",), "リ": ("ri",), "ル": ("ru",), "レ": ("re",), "ロ": ("ro",),
    "ワ": ("wa",), "ヰ": ("i", "wi"), "ヱ": ("e", "we"), "ヲ": ("wo", "o"),
    "ン": ("n",),
    "ガ": ("ga",), "ギ": ("gi",), "グ": ("gu",), "ゲ": ("ge",), "ゴ": ("go",),
    "ザ": ("za",), "ジ": ("ji", "zi"), "ズ": ("zu",), "ゼ": ("ze",),
    "ゾ": ("zo",),
    "ダ": ("da",), "ヂ": ("ji", "di"), "ヅ": ("zu", "du"), "デ": ("de",),
    "ド": ("do",),
    "バ": ("ba",), "ビ": ("bi",), "ブ": ("bu",), "ベ": ("be",), "ボ": ("bo",),
    "パ": ("pa",), "ピ": ("pi",), "プ": ("pu",), "ペ": ("pe",), "ポ": ("po",),
    "ヴ": ("vu",),
    "ァ": ("a",), "ィ": ("i",), "ゥ": ("u",), "ェ": ("e",), "ォ": ("o",),
    "ャ": ("ya",), "ュ": ("yu",), "ョ": ("yo",),
}

# two-character moras (consonant + small y/vowel)
_DIGRAPH: dict[str, tuple[str, ...]] = {
    "キャ": ("kya",), "キュ": ("kyu",), "キョ": ("kyo",),
    "シャ": ("sha", "sya"), "シュ": ("shu", "syu"), "ショ": ("sho", "syo"),
    "シェ": ("she",),
    "チャ": ("cha", "tya"), "チュ": ("chu", "tyu"), "チョ": ("cho", "tyo"),
    "チェ": ("che",),
    "ニャ": ("nya",), "ニュ": ("nyu",), "ニョ": ("nyo",),
    "ヒャ": ("hya",), "ヒュ": ("hyu",), "ヒョ": ("hyo",),
    "ミャ": ("mya",), "ミュ": ("myu",), "ミョ": ("myo",),
    "リャ": ("rya",), "リュ": ("ryu",), "リョ": ("ryo",),
    "ギャ": ("gya",), "ギュ": ("gyu",), "ギョ": ("gyo",),
    "ジャ": ("ja", "zya"), "ジュ": ("ju", "zyu"), "ジョ": ("jo", "zyo"),
    "ジェ": ("je",),
    "ビャ": ("bya",), "ビュ": ("byu",), "ビョ": ("byo",),
    "ピャ": ("pya",), "ピュ": ("pyu",), "ピョ": ("pyo",),
    "ティ": ("ti", "thi"), "ディ": ("di", "dhi"), "デュ": ("dyu",),
    "トゥ": ("tu",), "ドゥ": ("du",),
    "ファ": ("fa",), "フィ": ("fi",), "フェ": ("fe",), "フォ": ("fo",),
    "ウィ": ("wi",), "ウェ": ("we",), "ウォ": ("wo",),
}


def hira_to_kata(s: str) -> str:
    """Fold hiragana to katakana (U+3041-3096 -> +0x60)."""
    return "".join(
        chr(ord(c) + 0x60) if 0x3041 <= ord(c) <= 0x3096 else c for c in s
    )


def _is_kata(c: str) -> bool:
    return 0x30A0 <= ord(c) <= 0x30FF


def _mora_alts(kana: str) -> list[tuple[str, ...]]:
    """Reading -> per-mora romaji alternative lists. Sokuon doubles the
    next mora's initial consonant; the long-vowel mark accepts being
    dropped or spelled as a repeat marker."""
    out: list[tuple[str, ...]] = []
    i, sokuon = 0, False
    while i < len(kana):
        two = kana[i:i + 2]
        if two in _DIGRAPH:
            alts = _DIGRAPH[two]
            i += 2
        else:
            c = kana[i]
            i += 1
            if c == "ッ":
                sokuon = True
                continue
            if c == "ー":
                out.append(("", "-"))
                continue
            alts = _KATA.get(c, (c.lower(),))
        if sokuon:
            alts = tuple(a[0] + a for a in alts)
            sokuon = False
        out.append(alts)
    return out


def _romaji_prefix(q: str, moras: list[tuple[str, ...]]) -> bool:
    """Is ascii ``q`` a prefix of some romanization of ``moras``?"""
    if not q:
        return True
    if not moras:
        return False
    for a in moras[0]:
        if not a:
            if _romaji_prefix(q, moras[1:]):
                return True
        elif q.startswith(a):
            if _romaji_prefix(q[len(a):], moras[1:]):
                return True
        elif a.startswith(q):
            return True
    return False


def rk_prefix_match(query: str, kana: str) -> bool:
    """GRN_CURSOR_PREFIX|GRN_CURSOR_RK: does the katakana reading
    ``kana`` start with ``query`` (romaji / hiragana / katakana mix)?
    Query should already be normalizer-folded (lowercase, halfwidth)."""
    q = hira_to_kata(query)
    i = 0
    while i < len(q) and _is_kata(q[i]):
        if i >= len(kana) or kana[i] != q[i]:
            return False
        i += 1
    rest = q[i:].lower()
    if not rest:
        return True
    return _romaji_prefix(rest, _mora_alts(kana[i:]))
