"""Text normalization with per-char type flags (NormalizerAuto-like).

Semantics modeled on the reference's NormalizerAuto / utf8_normalize
(reference lib/normalizer.c:616-757): NFKC-normalize, lowercase,
REMOVE_BLANK (whitespace is dropped from the normalized string and the
*preceding* emitted character is flagged BLANK), and WITH_TYPES (a char
class per normalized character: ALPHA/DIGIT/SYMBOL/KANJI/...).

Parity scope: the tokenizer path (:func:`normalize`) is byte-exact
against the reference for BOTH ASCII and non-ASCII when
``data/nfkc.npz`` is present — a compact dump of the reference's
generated nfkc.c tables (lib/nfkc.c:26 char types, :9693 map1,
:24478 map2; produced by tools/gen_nfkc_tables.py, which compiles and
probes the generated functions). Without the data file, or for
:func:`normalize_detailed` (the normalize *command*'s checks view),
non-ASCII falls back to Python's unicodedata NFKC + category classes.
"""

from __future__ import annotations

import os
import unicodedata

import numpy as np

_NFKC_TABLES: "dict | None | bool" = None


def _nfkc_tables():
    """Lazy-load the reference-exact NFKC tables; False when absent."""
    global _NFKC_TABLES
    if _NFKC_TABLES is None:
        path = os.path.join(os.path.dirname(__file__), "data", "nfkc.npz")
        if os.path.exists(path):
            z = np.load(path, allow_pickle=True)
            _NFKC_TABLES = {
                "ctype": z["char_type"],
                "map1": dict(zip(z["map1_cp"].tolist(), z["map1_str"].tolist())),
                "map2": {
                    (p, s): o
                    for p, s, o in zip(z["map2_pre"], z["map2_suf"], z["map2_out"])
                },
            }
        else:
            _NFKC_TABLES = False
    return _NFKC_TABLES

# char classes, same ordering idea as grn_char_type (groonga.h)
CHAR_NULL = 0
CHAR_ALPHA = 1
CHAR_DIGIT = 2
CHAR_SYMBOL = 3
CHAR_HIRAGANA = 4
CHAR_KATAKANA = 5
CHAR_KANJI = 6
CHAR_OTHERS = 7


def _char_class(ch: str) -> int:
    o = ord(ch)
    if o < 128:
        if ch.isalpha():
            return CHAR_ALPHA
        if ch.isdigit():
            return CHAR_DIGIT
        if ch.isspace():
            return CHAR_NULL  # handled as blank by caller
        if 33 <= o <= 126:
            return CHAR_SYMBOL
        return CHAR_OTHERS
    if 0x3040 <= o <= 0x309F:
        return CHAR_HIRAGANA
    if 0x30A0 <= o <= 0x30FF:
        return CHAR_KATAKANA
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
        return CHAR_KANJI
    cat = unicodedata.category(ch)
    if cat.startswith("L"):
        return CHAR_ALPHA
    if cat.startswith("N"):
        return CHAR_DIGIT
    if cat.startswith("P") or cat in ("Sm", "Sc", "Sk"):
        return CHAR_SYMBOL  # "So" (emoji etc.) is others in the reference
    if cat.startswith("Z"):
        return CHAR_NULL
    return CHAR_OTHERS


def normalize(text: str, nfkc: bool = True) -> tuple[str, np.ndarray, np.ndarray]:
    """Return ``(normalized, classes, blanks)``.

    * ``normalized``: NFKC + lowercased text with whitespace removed,
    * ``classes``: uint8 char class per normalized character,
    * ``blanks``: bool per normalized character — True when whitespace
      followed this character in the source (the reference's
      GRN_STR_ISBLANK bit, set on the preceding char because blanks
      themselves are removed under GRN_STRING_REMOVE_BLANK).
    """
    tabs = _nfkc_tables() if nfkc else False
    if tabs:
        return _normalize_tables(text, tabs)
    if nfkc:
        text = unicodedata.normalize("NFKC", text)
    text = text.lower()
    out_chars: list[str] = []
    classes: list[int] = []
    blanks: list[bool] = []
    for ch in text:
        cls = _char_class(ch)
        if cls == CHAR_NULL and (ch.isspace() or ch == "\x00"):
            if out_chars:
                blanks[-1] = True
            continue
        out_chars.append(ch)
        classes.append(cls)
        blanks.append(False)
    return "".join(out_chars), np.array(classes, np.uint8), np.array(blanks, bool)


def _normalize_tables(text: str, tabs: dict) -> tuple[str, np.ndarray, np.ndarray]:
    """Reference-exact utf8_normalize (lib/normalizer.c:616-757) over
    the dumped nfkc.c tables: map1 per source char (NFKC decompose +
    casefold), map2 pairwise composition against the LAST EMITTED char
    (on match the composite replaces both the previous char and the
    whole mapped sequence, exactly as the C replaces p with p2), then
    blank removal (' ' and unprintable ASCII flag the preceding char)
    with grn_nfkc_char_type per emitted char."""
    map1, map2, ctype = tabs["map1"], tabs["map2"], tabs["ctype"]
    out_chars: list[str] = []
    classes: list[int] = []
    blanks: list[bool] = []
    for ch in text:
        seq = map1.get(ord(ch), ch)
        if out_chars and seq:
            comp = map2.get((out_chars[-1], seq[0]))
            if comp is not None:
                out_chars.pop()
                classes.pop()
                blanks.pop()
                seq = comp
        for c in seq:
            if c == " " or ord(c) < 0x20:
                if out_chars:
                    blanks[-1] = True
                continue
            out_chars.append(c)
            classes.append(int(ctype[ord(c)]))
            blanks.append(False)
    return "".join(out_chars), np.array(classes, np.uint8), np.array(blanks, bool)


TYPE_NAMES = {
    CHAR_NULL: "null", CHAR_ALPHA: "alpha", CHAR_DIGIT: "digit",
    CHAR_SYMBOL: "symbol", CHAR_HIRAGANA: "hiragana",
    CHAR_KATAKANA: "katakana", CHAR_KANJI: "kanji", CHAR_OTHERS: "others",
}


def normalize_detailed(
    text: str, remove_blank: bool = False, remove_tokenized_delimiter: bool = False
) -> tuple[str, list[int], list[int]]:
    """The normalize *command*'s view (proc_normalize,
    lib/proc.c:3896-3955): returns ``(normalized, classes, checks)``
    where ``classes`` has one char class per normalized character and
    ``checks`` follows grn_string's per-normalized-byte offset scheme
    (lib/str.c / normalizer.c WITH_CHECKS): the first byte of a
    normalized char carries the number of source bytes consumed for it
    (including preceding removed blanks), continuation bytes carry 0,
    and extra chars expanded from the same source char carry -1.

    Unlike :func:`normalize` (the tokenizer path, which always removes
    blanks), blanks are kept unless ``remove_blank`` — the command's
    default output keeps them, reference normalize/ascii.test.

    Mapping is per source character (NFKC + lower per char), matching
    the reference's table-per-character model."""
    out: list[str] = []
    classes: list[int] = []
    checks: list[int] = []
    pending_blank = 0
    for ch in text:
        if remove_tokenized_delimiter and ch == "￾":
            # GRN_STRING_REMOVE_TOKENIZED_DELIMITER (U+FFFE markers)
            pending_blank += len(ch.encode("utf-8"))
            continue
        if ch.isspace() or ch == "\x00":
            if remove_blank:
                pending_blank += len(ch.encode("utf-8"))
                continue
            mapped = ch
        else:
            mapped = unicodedata.normalize("NFKC", ch).lower()
            if not mapped:
                pending_blank += len(ch.encode("utf-8"))
                continue
        src_bytes = len(ch.encode("utf-8")) + pending_blank
        pending_blank = 0
        for j, mch in enumerate(mapped):
            out.append(mch)
            cls = _char_class(mch)
            classes.append(CHAR_OTHERS if cls == CHAR_NULL else cls)
            nbytes = len(mch.encode("utf-8"))
            checks.append(src_bytes if j == 0 else -1)
            checks.extend([0] * (nbytes - 1))
    return "".join(out), classes, checks


# ------------------------------------------------------------ registry

CUSTOM_NORMALIZERS: dict[str, object] = {}


def register_normalizer(name: str, fn) -> None:
    """Plugin surface (grn_normalizer_register,
    include/groonga/normalizer.h:32): ``fn(text) -> (normalized,
    classes, blanks)`` with the same tuple contract as
    :func:`normalize`; addressable by name wherever a normalizer name
    is taken."""
    CUSTOM_NORMALIZERS[name] = fn


def is_known_normalizer(name: str) -> bool:
    """True iff ``name`` is a built-in or registered normalizer."""
    return name in CUSTOM_NORMALIZERS or name in (
        "NormalizerAuto", "NormalizerNFKC100", "NormalizerNFKC51",
        "NormalizerNone",
    )


def normalize_as(text: str, normalizer: str = "NormalizerAuto"):
    """Dispatch by normalizer name (NormalizerAuto/NormalizerNFKC100
    are the built-in; custom names resolve via the registry)."""
    if normalizer in CUSTOM_NORMALIZERS:
        return CUSTOM_NORMALIZERS[normalizer](text)
    if normalizer in ("NormalizerAuto", "NormalizerNFKC100", "NormalizerNFKC51"):
        return normalize(text, nfkc=True)
    raise ValueError(f"unknown normalizer {normalizer!r}")
