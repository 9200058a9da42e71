"""Text normalization with per-char type flags (NormalizerAuto-like).

Semantics modeled on the reference's NormalizerAuto / utf8_normalize
(reference lib/normalizer.c:616-757): NFKC-normalize, lowercase,
REMOVE_BLANK (whitespace is dropped from the normalized string and the
*preceding* emitted character is flagged BLANK), and WITH_TYPES (a char
class per normalized character: ALPHA/DIGIT/SYMBOL/KANJI/...).

Parity scope: exact for ASCII (which is what the code corpus and the
reference's ASCII golden tests exercise); non-ASCII uses Python's
unicodedata NFKC + category classes rather than the reference's
generated nfkc.c tables.
"""

from __future__ import annotations

import unicodedata

import numpy as np

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
