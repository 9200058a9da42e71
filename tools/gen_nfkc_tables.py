#!/usr/bin/env python3
"""Generate groonga_ray/data/nfkc.npz from the reference's generated
NFKC tables (lib/nfkc.c — machine-generated Unicode data emitted by
lib/nfkc.rb from the Unicode Character Database plus
nfkc-custom-rules.txt; data, not hand-written code).

The three generated functions are compiled as-is into a throwaway
shared object, then PROBED through ctypes:

* ``char_type``  — grn_nfkc_char_type over every codepoint,
* ``map1``       — grn_nfkc_map1 (NFKC decompose + casefold) over
                   every codepoint,
* ``map2``       — grn_nfkc_compose pairs. The pair domain is derived
                   from unicodedata's canonical decompositions (the
                   canonical composition set is frozen since Unicode
                   3.1, so the derivation is version-stable); each
                   candidate (prefix, suffix) is probed with both the
                   original and the map1'd prefix, since the
                   normalizer composes over the already-mapped stream.

Output: a compact npz the runtime normalizer loads once
(groonga_ray/normalize.py) for byte-exact non-ASCII parity with the
reference's NormalizerAuto. Re-run this tool only when the reference
tables change.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import unicodedata

import numpy as np

REF = os.environ.get("GROONGA_REF", "/root/reference")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "groonga_ray", "data", "nfkc.npz",
)

STUB_HEADER = """
#include <string.h>
typedef int grn_char_type;
enum {
  GRN_CHAR_NULL = 0, GRN_CHAR_ALPHA, GRN_CHAR_DIGIT, GRN_CHAR_SYMBOL,
  GRN_CHAR_HIRAGANA, GRN_CHAR_KATAKANA, GRN_CHAR_KANJI, GRN_CHAR_OTHERS
};
"""


def build_so(tmpdir: str) -> str:
    src = open(os.path.join(REF, "lib", "nfkc.c")).read()
    # keep only the three generated functions (drop grn.h include and
    # the GRN_WITH_NFKC guard)
    start = src.index("grn_char_type\ngrn_nfkc_char_type")
    end = src.rindex("#endif")
    body = src[start:end]
    cpath = os.path.join(tmpdir, "nfkc_probe.c")
    with open(cpath, "w") as fh:
        fh.write(STUB_HEADER + body)
    sopath = os.path.join(tmpdir, "nfkc_probe.so")
    subprocess.run(
        ["gcc", "-O1", "-shared", "-fPIC", "-o", sopath, cpath], check=True
    )
    return sopath


def main() -> None:
    with tempfile.TemporaryDirectory() as td:
        lib = ctypes.CDLL(build_so(td))
        lib.grn_nfkc_char_type.restype = ctypes.c_int
        lib.grn_nfkc_char_type.argtypes = [ctypes.c_char_p]
        lib.grn_nfkc_map1.restype = ctypes.c_char_p
        lib.grn_nfkc_map1.argtypes = [ctypes.c_char_p]
        lib.grn_nfkc_map2.restype = ctypes.c_char_p
        lib.grn_nfkc_map2.argtypes = [ctypes.c_char_p, ctypes.c_char_p]

        n_cp = 0x110000
        ctype = np.zeros(n_cp, np.uint8)
        map1_cp: list[int] = []
        map1_str: list[str] = []
        for cp in range(n_cp):
            if 0xD800 <= cp <= 0xDFFF:
                continue
            b = chr(cp).encode("utf-8")
            ctype[cp] = lib.grn_nfkc_char_type(b)
            m = lib.grn_nfkc_map1(b)
            if m is not None:
                map1_cp.append(cp)
                map1_str.append(m.decode("utf-8"))

        # map2 pair probing over the canonical composition domain
        pairs: set[tuple[str, str]] = set()
        m1 = dict(zip(map1_cp, map1_str))
        for cp in range(n_cp):
            if 0xD800 <= cp <= 0xDFFF:
                continue
            d = unicodedata.decomposition(chr(cp))
            if not d or d.startswith("<"):
                continue
            parts = d.split()
            if len(parts) != 2:
                continue
            a, b = chr(int(parts[0], 16)), chr(int(parts[1], 16))
            for prefix in {a, a.lower(), m1.get(ord(a), a)}:
                if len(prefix) == 1:
                    pairs.add((prefix, b))
        # Hangul composition is ALGORITHMIC in Unicode (not enumerated
        # by unicodedata.decomposition), but the generated table spells
        # it out: probe L+V and LV+T pairs explicitly
        for L in range(0x1100, 0x1113):
            for V in range(0x1161, 0x1176):
                pairs.add((chr(L), chr(V)))
        for s in range(0xAC00, 0xD7A4, 28):  # LV syllables (T index 0)
            for T in range(0x11A8, 0x11C3):
                pairs.add((chr(s), chr(T)))
        map2_pre: list[str] = []
        map2_suf: list[str] = []
        map2_out: list[str] = []
        for prefix, suffix in sorted(pairs):
            r = lib.grn_nfkc_map2(prefix.encode("utf-8"), suffix.encode("utf-8"))
            if r is not None:
                map2_pre.append(prefix)
                map2_suf.append(suffix)
                map2_out.append(r.decode("utf-8"))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        char_type=ctype,
        map1_cp=np.array(map1_cp, np.int32),
        map1_str=np.array(map1_str, object),
        map2_pre=np.array(map2_pre, object),
        map2_suf=np.array(map2_suf, object),
        map2_out=np.array(map2_out, object),
    )
    print(
        f"wrote {OUT}: {len(map1_cp)} map1 entries, "
        f"{len(map2_out)} map2 pairs, {os.path.getsize(OUT)} bytes"
    )


if __name__ == "__main__":
    sys.exit(main())
