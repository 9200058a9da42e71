"""Minimal MessagePack encode/decode (spec: msgpack.org — public).

The reference serializes the same command envelope it renders as JSON
through msgpack_pack_* calls (lib/output.c:85-105, array/map/scalar
per element; mime ``application/x-msgpack``, suffix routing
lib/ctx.c:1237-1239). The container ships no msgpack library, so this
is a small self-contained packer/unpacker for the value shapes the
envelope uses: nil, bool, int, float, str, bytes, list, dict.
"""

from __future__ import annotations

import struct


def pack(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(o, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(0x100 + o)
        elif 0 <= o <= 0xFF:
            out += b"\xcc" + o.to_bytes(1, "big")
        elif 0 <= o <= 0xFFFF:
            out += b"\xcd" + o.to_bytes(2, "big")
        elif 0 <= o <= 0xFFFFFFFF:
            out += b"\xce" + o.to_bytes(4, "big")
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + o.to_bytes(8, "big")
        elif -0x80 <= o:
            out += b"\xd0" + o.to_bytes(1, "big", signed=True)
        elif -0x8000 <= o:
            out += b"\xd1" + o.to_bytes(2, "big", signed=True)
        elif -0x80000000 <= o:
            out += b"\xd2" + o.to_bytes(4, "big", signed=True)
        else:
            out += b"\xd3" + o.to_bytes(8, "big", signed=True)
    elif isinstance(o, float):
        out += b"\xcb" + struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += b"\xd9" + n.to_bytes(1, "big")
        elif n <= 0xFFFF:
            out += b"\xda" + n.to_bytes(2, "big")
        else:
            out += b"\xdb" + n.to_bytes(4, "big")
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out += b"\xc4" + n.to_bytes(1, "big")
        elif n <= 0xFFFF:
            out += b"\xc5" + n.to_bytes(2, "big")
        else:
            out += b"\xc6" + n.to_bytes(4, "big")
        out += bytes(o)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + n.to_bytes(2, "big")
        else:
            out += b"\xdd" + n.to_bytes(4, "big")
        for v in o:
            _pack(v, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + n.to_bytes(2, "big")
        else:
            out += b"\xdf" + n.to_bytes(4, "big")
        for k, v in o.items():
            _pack(k, out)
            _pack(v, out)
    else:
        # numpy scalars and the like: degrade through float/int/str
        try:
            import numpy as np

            if isinstance(o, np.integer):
                return _pack(int(o), out)
            if isinstance(o, np.floating):
                return _pack(float(o), out)
        except ImportError:
            pass
        raise TypeError(f"msgpack: unsupported type {type(o).__name__}")


def unpack(data: bytes):
    v, off = _unpack(memoryview(data), 0)
    if off != len(data):
        raise ValueError(f"msgpack: {len(data) - off} trailing bytes")
    return v


def _unpack(mv: memoryview, off: int):
    b = mv[off]
    off += 1
    if b <= 0x7F:
        return b, off
    if b >= 0xE0:
        return b - 0x100, off
    if 0x80 <= b <= 0x8F:
        return _unpack_map(mv, off, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(mv, off, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return str(mv[off:off + n], "utf-8"), off + n
    if b == 0xC0:
        return None, off
    if b == 0xC2:
        return False, off
    if b == 0xC3:
        return True, off
    if b in (0xC4, 0xC5, 0xC6):
        w = 1 << (b - 0xC4)
        n = int.from_bytes(mv[off:off + w], "big")
        off += w
        return bytes(mv[off:off + n]), off + n
    if b == 0xCA:
        return struct.unpack(">f", mv[off:off + 4])[0], off + 4
    if b == 0xCB:
        return struct.unpack(">d", mv[off:off + 8])[0], off + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        w = 1 << (b - 0xCC)
        return int.from_bytes(mv[off:off + w], "big"), off + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        w = 1 << (b - 0xD0)
        return int.from_bytes(mv[off:off + w], "big", signed=True), off + w
    if b in (0xD9, 0xDA, 0xDB):
        w = 1 << (b - 0xD9)
        n = int.from_bytes(mv[off:off + w], "big")
        off += w
        return str(mv[off:off + n], "utf-8"), off + n
    if b in (0xDC, 0xDD):
        w = 2 << (b - 0xDC)
        n = int.from_bytes(mv[off:off + w], "big")
        return _unpack_array(mv, off + w, n)
    if b in (0xDE, 0xDF):
        w = 2 << (b - 0xDE)
        n = int.from_bytes(mv[off:off + w], "big")
        return _unpack_map(mv, off + w, n)
    raise ValueError(f"msgpack: unsupported byte 0x{b:02x}")


def _unpack_array(mv: memoryview, off: int, n: int):
    out = []
    for _ in range(n):
        v, off = _unpack(mv, off)
        out.append(v)
    return out, off


def _unpack_map(mv: memoryview, off: int, n: int):
    out = {}
    for _ in range(n):
        k, off = _unpack(mv, off)
        v, off = _unpack(mv, off)
        out[k] = v
    return out, off
