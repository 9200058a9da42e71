"""MessagePack output: codec round-trips + the HTTP server's
``output_type=msgpack`` / ``.msgpack`` suffix carrying the same
envelope the JSON path serializes (lib/output.c msgpack_pack_* over
the identical element stream; mime lib/ctx.c:1130)."""
import struct

import pytest

from groonga_ray.msgpackio import pack, unpack


@pytest.mark.parametrize(
    "value",
    [
        None,
        True,
        False,
        0,
        1,
        127,
        128,
        255,
        256,
        65536,
        2**32,
        2**63 - 1,
        -1,
        -32,
        -33,
        -129,
        -32769,
        -(2**31) - 1,
        3.14,
        -0.0,
        1e300,
        "",
        "hello",
        "x" * 31,
        "x" * 32,
        "y" * 300,
        "z" * 70000,
        "ユニコード",
        b"",
        b"\x00\xff" * 10,
        [],
        [1, "two", 3.0, None, True],
        list(range(20)),
        {},
        {"a": 1, "b": [2, {"c": None}]},
        [[0, 0.01, 0.002], [[3], [["_id", "UInt32"]], [1], [2]]],
    ],
)
def test_roundtrip(value):
    assert unpack(pack(value)) == value


def test_wire_format_pins():
    # spot-pin encodings against the public spec
    assert pack(5) == b"\x05"
    assert pack(-1) == b"\xff"
    assert pack(None) == b"\xc0"
    assert pack(True) == b"\xc3"
    assert pack("ab") == b"\xa2ab"
    assert pack([1, 2]) == b"\x92\x01\x02"
    assert pack({"a": 1}) == b"\x81\xa1a\x01"
    assert pack(1.5) == b"\xcb" + struct.pack(">d", 1.5)
    assert pack(200) == b"\xcc\xc8"
    assert pack(70000) == b"\xce\x00\x01\x11p"


def test_trailing_bytes_rejected():
    with pytest.raises(ValueError):
        unpack(pack(1) + b"\x01")
