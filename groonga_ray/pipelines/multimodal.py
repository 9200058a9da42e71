"""Multimodal column plumbing: opaque binary payloads + typed metadata
processed by actor-pool map_batches stages.

Formats the standard library can decode are decoded FOR REAL: WAV
(RIFF PCM), BMP (uncompressed 24/32-bit), PPM (P6), and PNG
(zlib-inflated, non-interlaced 8-bit gray/RGB/RGBA, numpy unfilter).
Payloads whose container needs an external codec (JPEG, MP3, video —
not installed in this environment) fall through to a clearly-labeled
deterministic fallback that records size/crc only; the schema
contract, batch sizing for large payloads, the actor signature and the
output layout are identical either way, so swapping the fallback for a
PIL/libsndfile call is a one-function change on a cluster that has
the codecs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.large_binary()),
        ("meta", pa.string()),        # JSON sidecar
    ]
)


def _decode_wav(payload: bytes) -> dict | None:
    """RIFF/WAVE PCM: fmt + data chunks (no codec needed)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None or fmt[0] != 1:   # PCM only
        return None
    _, channels, rate, _, _, bits = fmt
    if bits == 16:
        samples = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        return None
    n = len(samples) // max(channels, 1)
    rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
    return {
        "decoder": "wav", "channels": channels, "sample_rate": rate,
        "duration_ms": int(n * 1000 / max(rate, 1)), "rms": round(rms, 6),
    }


def _decode_bmp(payload: bytes) -> dict | None:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    off, hdr = struct.unpack_from("<I", payload, 10)[0], struct.unpack_from("<I", payload, 14)[0]
    if hdr < 40:
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        return None
    return {"decoder": "bmp", "width": int(w), "height": abs(int(h)), "channels": bpp // 8}


def _decode_ppm(payload: bytes) -> dict | None:
    """P6 binary PPM."""
    if not payload.startswith(b"P6"):
        return None
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        try:
            fields.append(int(payload[i:j]))
        except ValueError:
            return None
        i = j
    if len(fields) < 3:
        return None
    w, h, _ = fields
    return {"decoder": "ppm", "width": w, "height": h, "channels": 3}


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png(payload: bytes) -> dict | None:
    """Non-interlaced 8-bit gray/RGB/gray+A/RGBA PNG: stdlib zlib
    inflate + vectorized unfilter (real pixels, real mean)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i = 8
    idat = b""
    w = h = bit = ctype = interlace = None
    while i + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, i)
        cid = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + clen]
        if cid == b"IHDR":
            w, h, bit, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        i += 12 + clen
    if w is None or bit != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        return None
    ch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):                 # filters are row-sequential by spec
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        f = ftypes[y]
        if f == 0:
            line = cur
        elif f == 2:                   # Up (vectorized)
            line = (cur + prior) & 0xFF
        else:                          # Sub/Average/Paeth need left pixel
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else c)
                line[x] = (cur[x] + pred) & 0xFF
        out[y] = line
    return {
        "decoder": "png", "width": int(w), "height": int(h), "channels": ch,
        "mean_px": round(float(out.mean()), 3),
    }


def _decode_fallback(payload: bytes, kind: str) -> dict:
    """FALLBACK — container needs a codec not installed here (JPEG,
    MP3, video). Deterministic size/crc features only; swap for
    PIL/libsndfile on a cluster with the codecs."""
    crc = zlib.crc32(payload)
    return {"decoder": "fallback", "n_bytes": len(payload), "crc32": crc}


def decode_payload(payload: bytes, kind: str) -> dict:
    """Magic-byte dispatch to a real stdlib decoder, else fallback."""
    payload = payload or b""
    for dec in (_decode_wav, _decode_png, _decode_bmp, _decode_ppm):
        got = dec(payload)
        if got is not None:
            got["n_bytes"] = len(payload)
            got["crc32"] = zlib.crc32(payload)
            return got
    return _decode_fallback(payload, kind)


class MediaDecoder:
    """Actor-pool stage: per batch, decode payloads to feature columns.

    Use small ``batch_size`` (payloads are large) and
    ``concurrency=N`` actors; construction cost (codec init) is paid
    once per actor.
    """

    def __init__(self, real_codecs_required: bool = False):
        if real_codecs_required:
            raise NotImplementedError(
                "only stdlib-decodable containers (wav/png/bmp/ppm) decode "
                "for real in this environment; JPEG/MP3/video fall back to "
                "size/crc features (see _decode_fallback)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = [decode_payload(p, k) for p, k in zip(payloads, kinds)]

        def col(key, typ):
            return pa.array([f.get(key) for f in feats], typ)

        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "decoder": col("decoder", pa.string()),
                "n_bytes": col("n_bytes", pa.int64()),
                "crc32": col("crc32", pa.uint32()),
                "width": col("width", pa.int32()),
                "height": col("height", pa.int32()),
                "channels": col("channels", pa.int32()),
                "sample_rate": col("sample_rate", pa.int32()),
                "duration_ms": col("duration_ms", pa.int32()),
                "rms": col("rms", pa.float64()),
                "mean_px": col("mean_px", pa.float64()),
            }
        )


def decode_media(ds: ray.data.Dataset, concurrency: int = 2, batch_size: int = 64) -> ray.data.Dataset:
    return ds.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def texts_as_media(ds: ray.data.Dataset, text_col="text", id_col="doc_id") -> ray.data.Dataset:
    """Adapter for testing: wrap a text column as fake binary payloads
    with the MEDIA_SCHEMA contract."""

    def wrap(batch: pa.Table) -> pa.Table:
        payload = pa.array(
            [t.encode() if t else b"" for t in batch.column(text_col).to_pylist()],
            pa.large_binary(),
        )
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch.column(id_col).cast(pa.int64()),
                "kind": pa.array(["image"] * n),
                "payload": payload,
                "meta": pa.array(["{}"] * n),
            }
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


# ------------------------------------------------ synthesis (tests/bench)

def synth_wav(freq_hz: float = 440.0, rate: int = 8000, n: int = 8000) -> bytes:
    """Real RIFF PCM16 mono sine — exercised by the wav decoder."""
    t = np.arange(n) / rate
    samples = (np.sin(2 * np.pi * freq_hz * t) * 32000).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(samples)) + samples


def synth_png(w: int = 7, h: int = 5, rgb=(10, 200, 30)) -> bytes:
    """Real non-interlaced 8-bit RGB PNG (filter 0 rows)."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + cid + body + struct.pack(
            ">I", zlib.crc32(cid + body)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    row = bytes([0]) + bytes(rgb) * w
    idat = zlib.compress(row * h)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synth_bmp(w: int = 6, h: int = 4) -> bytes:
    """Real uncompressed 24-bit BMP."""
    stride = (w * 3 + 3) & ~3
    pixels = (b"\x40\x80\xc0" * w + b"\x00" * (stride - w * 3)) * h
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def synth_ppm(w: int = 3, h: int = 2) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + bytes([1, 2, 3]) * (w * h)
