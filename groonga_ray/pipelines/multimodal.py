"""Multimodal column plumbing: opaque binary payloads + typed metadata
processed by actor-pool map_batches stages.

The image/audio codecs are NOT available in this environment, so the
decode kernel is stubbed (clearly marked); everything around it — the
schema contract (binary column + metadata), batch sizing for large
payloads, the actor signature, and the output layout — is real and
tested. Swap ``_decode_stub`` for a PIL/libsndfile call on a cluster
with the codecs installed.
"""

from __future__ import annotations

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


def _decode_stub(payload: bytes, kind: str) -> dict:
    """STUB — deterministic fake decode. A real implementation would be
    e.g. PIL.Image.open for images; raise if someone expects real
    pixels."""
    crc = zlib.crc32(payload)
    return {
        "n_bytes": len(payload),
        "crc32": crc,
        "fake_width": 1 + crc % 64,
        "fake_height": 1 + (crc >> 8) % 64,
    }


class MediaDecoder:
    """Actor-pool stage: per batch, decode payloads to feature columns.

    Use small ``batch_size`` (payloads are large) and
    ``concurrency=N`` actors; construction cost (codec init) is paid
    once per actor.
    """

    def __init__(self, real_codecs_required: bool = False):
        if real_codecs_required:
            raise NotImplementedError(
                "image/audio codecs are not installed in this environment; "
                "the decode kernel is stubbed (see _decode_stub)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = [_decode_stub(p or b"", k) for p, k in zip(payloads, kinds)]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array([f["n_bytes"] for f in feats], pa.int64()),
                "crc32": pa.array([f["crc32"] for f in feats], pa.uint32()),
                "width": pa.array([f["fake_width"] for f in feats], pa.int32()),
                "height": pa.array([f["fake_height"] for f in feats], pa.int32()),
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
