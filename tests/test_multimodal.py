"""Real stdlib media decode (wav/png/bmp/ppm) + fallback contract."""

import numpy as np
import pyarrow as pa

from groonga_ray.pipelines.multimodal import (
    decode_payload, synth_bmp, synth_png, synth_ppm, synth_wav,
)


def test_wav_decode_features():
    f = decode_payload(synth_wav(freq_hz=440, rate=8000, n=8000), "audio")
    assert f["decoder"] == "wav"
    assert f["sample_rate"] == 8000 and f["channels"] == 1
    assert f["duration_ms"] == 1000
    # sine RMS = amplitude/sqrt(2); amplitude 32000/32768
    assert abs(f["rms"] - (32000 / 32768) / np.sqrt(2)) < 1e-3


def test_png_decode_pixels():
    f = decode_payload(synth_png(7, 5, (10, 200, 30)), "image")
    assert f["decoder"] == "png"
    assert (f["width"], f["height"], f["channels"]) == (7, 5, 3)
    assert abs(f["mean_px"] - np.mean([10, 200, 30])) < 1e-9


def test_bmp_ppm_decode():
    f = decode_payload(synth_bmp(6, 4), "image")
    assert (f["decoder"], f["width"], f["height"], f["channels"]) == ("bmp", 6, 4, 3)
    g = decode_payload(synth_ppm(3, 2), "image")
    assert (g["decoder"], g["width"], g["height"]) == ("ppm", 3, 2)


def test_fallback_for_unknown_container():
    f = decode_payload(b"\xff\xd8\xff\xe0 jpeg-ish", "image")
    assert f["decoder"] == "fallback" and f["n_bytes"] == 13


def test_decoder_stage_over_dataset(ray_session):
    import ray.data

    from groonga_ray.pipelines.multimodal import decode_media

    rows = [
        {"media_id": 1, "kind": "audio", "payload": synth_wav(n=800), "meta": "{}"},
        {"media_id": 2, "kind": "image", "payload": synth_png(4, 4), "meta": "{}"},
        {"media_id": 3, "kind": "image", "payload": b"unknown", "meta": "{}"},
    ]
    out = {r["media_id"]: r for r in decode_media(ray.data.from_items(rows)).take_all()}
    assert out[1]["decoder"] == "wav" and out[1]["sample_rate"] == 8000
    assert out[2]["decoder"] == "png" and out[2]["width"] == 4
    assert out[3]["decoder"] == "fallback"
