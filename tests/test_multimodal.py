"""Multimodal codec + plumbing: REAL PNG/WAV decode (pure stdlib), Arrow
batch shape, corrupt→NULL dead-lettering, thumbnail resample."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ethereum_etl_spark.operators.multimodal import (
    _decode_png,
    _decode_wav,
    _paeth,
    encode_png,
    encode_wav,
    extract_media_features,
    resize_images,
    synthesize_media,
)


def test_png_roundtrip_grey_and_rgb():
    g = (np.arange(24 * 17, dtype=np.uint8) % 251).reshape(24, 17)
    w, h, px = _decode_png(encode_png(g))
    assert (w, h) == (17, 24)
    assert np.array_equal(px[:, :, 0], g)

    rgb = np.stack([g, g[::-1], np.full_like(g, 9)], axis=2)
    w, h, px = _decode_png(encode_png(rgb))
    assert px.shape == (24, 17, 3)
    assert np.array_equal(px, rgb)


def _filter_row(f, row, prev, ch):
    """Reference ENCODER for PNG filters 0-4 (the inverse of the decoder
    under test) — applied per spec to raw scanlines."""
    out = bytearray([f])
    for i, x in enumerate(row):
        left = row[i - ch] if i >= ch else 0
        up = prev[i]
        ul = prev[i - ch] if i >= ch else 0
        if f == 0:
            out.append(x)
        elif f == 1:
            out.append((x - left) & 0xFF)
        elif f == 2:
            out.append((x - up) & 0xFF)
        elif f == 3:
            out.append((x - ((left + up) >> 1)) & 0xFF)
        else:
            out.append((x - _paeth(left, up, ul)) & 0xFF)
    return bytes(out)


def test_png_decode_inverts_all_filters():
    """Hand-encode a PNG whose scanlines cycle through filters 1-4 (our
    writer only emits 0) and assert the decoder recovers the exact pixels."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(8, 5, 3), dtype=np.uint8)
    h, w, ch = img.shape
    raw, prev = b"", bytes(w * ch)
    for y in range(h):
        row = img[y].tobytes()
        raw += _filter_row(1 + y % 4, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    dw, dh, px = _decode_png(payload)
    assert (dw, dh) == (w, h)
    assert np.array_equal(px, img)


def test_png_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        _decode_png(b"JFIF not a png")
    good = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        _decode_png(good[: len(good) // 2])


def test_wav_roundtrip_and_rms():
    s = (1000 * np.sin(np.arange(500) * 0.05)).astype(np.int16)
    n, rate, out = _decode_wav(encode_wav(s, rate=8000))
    assert (n, rate) == (500, 8000)
    assert np.array_equal(out, s)
    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxNOPE")


def test_extract_media_features_real_decode(spark):
    media = synthesize_media(spark, n=66)
    rows = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert len(rows) == 66
    src = {r["media_id"]: r for r in media.collect()}
    n_corrupt = 0
    for i, r in rows.items():
        if i % 11 == 10:  # truncated payloads dead-letter to NULL dims
            assert r["decoded_width"] is None and r["feature"] is None
            n_corrupt += 1
            continue
        if r["kind"] == "image":
            # decode matches an independent reference decode of the payload
            w, h, px = _decode_png(bytes(src[i]["payload"]))
            assert (r["decoded_width"], r["decoded_height"]) == (w, h)
            assert r["feature"] == pytest.approx(
                float(px[:, :, : min(3, px.shape[2])].mean())
            )
        elif r["kind"] == "audio":
            n, rate, samples = _decode_wav(bytes(src[i]["payload"]))
            assert (r["decoded_width"], r["decoded_height"]) == (n, rate)
            assert r["feature"] == pytest.approx(
                float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
            )
        else:
            assert (r["decoded_width"], r["decoded_height"]) == (
                src[i]["width"], src[i]["height"],
            )
            assert r["feature"] is None
    assert n_corrupt == 66 // 11


def test_resize_images_thumbnails(spark):
    media = synthesize_media(spark, n=33)
    thumbs = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    imgs = [
        r for r in media.collect()
        if r["kind"] == "image" and r["media_id"] % 11 != 10
    ]
    assert set(thumbs) == {r["media_id"] for r in imgs}
    for r in imgs:
        t = thumbs[r["media_id"]]
        assert (t["thumb_width"], t["thumb_height"]) == (8, 8)
        buf = np.frombuffer(bytes(t["thumb"]), dtype=np.uint8)
        assert buf.shape == (64,)
        # nearest-neighbor of the reference decode
        w, h, px = _decode_png(bytes(r["payload"]))
        grey = px[:, :, : min(3, px.shape[2])].mean(axis=2)
        yi = (np.arange(8) * h) // 8
        xi = (np.arange(8) * w) // 8
        assert np.array_equal(buf.reshape(8, 8), grey[np.ix_(yi, xi)].astype(np.uint8))
