"""Unit tests for the real PPM and PNG decode kernels behind
multimodal_image_features[_png] (the end-to-end hash checks run in
tools/check_correctness.py; this pins the decoders' grammar and the
full unfilter matrix)."""

import struct
import zlib

import pytest

from xmlstreamprocessor_spark.operators.multimodal import (
    _PNG_SIG,
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
)


def _ppm(w, h, header=None):
    plane = bytes(range(w * h * 3 % 256)).ljust(w * h * 3, b"\x7f")[: w * h * 3]
    head = header if header is not None else f"P6\n{w} {h}\n255\n".encode()
    return head + plane, plane


def test_decode_basic():
    data, plane = _ppm(5, 4)
    w, h, got = decode_ppm(data)
    assert (w, h) == (5, 4)
    assert got == plane


def test_decode_header_variants():
    # arbitrary whitespace runs and # comments are legal netpbm headers
    data, plane = _ppm(3, 2, header=b"P6 # a comment\n  3\t\n2 # dims\n255 ")
    w, h, got = decode_ppm(data)
    assert (w, h) == (3, 2)
    assert got == plane


def test_decode_rejects_bad_magic():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 12)


def test_decode_rejects_truncated_plane():
    data, _ = _ppm(4, 4)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(data[:-1])


def test_decode_rejects_wide_maxval():
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def _plane(w, h, seed=0):
    return bytes((i * 37 + seed * 11) % 256 for i in range(w * h * 3))


def test_png_roundtrip_all_filters():
    # >=5 rows so the r%5 encoder emits every filter type (None/Sub/Up/
    # Average/Paeth) and the decode exercises every unfilter branch
    w, h = 7, 9
    plane = _plane(w, h)
    data = encode_png(w, h, plane)
    assert data[:8] == _PNG_SIG
    gw, gh, got = decode_png(data)
    assert (gw, gh) == (w, h)
    assert got == plane


def test_png_roundtrip_single_row_and_column():
    for w, h in [(1, 1), (1, 6), (6, 1)]:
        plane = _plane(w, h, seed=w * 10 + h)
        assert decode_png(encode_png(w, h, plane)) == (w, h, plane)


def test_png_multiple_idat_chunks():
    # decoders must concatenate IDAT chunks before inflating
    w, h = 4, 5
    plane = _plane(w, h, seed=3)
    data = encode_png(w, h, plane)
    # split the single IDAT into two chunks
    pos = 8
    parts = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        parts.append((ctype, body))
        pos += 12 + length

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    out = _PNG_SIG
    for ctype, body in parts:
        if ctype == b"IDAT":
            mid = len(body) // 2
            out += chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:])
        else:
            out += chunk(ctype, body)
    assert decode_png(out) == (w, h, plane)


def test_png_rejects_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG\r\n\x1a\x00" + b"\x00" * 30)


def test_png_rejects_unsupported_color_type():
    # grayscale (color type 0) must raise, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (
        _PNG_SIG
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="color type"):
        decode_png(data)


def test_png_rejects_truncated_pixels():
    w, h = 3, 3
    data = encode_png(w, h, _plane(w, h))
    # re-deflate one scanline short
    raw = zlib.decompress(_idat(data))
    short = zlib.compress(raw[: -(1 + 3 * w)], 6)
    rebuilt = _replace_idat(data, short)
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(rebuilt)


def _idat(data):
    pos, out = 8, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if data[pos + 4 : pos + 8] == b"IDAT":
            out += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    return out


def _replace_idat(data, new_body):
    pos, out = 8, data[:8]
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IDAT":
            body = new_body
        out += (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )
        pos += 12 + length
    return out


def test_decode_image_dispatches_on_magic():
    w, h = 5, 4
    plane = _plane(w, h, seed=7)
    gw, gh, fmt, feat = decode_image(encode_png(w, h, plane), use_real_decoder=True)
    assert (gw, gh, fmt) == (w, h, "image/png")
    assert feat == [sum(plane[c::3]) / (255.0 * w * h) for c in range(3)]

    ppm = f"P6\n{w} {h}\n255\n".encode() + plane
    gw, gh, fmt, _ = decode_image(ppm, use_real_decoder=True)
    assert (gw, gh, fmt) == (w, h, "image/x-portable-pixmap")

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg", use_real_decoder=True)


def test_frame_dedup_consistent_with_frame_fanout(spark, oracle_sf_dir):
    from pyspark.sql import functions as F

    from xmlstreamprocessor_spark.operators.registry import REGISTRY

    dups = REGISTRY["multimodal_frame_dedup"][0](spark, oracle_sf_dir)
    rows = dups.collect()
    assert rows
    for r in rows:
        assert r["n_videos"] > 1
        assert r["n_frames"] >= r["n_videos"]
    # total duplicated frames never exceeds the full frame fan-out
    frames = REGISTRY["multimodal_frame_sample"][0](spark, oracle_sf_dir)
    assert sum(r["n_frames"] for r in rows) <= frames.count()


def test_png_roundtrip_property():
    """Property check over the full filter matrix: any plane, any
    geometry, encode->decode is the identity (hypothesis-driven)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=16),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def run(w, h, seed):
        import random

        rng = random.Random(seed)
        plane = bytes(rng.randrange(256) for _ in range(w * h * 3))
        assert decode_png(encode_png(w, h, plane)) == (w, h, plane)

    run()
