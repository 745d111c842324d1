"""Unit tests for the real PPM decode kernel behind
multimodal_image_features (the end-to-end hash check runs in
tools/check_correctness.py; this pins the decoder's header grammar)."""

import pytest

from xmlstreamprocessor_spark.operators.multimodal import decode_ppm


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
