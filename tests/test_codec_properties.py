"""Property-based coverage for the two HAND-ROLLED coders (r8): GIF's
variable-width LZW (no stdlib implementation exists) and the stateful IMA
ADPCM quantizer. Hypothesis explores the input spaces the hand-picked
unit vectors can't — arbitrary byte streams across width-bump and
dictionary-cap boundaries, arbitrary codec state seeds — asserting the
invariants that define correctness: LZW is lossless by construction;
ADPCM decode is a deterministic pure function of (nibbles, seed state)
with int16-clamped output."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dcosb_cassandra_spark.sources.multimodal import (
    _ADPCM_STEPS,
    _lzw_compress,
    _lzw_decompress,
    adpcm_decode_nibbles,
    adpcm_encode,
    pack_nibbles,
    unpack_nibbles,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_lzw_roundtrip_arbitrary_bytes(data):
    assert _lzw_decompress(_lzw_compress(data)) == data


@settings(max_examples=50, deadline=None)
@given(
    st.binary(min_size=1, max_size=40),
    st.integers(min_value=2, max_value=400),
)
def test_lzw_roundtrip_repetitive(motif, reps):
    """Repetitive streams drive fast dictionary growth (KwKwK-rich,
    crosses the 12-bit cap when long enough)."""
    data = motif * reps
    assert _lzw_decompress(_lzw_compress(data)) == data


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=0, max_size=500),
    st.integers(min_value=-32768, max_value=32767),
    st.integers(min_value=0, max_value=88),
)
def test_adpcm_decode_total_and_clamped(nibbles, pred0, idx0):
    """Decode is total on every (nibbles, state) input: emits exactly
    len+1 samples, all inside int16, sample 0 == the header predictor."""
    out = adpcm_decode_nibbles(nibbles, pred0, idx0)
    assert len(out) == len(nibbles) + 1
    assert int(out[0]) == pred0
    assert out.dtype == np.int16  # construction clamps before the cast


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=301),
)
def test_nibble_packing_roundtrip(nibbles):
    assert unpack_nibbles(pack_nibbles(nibbles), len(nibbles)) == nibbles


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767),
             min_size=2, max_size=200),
    st.integers(min_value=0, max_value=88),
)
def test_adpcm_encode_decode_agree_on_state_walk(pcm, idx0):
    """The encoder's internal reconstruction replay IS the decoder: feeding
    its nibbles back through adpcm_decode_nibbles reproduces sample 0
    exactly and every later sample inside the reachable step envelope
    (|err| <= 2 * max step = 65534 trivially, but more tightly: the
    decoder output must equal the encoder's tracked prediction, which we
    verify by determinism — two decodes agree bit-for-bit)."""
    p0, i0, packed = adpcm_encode(pcm, idx0=idx0)
    nibs = unpack_nibbles(packed, len(pcm) - 1)
    a = adpcm_decode_nibbles(nibs, p0, i0)
    b = adpcm_decode_nibbles(nibs, p0, i0)
    assert np.array_equal(a, b)
    assert int(a[0]) == pcm[0]
    # monotone-envelope invariant: one step never moves the prediction by
    # more than 15/8 of the largest step (the max representable diff)
    deltas = np.abs(np.diff(a.astype(np.int64)))
    assert deltas.max(initial=0) <= (15 * _ADPCM_STEPS[-1]) >> 3


# ---------------------------------------------------------------------------
# Parser totality under garbage (the d7o quarantine contract): every
# container parser either returns or raises promptly on ARBITRARY bytes —
# no hangs, no unbounded loops, no non-Exception escapes. Hypothesis
# additionally mutates REAL files (bit flips + truncations), the corrupt
# inputs a 100 TB crawl actually contains.
# ---------------------------------------------------------------------------

from dcosb_cassandra_spark.sources.multimodal import (  # noqa: E402
    bmp_decode,
    bmp_encode_gray,
    gif_decode,
    gif_encode_gray,
    jpeg_decode_pixels,
    jpeg_encode_gray,
    mp4_encode_container,
    mp4_parse_meta,
    mulaw_encode,
    png_decode,
    png_encode_gray,
    wav_decode_samples,
    wav_encode_mulaw,
)

_PARSERS = (png_decode, jpeg_decode_pixels, gif_decode,
            wav_decode_samples, mp4_parse_meta, bmp_decode)


def _real_files():
    px = bytes(range(48))
    return [
        png_encode_gray(px, 8, 6),
        jpeg_encode_gray([(7 * i) % 256 for i in range(128)], 16, 8),
        gif_encode_gray(px, 8, 6),
        wav_encode_mulaw(mulaw_encode(np.arange(-20, 28, dtype=np.int16)), 8000),
        mp4_encode_container(90, 30, 64, 48, [10, 20, 30]),
        bmp_encode_gray(px, 8, 6),
    ]


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_parsers_total_on_garbage(data):
    for p in _PARSERS:
        try:
            p(data)
        except Exception:
            pass  # rejecting garbage is the expected path


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=255),
)
def test_parsers_total_on_bit_flipped_real_files(which, pos, xor):
    files = _real_files()
    data = bytearray(files[which])
    data[pos % len(data)] ^= xor
    for p in _PARSERS:
        try:
            p(bytes(data))
        except Exception:
            pass


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=10_000),
)
def test_parsers_total_on_truncations(which, cut):
    files = _real_files()
    data = files[which]
    for p in _PARSERS:
        try:
            p(data[: cut % (len(data) + 1)])
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Hand-rolled DEFLATE inflate (RFC 1950/1951): differential-tested against
# stdlib zlib over arbitrary inputs at every compression level (level 0 =
# stored blocks, 1 = mostly fixed Huffman, 6/9 = dynamic Huffman), plus
# explicit corruption paths.
# ---------------------------------------------------------------------------

import zlib as _zlib  # noqa: E402

from dcosb_cassandra_spark.sources.multimodal import inflate  # noqa: E402


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=3000), st.sampled_from([0, 1, 6, 9]))
def test_inflate_matches_zlib(data, level):
    assert inflate(_zlib.compress(data, level)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=1, max_size=30), st.integers(min_value=2, max_value=500))
def test_inflate_matches_zlib_repetitive(motif, reps):
    data = motif * reps  # long back-references incl. overlap copies
    for level in (1, 9):
        assert inflate(_zlib.compress(data, level)) == data


def test_inflate_rejects_corruption():
    blob = _zlib.compress(b"hello deflate world" * 10)
    with pytest.raises(ValueError):
        inflate(blob[:5])  # truncated mid-stream
    bad = bytearray(blob)
    bad[-1] ^= 1  # adler trailer
    with pytest.raises(ValueError, match="Adler"):
        inflate(bytes(bad))
    with pytest.raises(ValueError, match="header check"):
        inflate(b"\x78\x00" + blob[2:])  # FCHECK broken
    with pytest.raises(ValueError, match="not a DEFLATE"):
        inflate(b"\x42\x42" + blob[2:])


# ---------------------------------------------------------------------------
# BMP (8-bit palettized DIB): round-trip across widths that exercise the
# 4-byte row padding (w%4 in 0..3) plus explicit bottom-up/flip and
# rejection paths.
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_all_paddings(w, h, seed):
    import random as _random

    rng = _random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    w2, h2, rgb = bmp_decode(bmp_encode_gray(px, w, h))
    assert (w2, h2) == (w, h)
    assert bytes(rgb[3 * i] for i in range(w * h)) == px
    assert all(rgb[3 * i] == rgb[3 * i + 1] == rgb[3 * i + 2] for i in range(w * h))


def test_bmp_rejections():
    good = bmp_encode_gray(bytes(range(48)), 8, 6)
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"XX" + good[2:])
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(good[:-5])
    # 24-bit / compressed forms are quarantined, not crashed
    bad = bytearray(good)
    bad[28] = 24  # biBitCount
    with pytest.raises(ValueError, match="only 8-bit"):
        bmp_decode(bytes(bad))
