"""The hand-rolled GIF89a/LZW codec (sources/multimodal, r8): unlike PNG
(zlib-backed) BOTH directions of GIF's variable-width LZW are ours, so
these tests pin the coder's hard edges — the KwKwK just-assigned-code
case, width bumps with the decoder's one-entry dictionary lag, the
12-bit cap rebuild, sub-block framing — plus container structure and
error paths the oracle comparison can't see."""

from __future__ import annotations

import random

import pytest

from dcosb_cassandra_spark.sources.multimodal import (
    _lzw_compress,
    _lzw_decompress,
    gif_decode,
    gif_encode_gray,
)


def test_lzw_kwkwk_case():
    """'ababab...' forces the decoder to receive a code equal to its next
    unassigned dictionary slot (the cScSc pattern from the spec): entry
    must decode as prev + prev[0]."""
    data = b"ab" * 40
    assert _lzw_decompress(_lzw_compress(data)) == data
    # tighter: the 3-symbol trigger
    data = b"aba" + b"ab" * 3
    assert _lzw_decompress(_lzw_compress(data)) == data


def test_lzw_width_bump_boundaries():
    """Inputs sized to place codes exactly at the 9->10->11->12 bit
    transitions: all-distinct pairs grow the dictionary one entry per
    input byte, so long random streams cross every bump."""
    rnd = random.Random(3)
    for n in (250, 254, 255, 256, 300, 1 << 10, 1 << 11, 1 << 12, 6000):
        data = bytes(rnd.randrange(256) for _ in range(n))
        assert _lzw_decompress(_lzw_compress(data)) == data


def test_lzw_dictionary_cap_rebuild():
    """> 4096 dictionary entries forces the mid-stream CLEAR + rebuild;
    both highly repetitive (slow growth) and noise (fast growth) paths."""
    rnd = random.Random(4)
    noise = bytes(rnd.randrange(256) for _ in range(30000))
    assert _lzw_decompress(_lzw_compress(noise)) == noise
    rep = b"the quick brown fox " * 3000
    assert _lzw_decompress(_lzw_compress(rep)) == rep


def test_lzw_small_alphabet_min_code_size():
    """min_code_size < 8 (e.g. 2-bit alphabet) exercises the generic
    clear/EOI placement."""
    data = bytes([0, 1, 2, 3] * 100)
    assert _lzw_decompress(_lzw_compress(data, 2), 2) == data


def test_lzw_rejects_truncation_and_bad_codes():
    good = _lzw_compress(b"hello world, hello lzw")
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decompress(good[:3])
    with pytest.raises(ValueError, match="out of sequence"):
        # a 9-bit stream starting with a far-future code: CLEAR (0x100)
        # then code 400 (unassigned — table holds 0..257 post-clear)
        bits = (0x100) | (400 << 9)
        raw = bytes((bits >> (8 * i)) & 0xFF for i in range(3))
        _lzw_decompress(raw)


def test_gif_container_roundtrip_and_structure():
    rnd = random.Random(7)
    px = bytes(rnd.randrange(256) for _ in range(16 * 11))
    gif = gif_encode_gray(px, 16, 11)
    assert gif[:6] == b"GIF89a" and gif[-1] == 0x3B
    w, h, rgb = gif_decode(gif)
    assert (w, h) == (16, 11)
    assert bytes(rgb[3 * i] for i in range(16 * 11)) == px


def test_gif_skips_extension_blocks():
    """89a extensions (graphic control etc.) between the color table and
    the image descriptor must be size-walked, not parsed."""
    px = bytes(range(64))
    gif = bytearray(gif_encode_gray(px, 8, 8))
    # splice a Graphic Control Extension right before the image
    # descriptor (0x2C after header 13 + 768 palette bytes)
    at = 13 + 768
    assert gif[at] == 0x2C
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    gif[at:at] = gce
    w, h, rgb = gif_decode(bytes(gif))
    assert (w, h) == (8, 8)
    assert bytes(rgb[3 * i] for i in range(64)) == px


def test_gif_error_paths():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG....")
    px = bytes(range(16))
    gif = bytearray(gif_encode_gray(px, 4, 4))
    with pytest.raises(ValueError, match="sub-blocks truncated"):
        gif_decode(bytes(gif[:-6]))
    with pytest.raises(ValueError, match="pixel count"):
        gif_encode_gray(px, 5, 5)


def test_gif_truncation_raises_valueerror_everywhere():
    """Code-review r8 finding: truncation inside the extension walk or
    before the image descriptor must raise ValueError (the documented
    contract), never IndexError/struct.error."""
    px = bytes(range(64))
    gif = bytearray(gif_encode_gray(px, 8, 8))
    at = 13 + 768
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    gif[at:at] = gce
    # cut mid-extension
    with pytest.raises(ValueError, match="truncated"):
        gif_decode(bytes(gif[: at + 3]))
    # cut right after the 0x2C introducer (descriptor missing)
    with pytest.raises(ValueError, match="descriptor truncated"):
        gif_decode(bytes(gif[: at + len(gce) + 1]))


def test_gif_rejects_pixel_index_past_local_palette():
    """A 4-entry local color table with 8-bit LZW indices > 3 must raise
    rather than emit frame-shifted rgb (code-review r8 finding)."""
    import struct as _s

    from dcosb_cassandra_spark.sources.multimodal import _lzw_compress

    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", 2, 2, 0, 0, 0)  # no global table
    out += b"\x2C" + _s.pack("<HHHHB", 0, 0, 2, 2, 0x81)  # local, 4 entries
    out += bytes(12)  # 4-entry palette
    out.append(8)
    comp = _lzw_compress(bytes([0, 1, 2, 200]), 8)  # index 200 >> palette
    out.append(len(comp))
    out += comp
    out += b"\x00\x3B"
    with pytest.raises(ValueError, match="exceeds color table"):
        gif_decode(bytes(out))


# -- vectorized batch decoder (r10): bit parity with the scalar walk --------


def test_batch_decode_parity_fuzz():
    """The table-gather batch decoder must be BIT-IDENTICAL to the scalar
    decoder on every well-formed stream — fuzzed across alphabet sizes
    (KwKwK-heavy small alphabets included) and lengths spanning the
    fast-path/fallback boundary (width bumps force the fallback)."""
    import random

    from dcosb_cassandra_spark.sources.multimodal import (
        _lzw_compress,
        _lzw_decompress,
        _lzw_decompress_batch,
    )

    rng = random.Random(42)
    cases = [b"", bytes([250]), bytes([5]) * 50, b"ab" * 400,
             bytes([0]) * 5000, bytes([1, 1, 2, 1, 1, 2, 1, 1, 1, 2]) * 3]
    for _ in range(200):
        n = rng.randrange(0, 1200)
        alpha = rng.choice([2, 3, 17, 256])
        cases.append(bytes(rng.randrange(alpha) for _ in range(n)))
    comps = [_lzw_compress(px, 8) for px in cases]
    got = _lzw_decompress_batch(comps, 8)
    for px, comp, out in zip(cases, comps, got):
        assert out == px == _lzw_decompress(comp, 8)


def test_batch_decode_fallback_on_width_bump():
    """A stream long enough to bump past the initial code width fails the
    batch fast-path validation and must transparently take the scalar
    fallback — same bytes out."""
    import random

    from dcosb_cassandra_spark.sources import multimodal as mm

    rng = random.Random(1)
    big = bytes(rng.randrange(256) for _ in range(3000))  # >254 codes
    comp = mm._lzw_compress(big, 8)
    calls = []
    orig = mm._lzw_decompress

    def spy(data, mcs=8):
        calls.append(len(data))
        return orig(data, mcs)

    mm._lzw_decompress = spy
    try:
        out = mm._lzw_decompress_batch([comp], 8)
    finally:
        mm._lzw_decompress = orig
    assert out == [big]
    assert calls, "width-bumped stream must take the scalar fallback"


def test_gif_decode_batch_matches_scalar():
    from dcosb_cassandra_spark.sources.multimodal import (
        gif_decode,
        gif_decode_batch,
        gif_encode_gray,
    )

    gifs = [
        gif_encode_gray(bytes((i * 7 + j) % 256 for j in range(16 * h)), 16, h)
        for i, h in enumerate([4, 7, 10, 1, 5])
    ]
    assert gif_decode_batch(gifs) == [gif_decode(g) for g in gifs]


def test_d7m_store_serve_parity(spark):
    """Build/serve split for media payloads (r10): d7m served from the
    rendered-GIF store must match the fused inline render+decode pass
    row for row."""
    from dcosb_cassandra_spark.operators.llm_multimodal import d7m_render_inline
    from dcosb_cassandra_spark.registry import REGISTRY, load_all

    from .conftest import SMOKE_SF_DIR

    load_all()
    served = sorted(
        tuple(r)
        for r in REGISTRY["d7m_gif_lzw_decode"].fn(spark, SMOKE_SF_DIR).collect()
    )
    inline = sorted(
        tuple(r) for r in d7m_render_inline(spark, SMOKE_SF_DIR).collect()
    )
    assert served == inline and len(served) > 0
