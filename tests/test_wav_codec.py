"""The pure-stdlib RIFF/WAVE codec (sources/multimodal, r8): container
encode/parse and real PCM sample decode — the audio analogue of the PNG/
JPEG/MP4 paths. Groundwork for a graded WAV query; these tests carry the
structural/error coverage the oracle comparison can't."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dcosb_cassandra_spark.sources.multimodal import (
    wav_decode_samples,
    wav_encode_pcm16,
    wav_parse_meta,
)


def test_mono_roundtrip_bit_exact_and_word_aligned():
    rng = np.random.default_rng(2)
    pcm = rng.integers(-32768, 32767, size=801, dtype=np.int16)  # odd count
    wav = wav_encode_pcm16(pcm, 8000, 1)
    m = wav_parse_meta(wav)
    assert (m["audio_format"], m["channels"], m["sample_rate"]) == (1, 1, 8000)
    assert (m["bits_per_sample"], m["n_samples"]) == (16, 801)
    sr, ch, dec = wav_decode_samples(wav)
    assert np.array_equal(dec.ravel(), pcm)
    assert len(wav) % 2 == 0  # RIFF word alignment on the odd-size data


def test_stereo_interleave_roundtrip():
    rng = np.random.default_rng(3)
    st = rng.integers(-1000, 1000, size=64, dtype=np.int16)
    sr, ch, dec = wav_decode_samples(wav_encode_pcm16(st, 44100, 2))
    assert (sr, ch, dec.shape) == (44100, 2, (32, 2))
    assert np.array_equal(dec.ravel(), st)


def test_unknown_chunks_skipped_by_size():
    """Real WAVs carry LIST/INFO/cue chunks; the parser must size-walk
    past them to find fmt_/data wherever they sit."""
    wav = bytearray(wav_encode_pcm16(np.arange(8, dtype=np.int16), 8000, 1))
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    # splice the unknown chunk between WAVE and fmt_
    out = bytes(wav[:12]) + extra + bytes(wav[12:])
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    m = wav_parse_meta(out)
    assert m["n_samples"] == 8
    _, _, dec = wav_decode_samples(out)
    assert np.array_equal(dec.ravel(), np.arange(8, dtype=np.int16))


def test_non_riff_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        wav_parse_meta(b"OggS" + b"\x00" * 40)


def test_truncated_chunk_rejected():
    wav = wav_encode_pcm16(np.arange(100, dtype=np.int16), 8000, 1)
    with pytest.raises(ValueError):
        wav_parse_meta(wav[:-20])


def test_compressed_format_gated():
    wav = bytearray(wav_encode_pcm16(np.arange(4, dtype=np.int16), 8000, 1))
    i = bytes(wav).index(b"fmt ") + 8
    struct.pack_into("<H", wav, i, 85)  # format 85 = MP3
    with pytest.raises(NotImplementedError, match="codec"):
        wav_parse_meta(bytes(wav))


def test_mulaw_roundtrip_all_codes():
    """decode(encode(level)) is the identity on every reconstruction
    level, and encode(decode(code)) recovers every wire code — the two
    identities that make d7k's exactness construction sound."""
    import numpy as np

    from dcosb_cassandra_spark.sources.multimodal import (
        mulaw_decode,
        mulaw_encode,
    )

    codes = bytes(range(256))
    levels = mulaw_decode(codes)
    # all 256 codes map to the documented expansion formula
    for c, v in zip(codes, levels):
        u = ~c & 0xFF
        mag = (((u & 15) << 3 | 0x84) << ((u >> 4) & 7)) - 0x84
        assert v == (-mag if u >> 7 else mag)
    # encode inverts decode on every level, except the classic mu-law
    # +/-0 ambiguity: 0x7F (negative zero) decodes to 0, which canonically
    # re-encodes as 0xFF (positive zero)
    re = mulaw_encode(levels)
    assert all(
        r == (0xFF if c == 0x7F else c) for r, c in zip(re, codes)
    )
    # decode . encode is identity on the levels
    assert np.array_equal(mulaw_decode(mulaw_encode(levels)), levels)


def test_mulaw_encode_quantizes_monotonically():
    import numpy as np

    from dcosb_cassandra_spark.sources.multimodal import (
        mulaw_decode,
        mulaw_encode,
    )

    pcm = np.arange(-32768, 32768, 97, dtype=np.int16)
    dec = mulaw_decode(mulaw_encode(pcm))
    # quantization error bounded by the largest step (exp=7: 1024)
    assert np.abs(dec.astype(np.int64) - pcm.astype(np.int64)).max() <= 1024
    # monotone non-decreasing mapping
    assert (np.diff(dec.astype(np.int64)) >= 0).all()


def test_mulaw_wav_container_roundtrip():
    import numpy as np

    from dcosb_cassandra_spark.sources.multimodal import (
        mulaw_encode,
        wav_decode_samples,
        wav_encode_mulaw,
        wav_parse_meta,
    )

    smp = np.array([0, 132, -132, 8316, -8316, 32124, -32124], dtype=np.int16)
    wav = wav_encode_mulaw(mulaw_encode(smp), 8000)
    m = wav_parse_meta(wav)
    assert m["audio_format"] == 7 and m["bits_per_sample"] == 8
    assert m["n_samples"] == len(smp)
    rate, ch, dec = wav_decode_samples(wav)
    assert rate == 8000 and ch == 1
    # these inputs are exact reconstruction levels -> lossless round-trip
    assert np.array_equal(dec.ravel(), smp)


# ---------------------------------------------------------------------------
# IMA ADPCM (format 0x11) — the STATEFUL codec (r8): encoder/decoder
# state-machine properties and fmt-extension container coverage.
# ---------------------------------------------------------------------------


def test_adpcm_known_vector_state_walk():
    """Hand-computed reference walk from (pred=0, idx=0): nibble 7 at
    step 7 gives diff = 0+1+3+7... exercised against the published
    recurrence diff = step>>3 (+step>>2 if b0)(+step>>1 if b1)(+step if
    b2), sign bit 8, index adj table [-1,-1,-1,-1,2,4,6,8]."""
    from dcosb_cassandra_spark.sources.multimodal import adpcm_decode_nibbles

    out = adpcm_decode_nibbles([7, 7, 8, 0], pred0=0, idx0=0)
    # step table: idx0=0 -> 7; n=7: diff = 0+1+3+7 = 11? no: 7>>3=0,
    # 7>>2=1, 7>>1=3, 7 -> 0+1+3+7=11, pred=11, idx=0+8=8 (step 16)
    # n=7 again: 16>>3=2 +4+8+16 = 30, pred=41, idx=16 (step 34)
    # n=8: diff=34>>3=4, sign -> pred=37, idx=16-1=15 (step 31)
    # n=0: diff=31>>3=3, pred=40
    assert list(out) == [0, 11, 41, 37, 40]


def test_adpcm_roundtrip_tracks_bounded():
    """Lossy but bounded: the encoder replays the decoder, so error never
    drifts unchecked. Reference property, per sample: whenever the target
    delta fits the representable range (15/8 of the active step), the
    greedy quantizer leaves a residual below step/4 + step/8 + 1; when
    the signal outruns the range the index ramps (+8 per max nibble) and
    tracking recovers — asserted via the end-of-stream error."""
    from dcosb_cassandra_spark.sources.multimodal import (
        _ADPCM_STEPS,
        adpcm_decode_nibbles,
        adpcm_encode,
        unpack_nibbles,
    )

    rng = np.random.default_rng(11)
    pcm = np.cumsum(rng.integers(-500, 500, 400)).clip(-32000, 32000)
    p0, i0, packed = adpcm_encode(pcm, idx0=20)
    nibs = unpack_nibbles(packed, len(pcm) - 1)
    dec = adpcm_decode_nibbles(nibs, p0, i0).astype(np.int64)
    assert dec[0] == pcm[0]
    # replay the state walk to know (pred, step) before each sample
    pred, idx = int(p0), int(i0)
    for k, n in enumerate(nibs):
        step = _ADPCM_STEPS[idx]
        delta = int(pcm[k + 1]) - pred
        if abs(delta) <= (15 * step) >> 3 and -32768 < int(dec[k + 1]) < 32767:
            residual = abs(int(dec[k + 1]) - int(pcm[k + 1]))
            assert residual <= (step >> 2) + (step >> 3) + 1
        pred, idx = int(dec[k + 1]), max(
            0, min(88, idx + [-1, -1, -1, -1, 2, 4, 6, 8][n & 7])
        )
    # recovery: the final sample is back within the last active step
    assert abs(int(dec[-1]) - int(pcm[-1])) <= _ADPCM_STEPS[idx]


def test_adpcm_clamps_at_int16_rails():
    from dcosb_cassandra_spark.sources.multimodal import adpcm_decode_nibbles

    up = adpcm_decode_nibbles([7] * 120, pred0=30000, idx0=88)
    assert up.max() == 32767 and up[-1] == 32767
    dn = adpcm_decode_nibbles([15] * 120, pred0=-30000, idx0=88)
    assert dn.min() == -32768 and dn[-1] == -32768


def test_adpcm_wav_container_roundtrip_and_meta():
    from dcosb_cassandra_spark.sources.multimodal import (
        adpcm_decode_nibbles,
        pack_nibbles,
        wav_encode_adpcm,
    )

    nibs = [3, 9, 14, 0, 7, 8, 1]  # odd count: pad nibble must be ignored
    wav = wav_encode_adpcm(-123, 17, pack_nibbles(nibs), len(nibs), 8000)
    m = wav_parse_meta(wav)
    assert m["audio_format"] == 0x11
    assert m["bits_per_sample"] == 4 and m["channels"] == 1
    assert m["samples_per_block"] == len(nibs) + 1
    assert m["n_samples"] == len(nibs) + 1
    _sr, _ch, dec = wav_decode_samples(wav)
    assert np.array_equal(
        dec.ravel(), adpcm_decode_nibbles(nibs, -123, 17)
    )


def test_adpcm_rejects_out_of_range_step_index():
    from dcosb_cassandra_spark.sources.multimodal import (
        pack_nibbles,
        wav_encode_adpcm,
    )

    wav = wav_encode_adpcm(0, 89, pack_nibbles([1, 2]), 2, 8000)
    with pytest.raises(ValueError, match="step index"):
        wav_decode_samples(wav)


def test_adpcm_rejects_fmt_without_extension():
    """fmt tag 0x11 with a plain 16-byte fmt chunk is structural
    corruption — the parser must raise, not read the next chunk's bytes
    as wSamplesPerBlock (code-review r8 finding)."""
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 8000, 6, 4)  # no cbSize
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", 6) + b"\x00" * 6
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="cbSize"):
        wav_parse_meta(wav)


def test_adpcm_rejects_zero_block_align_and_spb_overflow():
    from dcosb_cassandra_spark.sources.multimodal import (
        pack_nibbles,
        wav_encode_adpcm,
    )

    good = bytearray(wav_encode_adpcm(0, 0, pack_nibbles([1, 2]), 2, 8000))
    fmt_at = good.index(b"fmt ") + 8
    # nBlockAlign lives at fmt+12 (after tag/ch/rate/brate)
    struct.pack_into("<H", good, fmt_at + 12, 0)
    with pytest.raises(ValueError, match="block align"):
        wav_parse_meta(bytes(good))
    good2 = bytearray(wav_encode_adpcm(0, 0, pack_nibbles([1, 2]), 2, 8000))
    # wSamplesPerBlock at fmt+18 — claim more samples than the block holds
    struct.pack_into("<H", good2, fmt_at + 18, 1000)
    with pytest.raises(ValueError, match="wSamplesPerBlock"):
        wav_parse_meta(bytes(good2))
