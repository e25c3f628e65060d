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
