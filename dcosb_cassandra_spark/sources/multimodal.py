"""Multimodal column support (SURVEY.md §2 D7): image/audio/video payloads
as opaque ``binary`` columns with typed metadata structs, processed by
Arrow-batched ``mapInPandas``.

The container has no image/audio codec libraries (environment constraint),
so coverage is split by what's honestly computable: the AUDIO path (d7d)
does real numpy math on real bytes, the PNG image path (d7e) does a REAL
encode+decode with stdlib zlib/struct (`png_encode_gray`/`png_decode_gray`
below — signature, chunk CRCs, IDAT inflate, scanline unfilter), and only
codec-bound formats (JPEG, video) keep the fingerprint STUB
(``decode_image_stub``: deterministic fake dims from the payload's md5 —
plumbing real and oracle-checkable, body swapped for PIL/ffmpeg in a real
deployment).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table

#: output schema of the decode stage — what a real image decoder would emit
DECODE_SCHEMA = "doc_id LONG, n_bytes INT, width INT, height INT, kind STRING"


def multimodal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct). Stands in for a
    table of blob-typed media cells (Cassandra `blob` ≈ BinaryType,
    SURVEY §1.2)."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("kind"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: md5(payload) nibbles → width/height.
    A real decoder would call PIL here — same signature, same batch shape.
    NOTE: would raise NotImplementedError for real media kinds; text/plain
    payloads take the deterministic-fake path so the plumbing is testable."""
    import hashlib

    def dims(b: bytes) -> tuple[int, int]:
        h = hashlib.md5(b).hexdigest()
        return int(h[:2], 16) + 1, int(h[2:4], 16) + 1

    wh = [dims(b) for b in batch["payload"]]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": [len(b) for b in batch["payload"]],
            "width": [w for w, _ in wh],
            "height": [h for _, h in wh],
            "kind": [m["kind"] for m in batch["meta"]],
        }
    )


def decode_image_stub(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: Arrow batches in, decoded-metadata batches out —
    runs fully parallel per partition; no shuffle, no driver involvement."""
    for batch in frames:
        yield _decode_batch(batch)


#: output schema of the resize stage — payload_md5 carried forward so the
#: next stage can derive frames without re-reading the binary
RESIZE_SCHEMA = (
    "doc_id LONG, n_bytes INT, payload_md5 STRING, "
    "out_width INT, out_height INT, resized_md5 STRING"
)

#: output schema of the frame-sampling stage (video-style payloads)
FRAME_SAMPLE_SCHEMA = (
    "doc_id LONG, out_width INT, out_height INT, resized_md5 STRING, "
    "n_frames INT, n_sampled INT, first_frame_md5 STRING"
)


def resize_image_stub(target_w: int, target_h: int):
    """mapInPandas body factory for the resize stage. STUB (no codecs in
    the container): the 'resized' payload is represented by a
    deterministic fingerprint md5(md5(payload) || '<w>x<h>') — a real
    deployment swaps the body for PIL's resize and hashes the actual
    output bytes. Signature, schema, and batch shape are the real ones."""
    import hashlib

    def body(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in frames:
            pm = [hashlib.md5(b).hexdigest() for b in batch["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_bytes": [len(b) for b in batch["payload"]],
                    "payload_md5": pm,
                    "out_width": target_w,
                    "out_height": target_h,
                    "resized_md5": [
                        hashlib.md5(f"{m}{target_w}x{target_h}".encode()).hexdigest()
                        for m in pm
                    ],
                }
            )

    return body


def sample_frames_stub(every_k: int, bytes_per_frame: int = 32):
    """mapInPandas body factory for video frame sampling. STUB: the
    payload is treated as n_bytes // bytes_per_frame frames; every k-th
    frame is 'extracted' as md5(payload_md5 ':' idx). Real deployment:
    ffmpeg keyframe extraction with the same batch shape."""
    import hashlib

    def body(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in frames:
            n_frames = [max(int(n) // bytes_per_frame, 0) for n in batch["n_bytes"]]
            sampled = [list(range(0, n, every_k)) for n in n_frames]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "out_width": batch["out_width"],
                    "out_height": batch["out_height"],
                    "resized_md5": batch["resized_md5"],
                    "n_frames": n_frames,
                    "n_sampled": [len(s) for s in sampled],
                    "first_frame_md5": [
                        hashlib.md5(f"{m}:{s[0]}".encode()).hexdigest() if s else None
                        for m, s in zip(batch["payload_md5"], sampled)
                    ],
                }
            )

    return body


#: output schema of the audio-analysis stage: whole-payload PCM-style
#: frame energies, aggregated per payload
AUDIO_ENERGY_SCHEMA = (
    "doc_id LONG, n_frames INT, mean_rms DOUBLE, peak_rms DOUBLE"
)


def audio_frame_energy_stub(frame_bytes: int = 32):
    """mapInPandas body factory for audio feature extraction. The payload
    is interpreted as unsigned 8-bit PCM (one sample per byte); RMS per
    ``frame_bytes`` frame, trailing partial frame dropped. Unlike the
    image/video stubs this computes REAL math on the real bytes (numpy,
    vectorized per Arrow batch), so the whole Python path is
    oracle-checkable from the characters' code points — a real deployment
    swaps only the sample decode (s16le/flac) for the byte view."""
    import numpy as np

    def body(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in frames:
            n_frames, mean_rms, peak_rms = [], [], []
            for b in batch["payload"]:
                samples = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float64)
                k = len(samples) // frame_bytes
                n_frames.append(k)
                if k == 0:
                    mean_rms.append(0.0)
                    peak_rms.append(0.0)
                    continue
                frames_arr = samples[: k * frame_bytes].reshape(k, frame_bytes)
                rms = np.sqrt((frames_arr * frames_arr).mean(axis=1))
                mean_rms.append(float(rms.mean()))
                peak_rms.append(float(rms.max()))
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_frames": n_frames,
                    "mean_rms": mean_rms,
                    "peak_rms": peak_rms,
                }
            )

    return body


# ---------------------------------------------------------------------------
# REAL image path (no codec libraries needed): PNG is writable and readable
# with stdlib zlib + struct alone, so the D7 image stage can do genuine
# decode work on genuine image bytes — signature check, chunk walk, CRC
# verification, IDAT inflate, scanline unfilter, pixel statistics — instead
# of the fingerprint stub above (which remains the documented stand-in for
# codec-bound formats like JPEG).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode_gray(pixels, width: int, height: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG: IHDR + one zlib IDAT (filter 0
    per scanline) + IEND, CRCs included. `pixels` is a length w*h uint8
    sequence, row-major."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    mv = memoryview(bytes(pixels))
    for y in range(height):
        raw += b"\x00" + mv[y * width : (y + 1) * width]
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_decode_gray(data: bytes):
    """Parse + decode a grayscale PNG: validates the signature and every
    chunk CRC, reads IHDR, inflates the IDAT stream, reverses per-scanline
    filtering (types 0/1/2 — what any encoder of gray rows emits), and
    returns (width, height, bit_depth, pixels bytearray). Raises ValueError
    on any structural corruption — this is a real decoder, not a stub."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (color, comp, filt, interlace) != (0, 0, 0, 0) or depth != 8:
                raise ValueError("unsupported PNG variant (need gray8, no interlace)")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    out = bytearray(width * height)
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        ftype, scan = row[0], bytearray(row[1:])
        if ftype == 1:  # Sub
            for x in range(1, width):
                scan[x] = (scan[x] + scan[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            prev = out[(y - 1) * width : y * width] if y else bytes(width)
            for x in range(width):
                scan[x] = (scan[x] + prev[x]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y * width : (y + 1) * width] = scan
    return width, height, 8, out
