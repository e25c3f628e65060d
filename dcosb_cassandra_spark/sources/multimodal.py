"""Multimodal column support (SURVEY.md §2 D7): image/audio/video payloads
as opaque ``binary`` columns with typed metadata structs, processed by
Arrow-batched ``mapInPandas``.

The container has no image/audio codecs (environment constraint), so the
decode step is STUBBED: ``decode_image_stub`` derives deterministic fake
dimensions from the payload's md5 — making the Spark-side plumbing (schema,
batch shape, partitioning) fully real AND oracle-checkable, while a real
deployment swaps only `_decode_batch`'s body for PIL/ffmpeg.
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
