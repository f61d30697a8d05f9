"""Multimodal column pattern (SURVEY.md §2.9 X5): media as opaque
BinaryType payloads + typed metadata struct; decode/feature steps as
Arrow-batched pandas functions over mapInPandas.

The container has no image/audio codecs, so `decode_image` is an
explicitly stubbed step (deterministic fake features) — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested.

Scale notes: payloads ride along as opaque bytes — Spark shuffles them
only if the plan demands it; metadata-only queries prune the binary
column at the parquet scan (columnar projection). mapInPandas streams
Arrow batches, so peak memory is one batch of payloads per task, set by
spark.sql.execution.arrow.maxRecordsPerBatch, not the partition size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, mean_luma double"
)


def pack_media(df: DataFrame, payload_col: str, kind: str) -> DataFrame:
    """Attach a typed metadata struct next to an opaque binary payload."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ),
    )


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode payload → (width, height, mean_luma).

    STUB: no codec libraries in this container. Emits deterministic fake
    dimensions derived from payload length so the distributed plumbing
    (Arrow batch shape, schema contract, null handling) is fully
    exercised. A real deployment swaps the body for PIL/ffmpeg.
    """
    for pdf in batches:
        n = pdf["payload"].str.len().fillna(0).astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": n,
                "sha256": pdf["sha256"],
                # deterministic fake decode — see docstring
                "width": (n % 640 + 1).astype("int32"),
                "height": (n % 480 + 1).astype("int32"),
                "mean_luma": (n % 256).astype("float64") / 255.0,
            }
        )
        yield out


def decode_image(df: DataFrame) -> DataFrame:
    """df must carry (doc_id, payload binary, kind, sha256). Returns the
    decoded-feature table per MEDIA_SCHEMA."""
    cols = df.select("doc_id", "payload", "kind", "sha256")
    return cols.mapInPandas(decode_image_batch, schema=MEDIA_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, resized_bytes long"


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize step (STUB body, real plumbing): batch-in/batch-out
    mapInPandas with target dims closed over — the shape a PIL
    ``Image.resize`` drops into. Fake output size scales the payload
    length by the area ratio against the stub-decoded dims."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].str.len().fillna(0).astype("int64")
            w0 = (n % 640 + 1).astype("int64")  # matches decode stub dims
            h0 = (n % 480 + 1).astype("int64")
            ratio = (width * height) / (w0 * h0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "resized_bytes": (n * ratio).astype("int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_sha256 string"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling (video → n rows per payload): demonstrates the
    row-EXPANDING mapInPandas shape — one Arrow batch in, a longer
    batch out. STUB decoder: frames are equal byte-slices of the
    payload; a real deployment seeks keyframes with ffmpeg instead.

    Scale: expansion happens inside the task (no shuffle); output rows
    carry hashes/lengths, not pixels, until a downstream step asks."""
    import hashlib

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_sha256": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = payload if payload is not None else b""
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(_frames, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, duration_ms long, "
    "sum_squares decimal(38,0), n_clipped long"
)

#: STUB sample rate for the fake decoder — a real deployment reads it
#: from the container header via soundfile/ffmpeg.
AUDIO_STUB_RATE = 16_000


def decode_audio(df: DataFrame) -> DataFrame:
    """Audio decode + feature extraction over `binary` payloads —
    mapInPandas, Arrow-batched, row-per-payload (the decode_image
    shape for the 1-D modality).

    STUB DECODER (this container has no codec libraries): the payload
    bytes are interpreted as little-endian int16 PCM at a fixed
    16 kHz — deterministic and loss-free, so the Spark-side plumbing
    (schema, batching, numpy vectorization, exact aggregates) is fully
    real and testable; a deployment swaps the two marked lines for
    soundfile/ffmpeg. Emitted features are codec-independent audio-QA
    signals: sample count, duration, EXACT integer energy (Σ s² as
    decimal — engine-reproducible, no float accumulation), and clipped-
    sample count (|s| = 32767/32768, the clipping-detection heuristic).
    """
    import numpy as np

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "doc_id": [], "n_samples": [], "sample_rate": [],
                "duration_ms": [], "sum_squares": [], "n_clipped": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = payload if payload is not None else b""
                # STUB: bytes -> int16 PCM (real code: soundfile.read)
                samples = np.frombuffer(
                    data[: len(data) - (len(data) % 2)], dtype="<i2"
                )
                n = int(samples.size)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["sample_rate"].append(AUDIO_STUB_RATE)
                out["duration_ms"].append(n * 1000 // AUDIO_STUB_RATE)
                out["sum_squares"].append(
                    int(np.sum(samples.astype("int64") ** 2))
                )
                out["n_clipped"].append(
                    int(np.count_nonzero(np.abs(samples.astype("int64")) >= 32767))
                )
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(_decode, schema=AUDIO_SCHEMA)
