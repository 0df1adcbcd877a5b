"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched mapInPandas.

The container has no image/audio libraries, so the decode step is
STUBBED: `decode_image` raises NotImplementedError unless
`fake=True`, which produces a deterministic fake decode (dimensions
derived from the byte content) — the Spark-side plumbing (schema,
batch iteration, partitioning) is real and tested.

Scale design:
  - binary payloads stay in parquet binary columns; metadata is a
    sibling struct so filters/pruning never touch the bytes;
  - mapInPandas streams Arrow batches — memory is bounded by
    `spark.sql.execution.arrow.maxRecordsPerBatch`, not row count;
  - repartition before decode to match executor memory with payload
    size (decode is CPU-bound, so partitions ≈ cores × 2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_meta struct<kind:string, n_bytes:long, sha1:string>"
)

DECODED_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, mean_luma double"
)


def attach_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Typed metadata struct next to the binary payload — computed
    natively (no UDF), so metadata-only queries never decode."""
    m = F.col(media_col)
    meta = F.struct(
        F.lit("image").alias("kind"),
        F.length(m).cast("long").alias("n_bytes"),
        F.sha1(m).alias("sha1"),
    )
    return df.withColumn("media_meta", meta)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode for plumbing tests: dims/luma derived
    from content bytes."""
    if payload is None or len(payload) == 0:
        return (0, 0, 0, 0.0)
    w = 16 + payload[0] % 64
    h = 16 + payload[-1] % 64
    luma = sum(payload[:64]) / (min(len(payload), 64) * 255.0)
    return (w, h, 3, round(luma, 6))


def decode_image(df: DataFrame, media_col: str = "media", id_col: str = "doc_id",
                 fake: bool = False) -> DataFrame:
    """Decode image binaries → features via mapInPandas.

    Real decode requires an image library (not in this container) —
    STUB: raises NotImplementedError unless fake=True.
    """
    if not fake:
        raise NotImplementedError(
            "image decode needs an image library (PIL/cv2) — not available "
            "in this environment; pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_decode(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    return df.select(id_col, media_col).mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int,
                 media_col: str = "media", id_col: str = "doc_id",
                 fake: bool = False) -> DataFrame:
    """Resize STUB: real impl needs an image library. The fake path
    re-encodes a deterministic payload of the target size so the
    batch shape / schema plumbing is real."""
    if not fake:
        raise NotImplementedError(
            "image resize needs an image library (PIL/cv2) — not available "
            "in this environment; pass fake=True for the deterministic stub"
        )

    target = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for payload in pdf[media_col]:
                if payload is None:
                    out.append(None)
                    continue
                reps = (target // max(len(payload), 1)) + 1
                out.append((bytes(payload) * reps)[:target])
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out,
                                "width": width, "height": height})

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=f"{id_col} long, resized binary, width int, height int"
    )


def audio_features(df: DataFrame, media_col: str = "media", id_col: str = "doc_id",
                   fake: bool = False) -> DataFrame:
    """Audio feature-extraction STUB (duration/rms/zero-crossings
    from a fake PCM interpretation of the bytes); real impl needs an
    audio library."""
    if not fake:
        raise NotImplementedError(
            "audio decode needs an audio library (librosa/soundfile) — not "
            "available in this environment; pass fake=True for the stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in it:
            rows = {"doc_id": [], "duration_s": [], "rms": [], "zero_crossings": []}
            for did, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None or len(payload) < 2:
                    continue
                samples = [b - 128 for b in payload]
                rows["doc_id"].append(did)
                rows["duration_s"].append(round(len(samples) / 16000.0, 6))
                rows["rms"].append(
                    round(math.sqrt(sum(s * s for s in samples) / len(samples)), 6)
                )
                rows["zero_crossings"].append(
                    sum(1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0))
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(
        batches, schema="doc_id long, duration_s double, rms double, zero_crossings int"
    )


def frame_sample(df: DataFrame, every_n: int = 10, media_col: str = "media",
                 id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling STUB: emits (doc_id, frame_no, frame)
    rows — fake frames are byte slices; real impl needs a video lib.
    Demonstrates the 1→N mapInPandas generator shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_no": [], "frame": []}
            for did, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // 256)
                for fno in range(0, n_frames, every_n):
                    rows["doc_id"].append(did)
                    rows["frame_no"].append(fno)
                    rows["frame"].append(bytes(payload[fno * 256 : (fno + 1) * 256]))
            yield pd.DataFrame(rows)

    return df.select(id_col, media_col).mapInPandas(
        batches, schema="doc_id long, frame_no int, frame binary"
    )
