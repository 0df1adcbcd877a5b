"""Streaming deduplication — the training-data dedup ops on an
unbounded stream.

A batch dedup (textops/dedup.py) re-shuffles the whole corpus per
run; a streaming pipeline dedups incrementally instead:

  - `streaming_exact_dedup`: dropDuplicates on the normalized
    content hash with a watermark — state is bounded to the
    watermark horizon (Spark evicts older keys), which is the only
    sound streaming semantics: an exact duplicate arriving later
    than the watermark is treated as new, a documented trade-off of
    every streaming dedup.
  - `streaming_simhash`: per-document simhash fingerprints computed
    on the stream (stateless — fingerprinting is a map), letting a
    downstream batch job do the near-dup banding over the
    accumulated fingerprint table (the standard lambda split: cheap
    per-event work in the stream, quadratic-candidate work in
    compacted batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct (normalized) content
    within the watermark horizon."""
    hashed = docs.withColumn("content_hash", F.md5(normalize_text(F.col(text_col))))
    return hashed.withWatermark(ts_col, watermark).dropDuplicates(
        ["content_hash"]
    )


def streaming_simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless per-document fingerprints on the stream (the
    banding/candidate join runs downstream in batch)."""
    from zed_spark.textops.simhash import simhash_col

    return docs.withColumn("simhash", simhash_col(F.col(text_col)))
