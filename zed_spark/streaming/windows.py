"""Windowed streaming aggregation over the events table.

Batch `every(dur)` (zed's only windowing, SURVEY §2.5) generalizes
here to true streaming: watermark + tumbling window + append mode.
The batch and streaming results agree on closed windows — tested in
tests/test_streaming.py by driving a file stream to completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),  # parquet timestamp[us]
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the events parquet (file-source streaming —
    the same plan works on kafka by swapping the source).

    File streaming sources need a DIRECTORY; when given a single
    file like .../sf0.001/events.parquet we stream its parent dir
    with a glob filter."""
    import os

    reader = spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    # watermarks require TIMESTAMP (not NTZ); session tz is pinned
    # UTC so the cast is numerically a no-op
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + sums with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_to_completion(
    query_df: DataFrame, name: str = "stream_out", mode: str = "complete"
) -> DataFrame:
    """Drive a streaming DataFrame to completion against the memory
    sink (for tests / bounded backfills) and return the result.

    mode='complete' re-emits all windows each trigger — right for a
    bounded backfill; 'append' emits only watermark-closed windows
    (the production streaming mode)."""
    q = (
        query_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return query_df.sparkSession.sql(f"SELECT * FROM {name}")
