"""Streaming windowed aggregation agrees with the batch every()
bucketing on the same data."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zed_spark.operators.summarize import summarize
from zed_spark.sources.readers import read_table
from zed_spark.streaming import stream_events, windowed_counts
from zed_spark.streaming.windows import run_to_completion


def test_stream_matches_batch(spark):
    stream = stream_events(spark, f"{SF_DIR}/events.parquet")
    assert stream.isStreaming
    result = run_to_completion(windowed_counts(stream), name="t_win")
    got = {
        (r["window_start"], r["event_type"]): r["n"] for r in result.collect()
    }

    ev = read_table(spark, SF_DIR, "events")
    batch = summarize(ev, by=["event_type"], every=("ts", "1 hour"),
                      n=("count", None))
    want = {(r["ts"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want
