"""Custom stateful streaming operator (applyInPandasWithState):
session counts agree with the batch sessionizer."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zed_spark.analytics import session_stats
from zed_spark.sources.readers import read_table
from zed_spark.streaming import stream_events
from zed_spark.streaming.stateful import streaming_sessions
from zed_spark.streaming.windows import run_to_completion


def test_streaming_sessions_match_batch(spark):
    stream = stream_events(spark, f"{SF_DIR}/events.parquet")
    out = run_to_completion(
        streaming_sessions(stream), name="t_sessions", mode="append"
    )
    # the stream emits open sessions incrementally; take the FINAL
    # state per (user, session_start)
    got = (
        out.groupBy("user_id", "session_start")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = session_stats(read_table(spark, SF_DIR, "events"), gap="30 minutes")
    want = batch.select(
        "user_id",
        F.timestamp_seconds(F.col("start_epoch")).alias("session_start"),
        "n_events",
    )
    got_set = {(r["user_id"], r["session_start"], r["n_events"]) for r in got.collect()}
    want_set = {(r["user_id"], r["session_start"], r["n_events"]) for r in want.collect()}
    assert got_set == want_set
