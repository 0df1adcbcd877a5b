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


def test_simhash_col_matches_batch(spark):
    """The stream-safe per-row simhash equals the batch explode+agg
    fingerprints."""
    from tests.conftest import SF_DIR
    from zed_spark.sources.readers import read_table
    from zed_spark.textops.simhash import simhash, simhash_col

    docs = read_table(spark, SF_DIR, "documents").limit(50)
    batch = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    perrow = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", simhash_col(F.col("text")).alias("s")).collect()
    }
    assert perrow == batch


def test_streaming_exact_dedup(spark, tmp_path):
    """Streaming dedup keeps the first arrival per content hash."""
    import json

    from zed_spark.streaming.dedup import streaming_exact_dedup
    from pyspark.sql import types as T

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "alpha beta", "ts": "2024-01-01T00:00:00"},
        {"doc_id": 2, "text": "alpha  beta", "ts": "2024-01-01T00:01:00"},  # dup (norm)
        {"doc_id": 3, "text": "gamma", "ts": "2024-01-01T00:02:00"},
    ]
    (src / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    out = streaming_exact_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select doc_id from dedup_sink").collect()
    finally:
        q.stop()
    ids = sorted(r["doc_id"] for r in got)
    assert 3 in ids and len(ids) == 2
    assert 1 in ids or 2 in ids  # one of the duplicate pair survives


def test_streaming_incremental_dedup(spark, tmp_path):
    """The stateless streaming filter agrees with the batch
    incremental op on crawls with no stream-internal duplicates
    (which the streaming contract passes through by design)."""
    import json

    from pyspark.sql import types as T

    from zed_spark.streaming.dedup import streaming_incremental_dedup
    from zed_spark.textops.incremental import build_signatures, incremental_dedup

    base = [
        (10, "the quick brown fox jumps over the lazy dog today"),
        (11, "the quick brown fox jumps over the lazy dog tonight"),
        (20, "pack my box with five dozen fresh liquor jugs now"),
        (30, "completely unrelated text about distributed query engines"),
        (40, "tiny"),
    ]
    new = [
        (50, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (51, "the quick brown fox jumps over the lazy dog sometime"),  # near dup
        (52, "an entirely fresh document about columnar formats and arrows"),
        (53, "tiny"),  # copy of a shingle-less text: never clusters, kept
    ]
    old_df = spark.createDataFrame(base, "doc_id long, text string")
    sigs = build_signatures(old_df, k_shingle=2, bands=8, threshold=0.35)

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "b0.json").write_text(
        "\n".join(json.dumps({"doc_id": i, "text": t}) for i, t in new)
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    out = streaming_incremental_dedup(
        stream, sigs, k_shingle=2, bands=8, threshold=0.35
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("inc_dedup_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r["doc_id"] for r in spark.sql("select doc_id from inc_dedup_sink").collect()
        )
    finally:
        q.stop()
    assert got == [52, 53]

    # batch reference: same kept set (new ids all larger, no
    # stream-internal dups, so the contracts coincide)
    new_df = spark.createDataFrame(new, "doc_id long, text string")
    kept, _retired = incremental_dedup(
        new_df, sigs, k_shingle=2, bands=8, threshold=0.35
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == got


def test_streaming_decontaminate(spark, tmp_path):
    """The stateless stream-static decontamination filter passes
    exactly the docs the batch op keeps (min_hits=1)."""
    import json
    import os

    from zed_spark.streaming.dedup import streaming_decontaminate
    from zed_spark.textops.decontam import decontaminate

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "completely unrelated text with no benchmark overlap"),
        (2, "the quick brown fox appears here too"),
        (3, "another clean document entirely its own words"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "docs.json", "w") as f:
        for i, t in rows:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "eval_id long, prompt string"
    )
    batch_docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        r["doc_id"]
        for r in decontaminate(
            batch_docs, eval_df, n=3, min_hits=1, eval_text_col="prompt"
        ).collect()
    )

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    out = streaming_decontaminate(
        stream, eval_df, n=3, eval_text_col="prompt"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("decontam_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("select doc_id from decontam_sink").collect()
    )
    assert got == want == [1, 3]
