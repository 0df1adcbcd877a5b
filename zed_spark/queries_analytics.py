"""Graded queries for the analytics extensions (windows, grouping
sets, percentiles) — all oracle-backed standard SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zed_spark.analytics import (
    approx_percentiles,
    exact_percentiles,
    pivot_agg,
    rollup_agg,
    session_stats,
    top_per_group,
)
from zed_spark.sources.readers import read_table


def sessionize_q(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, sf, "events")
    return session_stats(ev, gap="30 minutes")


# Two determinism rules learned from the round-1 driver run:
#   1. `CAST(ts AS TIMESTAMP)` truncates the parquet TIMESTAMP_NS to µs —
#      the same truncation read_table applies on the Spark side (`div
#      1000`) — so gap comparisons are made on identical values in both
#      engines at any SF (a gap within 1µs of the 30-min boundary would
#      otherwise split sessions differently).
#   2. `CAST(session_seq AS BIGINT)`: DuckDB SUM(int) yields HUGEINT,
#      which the driver's pandas fetch converts to float64 (2.0 vs
#      Spark's 2) — the round-1 hash mismatch. Every *output* column
#      must have a concrete non-HUGEINT type.
SESSIONIZE_SQL = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
s AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
r AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM s)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
  CAST(floor(epoch(MAX(ts))) AS BIGINT) AS end_epoch,
  CAST(floor(epoch(MIN(ts))) AS BIGINT) AS start_epoch
FROM r GROUP BY user_id, session_seq
"""


def top_per_group_q(spark: SparkSession, sf: str) -> DataFrame:
    od = read_table(spark, sf, "orders")
    top = top_per_group(od, ["o_orderpriority"], "o_totalprice", 3, tiebreak="o_orderkey")
    return top.select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")


TOP_PER_GROUP_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders) WHERE rank <= 3
"""


def pivot_q(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    src = ev.withColumn("props_k_bucket", F.when(k < 50, "low").otherwise("high"))
    return pivot_agg(src, "event_type", "props_k_bucket", ["low", "high"],
                     F.count(F.lit(1)))


PIVOT_SQL = """
SELECT event_type,
  COUNT(*) FILTER (WHERE CAST(props->>'$.k' AS BIGINT) < 50) AS low,
  COUNT(*) FILTER (WHERE CAST(props->>'$.k' AS BIGINT) >= 50) AS high
FROM events GROUP BY event_type
"""


def rollup_q(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, sf, "lineitem")
    # TWO-LEVEL rollup (round-12): Spark plans ROLLUP as
    # Expand -> HashAggregate, so every input row is replicated once
    # per grouping set (3x here) and pays the decimal(38,4) sum per
    # copy. Pre-aggregating at the finest granularity first shrinks
    # the Expand's input from |lineitem| to |distinct (flag, status)|
    # rows (~6), so the scan-side aggregate processes each row once
    # (guide §2.3: aggregate before the expensive operator).
    # Output-identical to rollup_agg(li, ...): count(1) == sum of
    # partial counts, and the decimal sum is EXACT (no floating-point
    # reorder), so every rolled-up level re-sums to the same value —
    # pinned by test_rollup_two_level_equals_direct, oracle unchanged.
    pre = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("l_quantity").cast("decimal(38,4)")).alias("__qty"),
    )
    out = rollup_agg(
        pre,
        ["l_returnflag", "l_linestatus"],
        {
            "n": F.sum("__n"),
            "qty": F.sum("__qty").cast("double"),
        },
    )
    return out


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def percentiles_q(spark: SparkSession, sf: str) -> DataFrame:
    li = read_table(spark, sf, "lineitem")
    return exact_percentiles(li, "l_extendedprice", ["l_returnflag"], [0.5, 0.9])


PERCENTILES_SQL = """
SELECT l_returnflag,
  quantile_cont(l_extendedprice, 0.5) AS p50,
  quantile_cont(l_extendedprice, 0.9) AS p90
FROM lineitem GROUP BY l_returnflag
"""


def percentiles_approx_q(spark: SparkSession, sf: str) -> DataFrame:
    """Scale-path percentiles, hash-graded via the truth-table-oracle
    pattern (round-6 VERDICT item 2; the shape embedding_lsh_agreement
    proved): the sketch's value for each group/percentile is rank-
    checked against the group itself in the same plan — the measured
    rank of the returned value must sit within the sketch's guaranteed
    error (`percentile_approx` rank error ≤ n/accuracy = 1e-4; graded
    bound 0.02 leaves discrete-data slack). A drifting sketch flips
    the booleans and the driver sees a red hash. Raw sketch values
    stay pytest-bounded in tests/test_operators.py."""
    li = read_table(spark, sf, "lineitem")
    ap = approx_percentiles(li, "l_extendedprice", ["l_returnflag"], [0.5, 0.9])
    j = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(ap), "l_returnflag"
    )
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("l_extendedprice") <= F.col("p50")).cast("long")).alias("r50"),
            F.sum((F.col("l_extendedprice") <= F.col("p90")).cast("long")).alias("r90"),
        )
        .select(
            "l_returnflag",
            (F.abs(F.col("r50") / F.col("n") - 0.5) <= 0.02).alias("p50_rank_ok"),
            (F.abs(F.col("r90") / F.col("n") - 0.9) <= 0.02).alias("p90_rank_ok"),
        )
    )


def percentiles_approx_raw_q(spark: SparkSession, sf: str) -> DataFrame:
    """The raw bounded-memory sketch aggregate — kept as the PINNED
    bench key so the timed battery stays byte-identical after the
    graded row became the rank-check truth table (round 7)."""
    li = read_table(spark, sf, "lineitem")
    return approx_percentiles(li, "l_extendedprice", ["l_returnflag"], [0.5, 0.9])


# truth-table oracle: one row per group, every rank bound must hold
PERCENTILES_APPROX_SQL = """
SELECT DISTINCT l_returnflag, true AS p50_rank_ok, true AS p90_rank_ok
FROM lineitem
"""
