"""Scale-path join strategies: salted joins for hot keys, bucketed
tables for shuffle-free co-located joins."""

import pytest
from pyspark.sql import functions as F

from zed_spark.operators.join import join, salted_join


def test_salted_join_matches_plain(spark):
    # heavily skewed left side: 90% of rows share one key
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 7).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [(7, "hot"), (950, "cold")], "k long, rv string"
    )
    plain = join(left, right, "k", "k", "inner")
    salted = salted_join(left, right, "k", "k", "inner", salt=4)
    assert salted.count() == plain.count() == 901
    a = sorted((r["lv"], r["rv"]) for r in plain.collect())
    b = sorted((r["lv"], r["rv"]) for r in salted.collect())
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, lv string")
    right = spark.createDataFrame([(1, "r")], "k long, rv string")
    out = salted_join(left, right, "k", "k", "left", salt=3)
    rows = {r["lv"]: r["rv"] for r in out.collect()}
    assert rows == {"a": "r", "b": None}


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates rows: the join
    plan contains NO Exchange (the 100 TB co-located join strategy;
    reference analog: pool key-ordering, SURVEY §4)."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    orders = spark.range(1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 5).alias("pri")
    )
    lines = spark.range(5000).select(
        (F.col("id") % 1000).alias("o_key"), F.col("id").alias("line")
    )
    # external tables at a temp location (warehouse dir is a static conf)
    (orders.write.bucketBy(8, "o_key").sortBy("o_key").mode("overwrite")
     .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders"))
    (lines.write.bucketBy(8, "o_key").sortBy("o_key").mode("overwrite")
     .option("path", str(tmp_path / "b_lines")).saveAsTable("b_lines"))
    # force a non-broadcast join so bucket co-location is what
    # avoids the shuffle (broadcast would hide it on tiny tables)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lines").join(spark.table("b_orders"), "o_key")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        assert "SortMergeJoin" in plan
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
