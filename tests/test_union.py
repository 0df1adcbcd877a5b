from pyspark.sql import functions as F
from pyspark.sql import types as T

from zed_spark.union import (
    make_union,
    mixed_array,
    union_tag,
    union_type,
    union_unwrap,
    union_value,
)

TYPES = [T.LongType(), T.StringType()]


def test_union_roundtrip(spark):
    df = spark.range(1).select(
        make_union(0, F.lit(42), 2, TYPES).alias("a"),
        make_union(1, F.lit("hi"), 2, TYPES).alias("b"),
    )
    row = df.first()
    assert row["a"]["tag"] == 0 and row["a"]["v0"] == 42 and row["a"]["v1"] is None
    assert row["b"]["tag"] == 1 and row["b"]["v1"] == "hi"


def test_union_access_and_unwrap(spark):
    df = spark.range(1).select(make_union(1, F.lit("x"), 2, TYPES).alias("u"))
    got = df.select(
        union_tag(F.col("u")).alias("t"),
        union_value(F.col("u"), 0).alias("v0"),
        union_value(F.col("u"), 1).alias("v1"),
        union_unwrap(F.col("u"), 2).alias("s"),
    ).first()
    assert (got["t"], got["v0"], got["v1"], got["s"]) == (1, None, "x", "x")


def test_mixed_array(spark):
    arr = mixed_array([(0, F.lit(1)), (1, F.lit("a")), (0, F.lit(2))], TYPES)
    df = spark.range(1).select(arr.alias("xs"))
    assert df.schema["xs"].dataType.elementType == union_type(*TYPES)
    xs = df.first()["xs"]
    assert [x["tag"] for x in xs] == [0, 1, 0]
    assert xs[1]["v1"] == "a"
