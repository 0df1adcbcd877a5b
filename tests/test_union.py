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


def test_fuse_tagged_unions(spark):
    """fuse(unions='tagged') builds first-class zed-style union
    values instead of collapsing to string (complex.go:290-330)."""
    from zed_spark.operators.fuse import fuse_dataframes
    from zed_spark.union import union_tag, union_value

    a = spark.createDataFrame([(1, 42)], "id long, x long")
    b = spark.createDataFrame([(2, "hello")], "id long, x string")
    out = fuse_dataframes([a, b], unions="tagged")
    xt = out.schema["x"].dataType
    assert [f.name for f in xt.fields] == ["tag", "v0", "v1"]
    assert xt["v0"].dataType.simpleString() == "bigint"
    assert xt["v1"].dataType.simpleString() == "string"
    rows = {r["id"]: r["x"] for r in out.collect()}
    assert rows[1]["tag"] == 0 and rows[1]["v0"] == 42 and rows[1]["v1"] is None
    assert rows[2]["tag"] == 1 and rows[2]["v1"] == "hello"
    # dispatch helpers work on the fused column
    got = out.select("id", union_tag(F.col("x")).alias("t"),
                     union_value(F.col("x"), 1).alias("s")).collect()
    m = {r["id"]: (r["t"], r["s"]) for r in got}
    assert m[1] == (0, None) and m[2] == (1, "hello")


def test_fuse_tagged_union_widens(spark):
    """A third shape's new type joins the union with remapped tags."""
    from zed_spark.operators.fuse import fuse_dataframes

    a = spark.createDataFrame([(1, 42)], "id long, x long")
    b = spark.createDataFrame([(2, "hello")], "id long, x string")
    c = spark.createDataFrame([(3, True)], "id long, x boolean")
    out = fuse_dataframes([fuse_dataframes([a, b], unions="tagged"), c],
                          unions="tagged")
    xt = out.schema["x"].dataType
    assert [f.name for f in xt.fields] == ["tag", "v0", "v1", "v2"]
    # canonical member order (union.py _ZED_TYPE_RANK, mirroring the
    # reference's primitive type IDs): long < boolean < string
    rows = {r["id"]: r["x"] for r in out.collect()}
    assert rows[1]["tag"] == 0 and rows[1]["v0"] == 42
    assert rows[3]["tag"] == 1 and rows[3]["v1"] is True
    assert rows[2]["tag"] == 2 and rows[2]["v2"] == "hello"
