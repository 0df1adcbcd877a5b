"""Shape-grouping of heterogeneous ndjson (FIXTURES.md F6: two row
shapes through one pipeline)."""

import pytest
from pyspark.sql import types as T

from zed_spark.sources.shapes import (
    fuse_shape_groups,
    sample_shapes,
    shape_groups,
    typeof_shapes,
)

MIXED = """\
{"ts": "2024-01-01T00:00:00", "x": 1, "note": "alpha"}
{"ts": "2024-01-01T01:00:00", "x": 2.5, "extra": ["a", "b"]}
{"ts": "2024-01-01T02:00:00", "x": 2, "note": "beta"}
{"ts": "2024-01-01T03:00:00", "x": 7.5, "extra": ["c"]}
"""


@pytest.fixture(scope="module")
def groups(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("mixed") / "mixed.ndjson"
    p.write_text(MIXED)
    return shape_groups(spark, str(p))


def test_two_shapes_detected(groups):
    assert len(groups) == 2
    assert {tuple(df.columns) for df in groups.values()} == {
        ("ts", "x", "note"), ("ts", "x", "extra"),
    }
    assert all(df.count() == 2 for df in groups.values())


def test_fuse_supersets(groups):
    fused = fuse_shape_groups(groups)
    assert set(fused.columns) == {"ts", "x", "note", "extra"}
    assert fused.count() == 4
    # int shape + double shape → double (numeric widening)
    assert isinstance(fused.schema["x"].dataType, T.DoubleType)
    assert fused.filter("note is not null").count() == 2


def test_sample_one_per_shape(groups):
    assert sample_shapes(groups).count() == 2


def test_typeof_shapes(groups):
    names = typeof_shapes(groups)
    assert len(names) == 2
    assert all(n.startswith("{") for n in names.values())


def test_fuse_aggregate_never_widens_primitives(spark):
    """agg/schema.go merge() forms a union for ANY two distinct
    primitives — no numeric widening (round-7 ADVICE): duration+time
    stays (duration,time), time+int64 keeps the time member,
    uint64+int64 keeps both ranges, int32+int64 is a union."""
    from zed_spark.sources.ztypes import (
        fuse_descs,
        parse_type_string,
        render,
    )

    def fz(x, y):
        return render(fuse_descs(parse_type_string(x), parse_type_string(y)))

    assert fz("duration", "time") == "(duration,time)"
    assert sorted(fz("time", "int64")[1:-1].split(",")) == ["int64", "time"]
    assert sorted(fz("uint64", "int64")[1:-1].split(",")) == ["int64", "uint64"]
    assert sorted(fz("int32", "int64")[1:-1].split(",")) == ["int32", "int64"]
    assert fz("int64", "int64") == "int64"
    # array+set merges to array; records inside a union fold into one
    assert fz("[int32]", "|[int64]|") == "[(int32,int64)]"
    assert fz("{a:int64}", "(string,{b:string})") in (
        "(string,{a:int64,b:string})",
        "({a:int64,b:string},string)",
    )
