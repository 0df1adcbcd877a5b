"""VNG reader/writer round trips (docs/formats/vng.md structure:
data section + reassembly ZNG stream + backward-scanned trailer)."""

import pytest
from pyspark.sql import types as T

from zed_spark.sources.vng import (
    encode_vng,
    is_vng,
    parse_vng,
    read_vng,
    render_zson,
)


def _rt(rows, schema):
    blob = encode_vng(rows, schema)
    assert is_vng(blob)
    vals, typestrs = parse_vng(blob)
    return vals, typestrs


def test_simple_round_trip():
    schema = T.StructType([T.StructField("a", T.LongType())])
    vals, ts = _rt([{"a": 1}, {"a": 2}], schema)
    assert vals == [{"a": 1}, {"a": 2}]
    assert ts == ["{a:int64}", "{a:int64}"]


def test_presence_runs_and_nested():
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField(
                "rec",
                T.StructType([T.StructField("x", T.DoubleType())]),
            ),
            T.StructField("arr", T.ArrayType(T.LongType())),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            T.StructField("b", T.BooleanType()),
        ]
    )
    rows = [
        {"s": "hi", "n": 7, "rec": {"x": 1.5}, "arr": [1, 2, None],
         "m": {"k": 1}, "b": True},
        {"s": None, "n": 8, "rec": None, "arr": [], "m": {}, "b": False},
        {"s": "yo", "n": None, "rec": {"x": None}, "arr": [3],
         "m": {"a": 2, "b": 3}, "b": None},
    ]
    vals, _ = _rt(rows, schema)
    assert vals == rows


def test_all_null_column():
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    rows = [{"a": 1, "b": None}, {"a": 2, "b": None}]
    vals, _ = _rt(rows, schema)
    assert vals == rows


def test_null_nested_containers():
    # null complex values INSIDE containers (advice r8: array element
    # that is itself a null array / null map value) ride a null
    # length tag in the lengths stream
    schema = T.StructType(
        [
            T.StructField("aa", T.ArrayType(T.ArrayType(T.LongType()))),
            T.StructField(
                "am",
                T.ArrayType(T.MapType(T.StringType(), T.LongType())),
            ),
        ]
    )
    rows = [
        {"aa": [[1, 2], None, []], "am": [{"k": 1}, None]},
        {"aa": None, "am": [None]},
        {"aa": [None], "am": None},
    ]
    vals, _ = _rt(rows, schema)
    assert vals == rows


def test_null_top_level_map_value():
    schema = T.StructType(
        [
            T.StructField(
                "m",
                T.MapType(
                    T.StringType(), T.MapType(T.StringType(), T.LongType())
                ),
            )
        ]
    )
    rows = [{"m": {"a": {"x": 1}, "b": None}}, {"m": None}]
    vals, _ = _rt(rows, schema)
    assert vals == rows


def test_empty_input():
    schema = T.StructType([T.StructField("a", T.LongType())])
    vals, ts = _rt([], schema)
    assert vals == [] and ts == []


def test_driver_size_gates():
    """The VNG on-ramp is driver-side by design (single sectioned
    file); oversized inputs/outputs must ERROR with conversion
    advice, never silently materialize (round-8 verdict item 2)."""
    import tempfile

    import zed_spark.sources.vng as vng_mod

    p = tempfile.mktemp(suffix=".vng")
    schema = T.StructType([T.StructField("a", T.LongType())])
    with open(p, "wb") as f:
        f.write(encode_vng([{"a": 1}], schema))
    old = vng_mod.VNG_MAX_BYTES
    vng_mod.VNG_MAX_BYTES = 4
    try:
        with pytest.raises(ValueError, match="gated|parquet"):
            vng_mod.read_vng(None, p)
    finally:
        vng_mod.VNG_MAX_BYTES = old

    class _FakeDF:
        schema = T.StructType([T.StructField("a", T.LongType())])

        def limit(self, n):
            return self

        def collect(self):
            return [{"a": i} for i in range(5)]

    old_rows = vng_mod._VNG_MAX_ROWS
    vng_mod._VNG_MAX_ROWS = 3
    try:
        with pytest.raises(ValueError, match="exceeds"):
            vng_mod.write_vng(_FakeDF(), tempfile.mktemp(suffix=".vng"))
    finally:
        vng_mod._VNG_MAX_ROWS = old_rows


def test_is_vng_negatives():
    assert not is_vng(b"")
    assert not is_vng(b"PAR1not a vng file")
    assert not is_vng(b"{a:1}\n" * 10)


def test_strips_internal_columns():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("__zed_missing", T.ArrayType(T.StringType())),
        ]
    )
    vals, ts = _rt([{"a": 1, "__zed_missing": ["x"]}], schema)
    assert vals == [{"a": 1}]
    assert ts == ["{a:int64}"]


def test_render_zson_primitives():
    from zed_spark.sources.ztypes import parse_type_string

    d = parse_type_string("{s:string,f:float64,b:bool,a:[int64]}")
    assert (
        render_zson({"s": 'q"t', "f": 2.0, "b": True, "a": [1]}, d)
        == '{s:"q\\"t",f:2.,b:true,a:[1]}'
    )


def test_read_vng_dataframe(spark):
    import tempfile

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    p = tempfile.mktemp(suffix=".vng")
    with open(p, "wb") as f:
        f.write(encode_vng([{"a": 1, "s": "x"}, {"a": 2, "s": "y"}], schema))
    df = read_vng(spark, p)
    rows = sorted((r["a"], r["s"]) for r in df.collect())
    assert rows == [(1, "x"), (2, "y")]


def test_larger_round_trip_multi_segment_order():
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    rows = [
        {"i": k, "s": None if k % 7 == 0 else f"v{k}"} for k in range(500)
    ]
    vals, _ = _rt(rows, schema)
    assert vals == rows
