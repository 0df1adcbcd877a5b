"""Reference-derived byte/text vectors for the binary + text codecs.

Round-10 lesson (VERDICT r10 "what's wrong" #1): an encoder and
decoder that agree WITH EACH OTHER pass every round-trip test while
being binary-incompatible with the reference (the zigzag bug). These
tests pin vectors derived BY HAND from the reference algorithms —
with file:line provenance — and add cross-implementation property
tests (repo encoder vs an independent in-test reference decoder, and
vice versa) so a mutually-consistent drift in either side fails.

Provenance used throughout:
  - zcode/counted.go:12-43  counted uvarint = little-endian bytes of
    u64 with trailing zeros trimmed (zero encodes as EMPTY)
  - zcode/counted.go:46-76  counted varint: u64 = i<<1 for i>=0,
    uint64(-i)<<1|1 for i<0 (64-bit wrap: MinInt64 -> code 1)
  - zson/formatter.go:803-809  float64 text: "%d." when
    f == float64(int64(f)), else strconv 'g' shortest
  - zio/zeekio/format.go:35-38  zeek/text/table float: 'f' -1
    (shortest digits, always positional)
  - pkg/nano/duration.go:39-87  duration text units y/d/h/m/s/ms/us/ns
  - time.RFC3339Nano  time text (zson/formatter.go:787-788)
"""

import pytest

from zed_spark.sources.zng import _decode_prim, _encode_body, _int_bytes


# --- independent in-test implementations (straight from counted.go) --------


def ref_append_counted_varint(i: int) -> bytes:
    """zcode/counted.go:69-76, re-implemented independently of
    zed_spark.sources.zng (int arithmetic + to_bytes, no shifts-and-
    trim loop shared with the repo's encoder)."""
    if i >= 0:
        u64 = (i << 1) & 0xFFFFFFFFFFFFFFFF
    else:
        u64 = (((-i) & 0xFFFFFFFFFFFFFFFF) << 1 | 1) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while u64:
        out.append(u64 & 0xFF)
        u64 >>= 8
    return bytes(out)


def ref_decode_counted_varint(b: bytes) -> int:
    """zcode/counted.go:46-57, independent decode."""
    u64 = int.from_bytes(b, "little")
    if u64 & 1:
        u64 >>= 1
        if u64 == 0:
            return -(2**63)
        return -u64
    return u64 >> 1


# --- counted-varint byte vectors --------------------------------------------

# hand-computed from counted.go:46-76 (little-endian, trailing zeros
# trimmed; negative -> odd code; MinInt64 wraps to code 1)
INT64_VECTORS = {
    0: b"",
    1: b"\x02",
    -1: b"\x03",
    2: b"\x04",
    -2: b"\x05",
    300: b"\x58\x02",          # 600 = 0x258
    -300: b"\x59\x02",         # 601 = 0x259
    2**62: b"\x00" * 7 + b"\x80",   # u64 = 1<<63
    2**63 - 1: b"\xfe" + b"\xff" * 7,
    -(2**63 - 1): b"\xff" * 8,
    -(2**63): b"\x01",         # the r10 zigzag catch: code 1 = MinInt64
}


def test_counted_varint_byte_vectors():
    from pyspark.sql import types as T

    for i, want in INT64_VECTORS.items():
        assert _int_bytes(i) == want, f"{i}: {_int_bytes(i)!r} != {want!r}"
        # the ZNG value body for an int64 IS the counted varint
        assert _encode_body(i, T.LongType()) == want
        # repo decoder reads reference-produced bytes
        assert _decode_prim("int64", want) == i
        # the independent implementations agree on both directions
        assert ref_append_counted_varint(i) == want
        assert ref_decode_counted_varint(want) == i


def test_counted_varint_cross_implementation_property():
    """Repo encoder ↔ independent reference decoder and vice versa —
    the test shape that would have caught the r10 zigzag bug."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=400, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def prop(i):
        assert ref_decode_counted_varint(_int_bytes(i)) == i
        assert _decode_prim("int64", ref_append_counted_varint(i)) == i

    prop()


# --- VNG: value-segment bytes + segmap edges --------------------------------


def _tagged(body: bytes | None) -> bytes:
    """ZNG tag framing: uvarint(len+1), 0 = null (zng spec §values)."""
    if body is None:
        return b"\x00"
    n = len(body) + 1
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out) + body


def test_vng_value_segment_bytes():
    """The VNG data section carries column streams of tagged
    counted-varint bodies — negative ints and pre-epoch times land as
    the reference bytes (docs/formats/vng.md data section +
    zcode/counted.go)."""
    from pyspark.sql import types as T

    from zed_spark.sources.vng import encode_vng, parse_vng

    schema = T.StructType([T.StructField("a", T.LongType())])
    rows = [{"a": -1}, {"a": -300}, {"a": -(2**63)}, {"a": None}]
    data = encode_vng(rows, schema)
    # nulls ride the PRESENCE column (vng.md "Presence Columns"), so
    # the value stream holds exactly the three present values...
    want_stream = _tagged(b"\x03") + _tagged(b"\x59\x02") + _tagged(b"\x01")
    assert want_stream in bytes(data), "int column stream not reference bytes"
    # ...and the presence stream holds runs [3 present, 1 absent]
    assert want_stream + _tagged(b"\x06") + _tagged(b"\x02") in bytes(data)
    vals, _types = parse_vng(bytes(data))
    assert [v["a"] for v in vals] == [-1, -300, -(2**63), None]


def test_vng_pre_epoch_time_and_rendering():
    """Pre-epoch timestamps ride negative counted varints and render
    to the reference RFC3339Nano text."""
    import datetime

    from pyspark.sql import types as T

    from zed_spark.sources.vng import encode_vng, parse_vng, render_zson

    t = datetime.datetime(1969, 12, 31, 23, 59, 59, 500000,
                          tzinfo=datetime.timezone.utc)
    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    data = encode_vng([{"ts": t}], schema)
    # -0.5 s = -500_000_000 ns -> u64 = 1_000_000_001 = 0x3B9ACA01
    assert _tagged(b"\x01\xca\x9a\x3b") in bytes(data)
    vals, _types = parse_vng(bytes(data))
    got = vals[0]["ts"]
    assert render_zson(got, ("prim", "time")).startswith(
        "1969-12-31T23:59:59.5"
    )


def test_vng_segmap_edges():
    """Segmap edge sizes: zero rows -> no value segments but a valid
    parseable object; segment maps tile the data section (offsets
    monotone, in bounds, length == mem_length, compression 0)."""
    from pyspark.sql import types as T

    from zed_spark.sources.vng import _find_trailer, encode_vng, parse_vng
    from zed_spark.sources.zng import parse_zng

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("s", T.StringType())]
    )
    assert parse_vng(bytes(encode_vng([], schema)))[0] == []

    rows = [{"a": 1, "s": ""}, {"a": None, "s": None}, {"a": 2, "s": "x"}]
    data = bytes(encode_vng(rows, schema))
    vals, _types = parse_vng(data)
    assert [v["s"] for v in vals] == ["", None, "x"]  # empty != null

    trailer, off = _find_trailer(data)
    assert trailer is not None and trailer["magic"] == "vng"
    sections = trailer["sections"]
    assert len(sections) == 2 and sum(sections) == off
    # walk every segmap in the reassembly stream
    reasm = parse_zng(data[sections[0]:off])

    def walk(v, out):
        if isinstance(v, dict):
            if {"offset", "length", "mem_length", "compression_format"} <= set(v):
                out.append(v)
            else:
                for x in v.values():
                    walk(x, out)
        elif isinstance(v, (list, tuple)):
            for x in v:
                walk(x, out)

    segs: list = []
    walk(reasm, segs)
    assert segs, "no segmaps found in reassembly"
    for s in segs:
        assert s["compression_format"] == 0
        assert s["length"] == s["mem_length"] >= 1
        assert 0 <= s["offset"] and s["offset"] + s["length"] <= sections[0]


# --- ZSON/ZJSON float + time + duration text vectors -------------------------

# zson/formatter.go:803-809: %d. for integer-valued in int64 range,
# else strconv 'g' -1; Inf/NaN fall to 'g' ("+Inf"/"-Inf"/"NaN")
FLOAT64_TEXT_VECTORS = [
    (3.0, "3."),
    (-2.0, "-2."),
    (-0.0, "0."),                      # int64(-0.0) == 0
    (1.5, "1.5"),
    (1e16, "10000000000000000."),      # integral, in int64 range
    (float(-(2**63)), "-9223372036854775808."),
    (2.0**63, "9.223372036854776e+18"),  # int64 overflow -> 'g'
    (1e300, "1e+300"),
    (0.0001, "0.0001"),
    (1e-05, "1e-05"),                  # 'g' exponent threshold
    (1.2345678901234567, "1.2345678901234567"),
    (float("inf"), "+Inf"),
    (float("-inf"), "-Inf"),
    (float("nan"), "NaN"),
]


def test_float64_zson_text_vectors():
    from zed_spark.functions.zfloat import format_float64

    for f, want in FLOAT64_TEXT_VECTORS:
        assert format_float64(f) == want, f"{f!r}: {format_float64(f)} != {want}"


def test_float64_text_parses_back():
    """Formatter vs parser cross-check: every formatted float64
    reparses to the identical double (C strtod is the independent
    implementation here)."""
    hypothesis = pytest.importorskip("hypothesis")
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zed_spark.functions.zfloat import format_float64

    @settings(max_examples=400, deadline=None)
    @given(st.floats(allow_nan=False))
    def prop(f):
        s = format_float64(f)
        assert float(s) == f
        assert "e" not in s or "." in s or s.lstrip("-")[0].isdigit()

    prop()
    assert math.isnan(float(format_float64(float("nan"))))


def test_float32_zson_text_vectors():
    """float32 (and float16) print 32-BIT shortest digits
    (zson/formatter.go:789-802, strconv 'g' -1 32): 0.1f is "0.1",
    not the 17-digit double expansion of its float32 value."""
    from zed_spark.functions.zfloat import format_float32

    assert format_float32(0.10000000149011612) == "0.1"  # float64(0.1f)
    assert format_float32(2.0) == "2."
    assert format_float32(-0.0) == "0."
    assert format_float32(32.31999969482422) == "32.32"  # float64(32.32f)
    assert format_float32(float("inf")) == "+Inf"
    assert format_float32(2.19921875) == "2.1992188"  # float16(2.2) widened


def test_float_positional_zeek_vectors():
    """zio/zeekio/format.go:35-38 — Go 'f' -1: shortest digits,
    always positional (never exponent form)."""
    from zed_spark.functions.zfloat import format_float_positional

    vectors = [
        (3.0, "3"),
        (0.5, "0.5"),
        (1e-07, "0.0000001"),
        (1e16, "10000000000000000"),
        (-0.0, "-0"),
        (2.0**70, "1180591620717411300000"),
        (float("inf"), "+Inf"),
        (float("nan"), "NaN"),
    ]
    for f, want in vectors:
        assert format_float_positional(f) == want
    # 32-bit shortest: 0.1f32 prints "0.1", not the double expansion
    assert format_float_positional(0.10000000149011612, bits=32) == "0.1"


def test_float_json_vectors():
    """Go encoding/json float text (the reference `-f json` writer
    marshals through it): ES6 positional within [1e-6, 1e21),
    trimmed-exponent 'e' form outside."""
    from zed_spark.functions.zfloat import format_float_json

    vectors = [
        (3.0, "3"),
        (1.5, "1.5"),
        (1e-5, "0.00001"),          # Python repr says 1e-05
        (0.000001, "0.000001"),     # boundary: still positional
        (1e-7, "1e-7"),             # exponent leading zero trimmed
        (1.5e-7, "1.5e-7"),
        (1.23e-10, "1.23e-10"),
        (1e17, "100000000000000000"),
        (1e21, "1e+21"),
        (2.5e22, "2.5e+22"),
        (-0.0, "-0"),
    ]
    for f, want in vectors:
        assert format_float_json(f) == want, (f, format_float_json(f))


def test_json_compact_serializer_matches_dumps():
    """_dumps_compact is byte-identical to json.dumps(compact) except
    for the Go float form."""
    import json

    from zed_spark.sources.jsonio import _dumps_compact

    obj = {"a": [1, "x\"y", None, True, {"k": "日本"}], "b": {"n": -5}}
    assert _dumps_compact(obj) == json.dumps(
        obj, ensure_ascii=False, separators=(",", ":")
    )
    assert _dumps_compact({"f": 1e-5}) == '{"f":0.00001}'


def test_json_pretty_serializer_go_floats_and_dumps_shape():
    """Pretty JSON keeps the Go encoding/json float form (the
    reference's tab-driven writer marshals primitives through the
    same encoder compact or pretty, zio/jsonio/writer.go:48,235-241)
    and otherwise matches json.dumps(indent=N) byte for byte."""
    import json

    from zed_spark.sources.jsonio import _dumps_compact

    obj = {"a": [1, "x", None, True], "b": {}, "c": [], "d": {"k": -5}}
    assert _dumps_compact(obj, pretty=2) == json.dumps(
        obj, ensure_ascii=False, indent=2
    )
    assert _dumps_compact(obj, pretty=4) == json.dumps(
        obj, ensure_ascii=False, indent=4
    )
    # Python json.dumps(indent) would say 1e-05 / 1e-07 here
    got = _dumps_compact({"f": [1e-5, 1e-7]}, pretty=4)
    assert got == '{\n    "f": [\n        0.00001,\n        1e-7\n    ]\n}'


def test_native_json_sink_float_form_documented(spark, tmp_path):
    """The DISTRIBUTED json sink (df.write.json — Spark's Jackson
    writer) renders floats in Java shortest form ("1.0E-7"), not the
    reference's Go form ("1e-7"). This is a DOCUMENTED divergence for
    the bulk path: both forms are shortest-round-trip, so values
    survive exactly (asserted here); reference-exact TEXT comes from
    the gated to_json_text path (asserted in the pretty/compact
    vector tests). If this test ever fails on the value assertion,
    the sink is corrupting floats, not just spelling them."""
    import json

    from zed_spark.sources.jsonio import to_json_text
    from zed_spark.sources.sinks import write_any

    vals = [1.5e-7, 1e-5, 2.5e22, 0.1, -0.0, 3.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, f double")
    out = str(tmp_path / "j")
    write_any(df, out, fmt="json")
    back = {r["i"]: r["f"] for r in spark.read.json(out).collect()}
    import struct as _s

    for i, v in enumerate(vals):
        assert _s.pack("<d", back[i]) == _s.pack("<d", v), (i, v, back[i])
    # the reference-exact text path for the same frame
    txt = to_json_text(df.orderBy("i"))
    assert '"f":1.5e-7' in txt and '"f":0.00001' in txt and '"f":2.5e+22' in txt


def test_time_duration_text_vectors():
    """RFC3339Nano times (incl. pre-epoch) and pkg/nano durations."""
    from zed_spark.functions.ztime import format_duration_ns, format_time_ns

    assert format_time_ns(-1) == "1969-12-31T23:59:59.999999999Z"
    assert format_time_ns(1_500_000_000) == "1970-01-01T00:00:01.5Z"
    assert format_time_ns(0) == "1970-01-01T00:00:00Z"
    assert format_time_ns(-(365 * 24 * 3600 * 1_000_000_000)) == (
        "1969-01-01T00:00:00Z"
    )

    assert format_duration_ns(-90 * 10**9) == "-1m30s"
    assert format_duration_ns(1500) == "1.5us"
    assert format_duration_ns(-1500) == "-1.5us"
    assert format_duration_ns(0) == "0s"
    assert format_duration_ns(-(2**63)) == "-292y171d23h47m16.854775808s"


def test_zjson_value_text_vectors():
    """The ZJSON value strings are the ZSON primitive text
    (docs/formats/zjson.md; writer encodePrimitive ->
    zson.FormatPrimitive) — pin the numeric/time edges through the
    repo's zjson value renderer."""
    from zed_spark.sources.zjson import _desc_prim_str

    assert _desc_prim_str(3.0, "float64") == "3."
    assert _desc_prim_str(-0.0, "float64") == "0."
    assert _desc_prim_str(float("inf"), "float64") == "+Inf"
    assert _desc_prim_str(1e16, "float64") == "10000000000000000."
    assert _desc_prim_str(-(2**63), "int64") == "-9223372036854775808"
    assert _desc_prim_str(-1, "time") == "1969-12-31T23:59:59.999999999Z"
    assert _desc_prim_str(-90 * 10**9, "duration") == "-1m30s"


def test_zjson_encoder_parser_cross_property():
    """ZJSON value text: the writer's renderer (_desc_prim_str) and
    the reader's classifier (_decode_prim) are independent
    implementations — every rendered int/float/time/duration must
    reparse to the identical value (the parser-vs-encoder shape the
    round-10 verdict asked for per codec)."""
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zed_spark.sources.zjson import _decode_prim, _desc_prim_str

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def ints(i):
        assert _decode_prim(_desc_prim_str(i, "int64"), "int64") == i

    @settings(max_examples=300, deadline=None)
    @given(st.floats(allow_nan=False))
    def floats(f):
        got = _decode_prim(_desc_prim_str(f, "float64"), "float64")
        assert float(got) == f

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**62), max_value=2**62))
    def times(ns):
        # text is RFC3339Nano; the parser lands on Spark's µs-precision
        # timestamp (ns precision rides shadow columns elsewhere), so
        # compare at the µs floor
        from datetime import datetime, timedelta, timezone

        got = _decode_prim(_desc_prim_str(ns, "time"), "time")
        want = datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(
            microseconds=ns // 1000
        )
        assert got == want

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1))
    def durations(ns):
        got = _decode_prim(_desc_prim_str(ns, "duration"), "duration")
        assert got == ns

    ints()
    floats()
    times()
    durations()
