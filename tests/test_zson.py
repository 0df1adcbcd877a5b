"""ZSON reader/writer: parser subset, Spark round-trip, and reads of
the reference's own testdata files (docs/formats/zson.md is the
spec; zio/zsonio is the reference implementation being mirrored)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from zed_spark.sources.zson import (
    ZMap,
    parse_zson,
    read_zson,
    read_zson_fused,
    write_zson,
)


def test_parse_primitives():
    vals = parse_zson(
        '{a:1,b:"hi",c:true,d:null,e:1.5,f:-Inf,g:NaN,h:0xdead,'
        "t:2024-05-30T04:04:28.123Z,ip:192.168.1.1,v6:fe80::1,dur:1.5h}"
    )
    (v,) = vals
    assert v["a"] == 1 and v["b"] == "hi" and v["c"] is True and v["d"] is None
    assert v["e"] == 1.5 and v["f"] == -math.inf and math.isnan(v["g"])
    assert v["h"] == bytes.fromhex("dead")
    assert v["t"].year == 2024 and v["t"].microsecond == 123000
    assert v["ip"] == "192.168.1.1" and v["v6"] == "fe80::1"
    assert v["dur"] == int(1.5 * 3600 * 1e9)


def test_parse_complex_and_decorators():
    vals = parse_zson(
        '{arr:[1,2],s:|["x","y"]|,m:|{"k":1}|,n:1 (int32),f:2 (float32),'
        "nested:{x:{y:9}}} /* c */ {second:true} // tail"
    )
    first, second = vals
    assert first["arr"] == [1, 2] and first["s"] == ["x", "y"]
    assert isinstance(first["m"], ZMap) and first["m"]["k"] == 1
    assert first["n"] == 1 and first["f"] == 2.0
    assert first["nested"]["x"]["y"] == 9
    assert second["second"] is True


def test_roundtrip_through_spark(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "plain", 1.5, True, [1, 2], ("in", 9), None),
            (2, 'quo"te\nnl', -0.25, False, [], ("x", -1), b"\xde\xad"),
            (3, None, float("inf"), None, None, None, None),
        ],
        "id long, s string, f double, b boolean, arr array<long>, "
        "st struct<a: string, n: long>, bin binary",
    )
    path = str(tmp_path / "rt")
    write_zson(df, path, single_file=True)
    groups = read_zson(spark, path)
    assert len(groups) == 1
    out = next(iter(groups.values()))
    assert out.columns == ["id", "s", "f", "b", "arr", "st", "bin"]
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["s"] == "plain" and got[1]["arr"] == [1, 2]
    assert got[1]["st"]["a"] == "in" and got[1]["st"]["n"] == 9
    assert got[2]["s"] == 'quo"te\nnl' and got[2]["f"] == -0.25
    assert bytes(got[2]["bin"]) == b"\xde\xad"
    assert got[3]["s"] is None and got[3]["f"] == float("inf")


def test_roundtrip_timestamps(spark, tmp_path):
    from tests.conftest import SF_DIR
    from zed_spark.sources.readers import read_table

    ev = read_table(spark, SF_DIR, "events").select("event_id", "ts").limit(50)
    path = str(tmp_path / "ts")
    write_zson(ev, path, single_file=True)
    out = read_zson_fused(spark, path)
    want = {r["event_id"]: r["ts"] for r in ev.collect()}
    got = {r["event_id"]: r["ts"] for r in out.collect()}
    assert got == want


def test_mixed_shapes(spark, tmp_path):
    p = tmp_path / "mixed.zson"
    p.write_text('{a:1,b:"x"}\n{a:2,b:"y"}\n{c:true}\n')
    groups = read_zson(spark, str(p))
    assert set(groups) == {"a,b", "c"}
    assert groups["a,b"].count() == 2 and groups["c"].count() == 1
    fused = read_zson_fused(spark, str(p))
    assert fused.count() == 3 and set(fused.columns) == {"a", "b", "c"}


REF_ZSON = "/root/reference/lake/testdata/babble-norm.zson"
REF_PRETTY = "/root/reference/zson/test.zson"


@pytest.mark.skipif(not os.path.exists(REF_ZSON), reason="reference data absent")
def test_reads_reference_testdata(spark):
    groups = read_zson(spark, REF_ZSON)
    (df,) = groups.values()
    assert df.count() == 1000
    assert df.columns == ["ts", "s", "v"]
    assert df.schema["v"].dataType.simpleString() == "bigint"
    assert df.schema["ts"].dataType.simpleString() == "timestamp"


@pytest.mark.skipif(not os.path.exists(REF_PRETTY), reason="reference data absent")
def test_reads_pretty_multiline(spark):
    """Pretty-printed multi-line ZSON exercises the driver fallback."""
    fused = read_zson_fused(spark, REF_PRETTY)
    assert fused.count() >= 1


def test_zq_over_zson_file(spark, tmp_path):
    """ZSON as a language source: from <file.zson> | ... works."""
    from zed_spark.session import ZedSession

    p = tmp_path / "d.zson"
    p.write_text('{k:"a",v:1}\n{k:"b",v:2}\n{k:"a",v:3}\n')
    z = ZedSession(spark)
    got = z.query(f"from {p} | sum(v) by k | sort k").df
    assert [(r["k"], r["sum"]) for r in got.collect()] == [("a", 4), ("b", 2)]


# --- ZJSON -----------------------------------------------------------------


def test_zjson_roundtrip(spark, tmp_path):
    from zed_spark.sources.zjson import read_zjson, write_zjson

    df = spark.createDataFrame(
        [
            (1, "plain", 1.5, True, [1, 2], ("in", 9)),
            (2, 'quo"te', -0.25, False, [], ("x", -1)),
            (3, None, float("inf"), None, None, None),
        ],
        "id long, s string, f double, b boolean, arr array<long>, "
        "st struct<a: string, n: long>",
    )
    path = str(tmp_path / "zj")
    write_zjson(df, path, single_file=True)
    groups = read_zjson(spark, path)
    assert len(groups) == 1
    out = next(iter(groups.values()))
    assert out.columns == ["id", "s", "f", "b", "arr", "st"]
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["arr"] == [1, 2] and got[1]["st"]["n"] == 9
    assert got[2]["s"] == 'quo"te' and got[2]["f"] == -0.25
    assert got[3]["s"] is None and got[3]["f"] == float("inf")


def test_zjson_spec_framing(spark, tmp_path):
    """First line defines the type tree; later lines must be refs;
    values are ZSON-representation strings (docs/formats/zjson.md)."""
    import json as _json

    from zed_spark.sources.zjson import df_to_zjson_lines

    df = spark.createDataFrame([(1, "a"), (2, "b")], "n long, s string").coalesce(1)
    lines = [_json.loads(l) for l in df_to_zjson_lines(df).collect()]
    assert lines[0]["type"]["kind"] == "record"
    assert [f["name"] for f in lines[0]["type"]["fields"]] == ["n", "s"]
    assert lines[1]["type"]["kind"] == "ref"
    assert lines[0]["value"] == ["1", "a"]


def test_extensionless_dir_sniffing(spark, tmp_path):
    """read_any on an extension-less directory sniffs the content:
    ZSON exports, ZJSON frames, and parquet dirs all resolve."""
    from zed_spark.sources.readers import read_any
    from zed_spark.sources.zjson import write_zjson

    df = spark.createDataFrame([(1, "a"), (2, "b")], "n long, s string")
    zs, zj, pq = (str(tmp_path / d) for d in ("zs_dir", "zj_dir", "pq_dir"))
    write_zson(df, zs, single_file=True)
    write_zjson(df, zj, single_file=True)
    df.write.parquet(pq)
    assert read_any(spark, zs).count() == 2
    assert read_any(spark, zj).count() == 2
    assert read_any(spark, pq).count() == 2


def test_zjson_timestamps_and_read_any(spark, tmp_path):
    from tests.conftest import SF_DIR
    from zed_spark.sources.readers import read_any, read_table
    from zed_spark.sources.zjson import write_zjson

    ev = read_table(spark, SF_DIR, "events").select("event_id", "ts").limit(20)
    path = str(tmp_path / "ev_zjson")
    write_zjson(ev, path, single_file=True)
    out = read_any(spark, path, fmt="zjson")
    want = {r["event_id"]: r["ts"] for r in ev.collect()}
    got = {r["event_id"]: r["ts"] for r in out.collect()}
    assert got == want


def test_late_widening_value(spark, tmp_path):
    """Type inference merges over ALL rows in one job: a float that
    first appears past row 1000 (former take(1000) sample window)
    still widens the column, and a struct field seen only late is
    kept (round-2 ADVICE zson.py:497)."""
    p = tmp_path / "wide.zson"
    rows = ["{n:%d,extra:null}" % i for i in range(1200)]
    rows.append("{n:3.5,extra:{deep:7}}")
    p.write_text("\n".join(rows) + "\n")
    df = read_zson_fused(spark, str(p))
    assert df.count() == 1201
    types = dict(df.dtypes)
    assert types["n"] == "double"
    assert types["extra"].startswith("struct")
    assert df.agg(F.sum("n")).collect()[0][0] == sum(range(1200)) + 3.5


def test_zjson_union_array_and_per_file_ids(spark, tmp_path):
    """Union values decode from the reference's two-element
    [tag, value] array form (zio/zjsonio/writer.go:178), and type ids
    are resolved per input file: two files reusing id 30 for
    different types don't cross-contaminate (round-2 ADVICE)."""
    import json as _json

    from zed_spark.sources.zjson import read_zjson

    d = tmp_path / "zj"
    d.mkdir()
    union_t = {
        "kind": "record",
        "id": 31,
        "fields": [
            {
                "name": "v",
                "type": {
                    "kind": "union",
                    "id": 30,
                    "types": [
                        {"kind": "primitive", "name": "int64"},
                        {"kind": "primitive", "name": "string"},
                    ],
                },
            }
        ],
    }
    (d / "a.zjson").write_text(
        _json.dumps({"type": union_t, "value": [["0", "7"]]})
        + "\n"
        + _json.dumps({"type": {"kind": "ref", "id": 31}, "value": [["1", "x"]]})
        + "\n"
    )
    # independent stream: id 30 is a different (record) type here
    rec_t = {
        "kind": "record",
        "id": 30,
        "fields": [{"name": "s", "type": {"kind": "primitive", "name": "string"}}],
    }
    (d / "b.zjson").write_text(
        _json.dumps({"type": rec_t, "value": ["hello"]})
        + "\n"
        + _json.dumps({"type": {"kind": "ref", "id": 30}, "value": ["bye"]})
        + "\n"
    )
    groups = read_zjson(spark, str(d))
    all_rows = []
    for g in groups.values():
        all_rows.extend(r.asDict(recursive=True) for r in g.collect())

    def unwrap(u):  # tagged-union struct → alternative value
        return u[f"v{u['tag']}"] if isinstance(u, dict) and "tag" in u else u

    vs = sorted(str(unwrap(r["v"])) for r in all_rows if "v" in r)
    ss = sorted(r["s"] for r in all_rows if "s" in r)
    assert vs == ["7", "x"]
    assert ss == ["bye", "hello"]


def test_read_zson_job_count_independent_of_shapes(spark, tmp_path):
    """The shape materialization is ONE pass: reading a 20-shape file
    runs the same number of Spark jobs as a 2-shape file (the
    per-shape work is a filter+project over one cached combined
    frame, not a job per shape)."""
    from zed_spark.sources.zson import read_zson

    def write(nshapes, name):
        p = tmp_path / name
        lines = []
        for i in range(nshapes):
            lines.append("{" + f"f{i}:{i}" + "}")
        p.write_text("\n".join(lines * 3) + "\n")
        return str(p)

    sc = spark.sparkContext

    def jobs_during(path):
        start_ids = set(sc.statusTracker().getJobIdsForGroup() or [])
        out = read_zson(spark, path)
        end_ids = set(sc.statusTracker().getJobIdsForGroup() or [])
        return len(end_ids - start_ids), out

    n2, out2 = jobs_during(write(2, "two.zson"))
    n20, out20 = jobs_during(write(20, "twenty.zson"))
    assert len(out2) == 2 and len(out20) == 20
    assert n20 == n2, f"jobs grew with shape count: {n2} -> {n20}"
    # and the data is intact
    assert out20["f7"].count() == 3


def test_json_map_key_with_paren(spark):
    """A string map key containing '(' must render as the key text —
    the (type) decorator strip applies only OUTSIDE the closing quote
    (zio/jsonio writer semantics)."""
    from zed_spark import ZedSession
    from zed_spark.sources.jsonio import to_json_text

    z = ZedSession(spark)
    d = spark.createDataFrame([(1,)], "x int")
    out = z.query(
        'from t | yield |{"a(b": 1, "plain": 2}|', tables={"t": d}
    ).df
    assert to_json_text(out, wrapped=True).strip() == '{"a(b":1,"plain":2}'


def test_set_normalization_zng_byte_order():
    """Parse-time set normalization matches NormalizeSet
    (complex.go:268): bare ip elements sort by packed EncodeIP bytes,
    bytes by raw body, durations by counted-varint zigzag LE; quoted
    strings keep tag-counted text order."""
    from zed_spark.sources.zson import parse_zson

    assert parse_zson("|[192.168.1.2,192.168.1.10,192.179.1.1]|") == [
        ["192.168.1.2", "192.168.1.10", "192.179.1.1"]
    ]
    assert parse_zson("|[0x0202,0x01]|") == [[b"\x01", b"\x02\x02"]]
    # 2m's zigzag-LE bytes compare below 3s's (byte 1: 0x60 < 0xbc)
    assert parse_zson("|[3s,1s,2m]|") == [
        [1_000_000_000, 120_000_000_000, 3_000_000_000]
    ]
    # quoted ip-shaped STRINGS are strings: tag-counted text order
    assert parse_zson('|["192.168.1.10","192.168.1.2"]|') == [
        ["192.168.1.2", "192.168.1.10"]
    ]


def test_set_parse_order_matches_desc_normalization():
    """Property: the parser's quoted/bare-aware set ordering agrees
    with the desc-driven ZNG normalization (restore.py) for ips,
    ints, durations, and bytes — the invariant the runtime sort-1
    ztest checks, over random inputs."""
    import ipaddress
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zed_spark.sources.restore import normalize_sets_in_place
    from zed_spark.sources.zson import parse_zson

    rnd = random.Random(7)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**32 - 1),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    def ip_sets(addrs):
        ips = [str(ipaddress.ip_address(a)) for a in addrs]
        parsed = parse_zson("|[" + ",".join(ips) + "]|")[0]
        via_desc = list(ips)
        normalize_sets_in_place(via_desc, ("set", ("prim", "ip")))
        assert parsed == via_desc

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(2**31), max_value=2**31),
            min_size=1,
            max_size=8,
            unique=True,
        )
    )
    def int_sets(vals):
        parsed = parse_zson("|[" + ",".join(map(str, vals)) + "]|")[0]
        via_desc = list(vals)
        normalize_sets_in_place(via_desc, ("set", ("prim", "int64")))
        assert parsed == via_desc

    ip_sets()
    int_sets()
