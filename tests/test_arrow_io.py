"""Arrow IPC format (reference `arrows`, zio/arrowio/): round-trips
through single-file and per-partition writes, read_any dispatch."""

import os

import pytest
from pyspark.sql import functions as F

from zed_spark.sources.arrow_io import read_arrows, write_arrows
from zed_spark.sources.readers import read_any, read_table
from zed_spark.sources.sinks import write_any


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_roundtrip_single_file(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, -0.25)],
        "n long, s string, f double",
    )
    p = str(tmp_path / "t.arrows")
    write_arrows(df, p, single_file=True)
    back = read_arrows(spark, p)
    assert back.schema == df.schema
    assert _sorted_rows(back) == _sorted_rows(df)


def test_roundtrip_partitioned_dir(spark, tmp_path):
    from tests.conftest import SF_DIR

    cust = read_table(spark, SF_DIR, "customer").repartition(4)
    d = str(tmp_path / "cust_arrows")
    write_arrows(cust, d)
    parts = [f for f in os.listdir(d) if f.endswith(".arrows")]
    assert len(parts) > 1  # one file per non-empty partition
    back = read_arrows(spark, d)
    assert back.count() == cust.count()
    a = cust.agg(F.sum("c_acctbal")).collect()[0][0]
    b = back.agg(F.sum("c_acctbal")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_read_any_dispatch_and_sniff(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "n long, s string")
    p = str(tmp_path / "t.arrows")
    write_arrows(df, p, single_file=True)
    assert _sorted_rows(read_any(spark, p)) == _sorted_rows(df)
    # extension-less dir sniffing (stream continuation marker)
    d = tmp_path / "noext"
    d.mkdir()
    write_arrows(df, str(d / "data"), single_file=True)
    assert _sorted_rows(read_any(spark, str(d))) == _sorted_rows(df)


def test_write_any_registration(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(100)], "n long")
    d = str(tmp_path / "wa")
    write_any(df, d, fmt="arrows")
    assert read_arrows(spark, d).agg(F.sum("n")).collect()[0][0] == 4950


def test_timestamps_survive(spark, tmp_path):
    from tests.conftest import SF_DIR

    ev = read_table(spark, SF_DIR, "events").select("event_id", "ts").limit(20)
    p = str(tmp_path / "ev.arrows")
    write_arrows(ev, p, single_file=True)
    back = read_arrows(spark, p)
    want = {r["event_id"]: r["ts"] for r in ev.collect()}
    got = {r["event_id"]: r["ts"] for r in back.collect()}
    assert got == want
