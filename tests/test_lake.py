"""Lake layer: pool lifecycle, commits, range pruning, delete/
compact/vacuum, meta scans."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from zed_spark.sources.lake import Lake
from zed_spark.sources.readers import read_table


@pytest.fixture()
def lake(spark, tmp_path):
    return Lake(spark, str(tmp_path / "lake"))


def test_pool_roundtrip(spark, lake):
    ev = read_table(spark, SF_DIR, "events")
    pool = lake.create_pool("events", key="ts")
    pool.load(ev, author="test", message="initial load")
    assert pool.scan().count() == ev.count()
    assert lake.pools() == ["events"]
    # second commit appends
    pool.load(ev.limit(10), message="more")
    assert pool.scan().count() == ev.count() + 10
    log = pool.meta_commits()
    assert log.count() == 2
    assert set(log.columns) >= {"commit", "author", "message"}


def test_range_scan_prunes_files(spark, lake):
    od = read_table(spark, SF_DIR, "orders")
    pool = lake.create_pool("orders", key="o_orderkey")
    pool.load(od)
    lo, hi = 10, 50
    got = pool.scan_range(lo, hi)
    want = od.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi))
    assert got.count() == want.count()
    # the predicate must reach the parquet scan for file/row-group skip
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(o_orderkey,10)" in plan


def test_delete_compact_vacuum(spark, lake):
    od = read_table(spark, SF_DIR, "orders")
    pool = lake.create_pool("orders", key="o_orderkey")
    pool.load(od.filter(F.col("o_orderkey") <= 100))
    pool.load(od.filter(F.col("o_orderkey") > 100))
    before = pool.scan().count()
    n_del = pool.scan().filter(F.col("o_orderstatus") == "F").count()
    pool.delete_where(F.col("o_orderstatus") == "F")
    assert pool.scan().count() == before - n_del
    assert pool.scan().filter(F.col("o_orderstatus") == "F").count() == 0
    # objects from before the delete are unreferenced → vacuum removes
    removed = pool.vacuum()
    assert len(removed) == 2
    assert pool.scan().count() == before - n_del
    pool.compact()
    assert pool.meta_objects().count() == 1 or pool.vacuum() is not None


def test_meta_pools(spark, lake):
    lake.create_pool("a", key="x")
    lake.create_pool("b", key="y")
    rows = {r["name"]: r["key"] for r in lake.meta_pools().collect()}
    assert rows == {"a": "x", "b": "y"}


def test_duplicate_pool_refused(spark, lake):
    lake.create_pool("p", key="k")
    with pytest.raises(ValueError):
        lake.create_pool("p", key="k")
