"""Golden-style operator tests (the reference's ztest model,
SURVEY §5: small inline input → operator → expected output)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zed_spark import operators as ops
from zed_spark.operators.combine import switch_on
from zed_spark.operators.summarize import agg_expr, summarize
from zed_spark.operators.traverse import over, over_expr


@pytest.fixture(scope="module")
def kv(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0), (4, None, 5.0)],
        "id long, k string, v double",
    )


def test_where(kv):
    assert [r.id for r in ops.where(kv, F.col("v") > 6).orderBy("id").collect()] == [1, 3]


def test_cut_rename_spec(kv):
    out = ops.cut(kv, "id", "val:=v")
    assert out.columns == ["id", "val"]


def test_put_overwrites(kv):
    out = ops.put(kv, v=F.col("v") * 2, w=F.lit(1))
    row = out.filter(F.col("id") == 1).first()
    assert row["v"] == 20.0 and row["w"] == 1


def test_yield_multi(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    out = ops.yield_(
        df,
        F.struct(F.col("a").alias("x")),
        F.struct(F.col("b").alias("x")),
    )
    assert sorted(r.x for r in out.collect()) == [1, 2]


def test_sort_nulls_zed_semantics(kv):
    # zed: nulls last on ascending sort
    got = [r.k for r in ops.sort(kv, "k").collect()]
    assert got == ["a", "a", "b", None]
    # descending → nulls first
    got = [r.k for r in ops.sort(kv, "-k").collect()]
    assert got == [None, "b", "a", "a"]


def test_head_tail_top(kv):
    assert ops.head(ops.sort(kv, "id"), 2).count() == 2
    assert [r.id for r in ops.tail(kv, 2, order_by=["id"]).collect()] == [3, 4]
    assert [r.id for r in ops.top(kv, 1, "v").collect()] == [3]


def test_tail_requires_order(kv):
    with pytest.raises(ValueError):
        ops.tail(kv, 2)


def test_uniq_adjacent_vs_global(spark):
    # a b b a — global dedup gives {a,b}; adjacent uniq gives a b a
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "a")], "ord long, x string"
    )
    out = ops.uniq(df, order_by=["ord"], compare_cols=["x"])
    assert [r.x for r in out.collect()] == ["a", "b", "a"]
    counted = ops.uniq(df, order_by=["ord"], compare_cols=["x"], count=True)
    assert sorted((r.x, r["count"]) for r in counted.collect()) == [
        ("a", 1), ("a", 1), ("b", 2)]


def test_uniq_runs_span_partitions(spark):
    """Runs longer than a range partition must merge across the
    boundary fix-up (the distributed-uniq failure mode)."""
    rows, i = [], 0
    spec = [("a", 5000), ("b", 1), ("a", 3000), ("c", 7000), (None, 2), ("d", 10000)]
    for val, runlen in spec:
        for _ in range(runlen):
            rows.append((i, val))
            i += 1
    df = spark.createDataFrame(rows, "ord: long, v: string").repartition(16)
    out = ops.uniq(df, order_by=["ord"], compare_cols=["v"], count=True)
    got = [(r.v, r["count"]) for r in out.collect()]
    assert got == spec
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_summarize_agg_where(kv):
    out = summarize(
        kv,
        by=["k"],
        total=("sum", "v"),
        big=("count", None, F.col("v") > 9),
    )
    rows = {r.k: (r.total, r.big) for r in out.collect()}
    assert rows["a"] == (40.0, 2)
    assert rows["b"] == (None, 0)


def test_approx_percentile_rank_error_bound(spark):
    """approx_percentiles guarantees rank error <= n/accuracy: the
    returned value's true rank must sit within that band around p*n."""
    from zed_spark.analytics import approx_percentiles

    from tests.conftest import SF_DIR
    from zed_spark.sources.readers import read_table

    li = read_table(spark, SF_DIR, "lineitem")
    acc = 1000
    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in approx_percentiles(
            li, "l_extendedprice", ["l_returnflag"], [0.5, 0.9], accuracy=acc
        ).collect()
    }
    import bisect

    for flag, (a50, a90) in approx.items():
        vals = sorted(
            r["l_extendedprice"]
            for r in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for p, got in ((0.5, a50), (0.9, a90)):
            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = p * n
            # true rank interval of the returned value vs target rank
            err = min(abs(lo - target), abs(hi - target))
            assert err <= n / acc + 1, (flag, p, err, n)


def test_dcount_approx_accuracy(spark):
    """HLL approx distinct stays within its documented rsd (~2.3%
    at precision default) — the reference's dcount is also a sketch."""
    df = spark.range(100_000).select((F.col("id") % 5000).alias("k"))
    approx = df.agg(F.approx_count_distinct("k", 0.01).alias("a")).first()["a"]
    assert abs(approx - 5000) / 5000 < 0.05


def test_fuse_agg_type_value(kv):
    out = summarize(kv, by=["k"], t=("fuse", "v"), n=("count", None))
    assert all(r["t"] == "float64" for r in out.collect())


def test_agg_expr_rejects_unknown():
    with pytest.raises(ValueError):
        agg_expr("median", F.col("x"))


def test_collect_map(spark):
    df = spark.createDataFrame(
        [({"key": "a", "value": 1},), ({"key": "b", "value": 2},)],
        T.StructType([T.StructField(
            "e", T.StructType([T.StructField("key", T.StringType()),
                               T.StructField("value", T.IntegerType())]))]),
    )
    out = df.agg(agg_expr("collect_map", F.col("e")).alias("m"))
    assert out.first()["m"] == {"a": 1, "b": 2}


def test_switch_first_match_and_null_routing(spark):
    df = spark.createDataFrame([(1,), (5,), (None,)], "x int")
    legs = ops.switch(df, [F.col("x") < 3, F.col("x") < 10], default=True)
    assert [leg.count() for leg in legs] == [1, 1, 1]  # null → default


def test_switch_on_values(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "x string")
    legs = switch_on(df, F.col("x"), ["a", "b"], default=True)
    assert [leg.count() for leg in legs] == [1, 1, 1]


def test_fork_mirror(kv):
    legs = ops.fork(kv, 3)
    assert len(legs) == 3 and all(leg.count() == 4 for leg in legs)
    main, mirrored = ops.mirror(kv)
    assert main.count() == mirrored.count() == 4


def test_combine_heterogeneous(spark):
    a = spark.createDataFrame([(1, "x")], "id long, s string")
    b = spark.createDataFrame([(2, 3.5)], "id long, v double")
    out = ops.combine([a, b])
    assert set(out.columns) == {"id", "s", "v"}
    assert out.count() == 2


def test_merge_ordered(spark):
    a = spark.createDataFrame([(1,), (3,)], "x long")
    b = spark.createDataFrame([(2,), (4,)], "x long")
    assert [r.x for r in ops.merge([a, b], "x").collect()] == [1, 2, 3, 4]


def test_over_array_and_map(spark):
    df = spark.createDataFrame(
        [([1, 2, 3], {"a": 1})],
        "arr array<long>, kv map<string,long>",
    )
    assert [r.this for r in over(df, "arr").collect()] == [1, 2, 3]
    row = over(df, "kv").first()
    assert row.this.asDict() == {"key": "a", "value": 1}


def test_over_with_vars(spark):
    df = spark.createDataFrame([([1, 2], 10)], "arr array<long>, base long")
    out = over(df, "arr", with_vars={"b": F.col("base")})
    got = [(r.b, r.this) for r in out.collect()]
    assert got == [(10, 1), (10, 2)]


def test_over_expr_hof(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "arr array<long>")
    out = df.select(over_expr(F.col("arr"), lambda x: x * 10).alias("r"))
    assert out.first()["r"] == [10, 20, 30]


def test_join_cut_list(spark):
    left = spark.createDataFrame([(1, "l1"), (2, "l2")], "k long, lv string")
    right = spark.createDataFrame([(1, "r1", 9)], "k long, rv string, extra long")
    out = ops.join(left, right, "k", "k", "inner", cut={"rv2": "rv"})
    assert out.columns == ["k", "lv", "rv2"]
    assert out.first()["rv2"] == "r1"
    anti = ops.join(left, right, "k", "k", "anti")
    assert [r.k for r in anti.collect()] == [2]


def test_join_cut_nested_path(spark):
    """A cut entry referencing a nested right-side path ('a.b') must
    resolve (selected column would otherwise be named 'b')."""
    left = spark.createDataFrame([(1, "x")], "k long, lv string")
    right = spark.createDataFrame([(1, ("deep",))], "k long, a struct<b: string>")
    out = ops.join(left, right, "k", "k", "inner", cut={"nested": "a.b"})
    assert out.columns == ["k", "lv", "nested"]
    assert out.first()["nested"] == "deep"


def test_search_flat_schema_avoids_to_json(spark):
    """Bare-term search over a flat schema compiles to per-column
    predicates (codegen), not a to_json scan of the whole row; the
    JSON path remains for nested schemas. Results agree between the
    two plans."""
    from zed_spark.operators.filters import search

    flat = spark.createDataFrame(
        [(1, "Spark rules", 10, True), (2, "duck", 20, False),
         (3, "no match", 2, None)],
        "id long, text string, n long, flag boolean",
    )
    out = search(flat, "spark")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "to_json" not in plan and "StructsToJson" not in plan
    assert [r["id"] for r in out.collect()] == [1]
    # numeric rendering matches: term "20" hits the n column
    assert [r["id"] for r in search(flat, "20").collect()] == [2]
    # field-name match: rows where the named field is present
    assert sorted(r["id"] for r in search(flat, "flag").collect()) == [1, 2]
    # nested schema falls back to the JSON scan, same semantics
    nested = spark.createDataFrame(
        [(1, {"msg": "Spark here"}), (2, {"msg": "nope"})],
        "id long, rec struct<msg:string>",
    )
    plan2 = search(nested, "spark")._jdf.queryExecution().executedPlan().toString()
    assert "to_json" in plan2 or "StructsToJson" in plan2
    assert [r["id"] for r in search(nested, "spark").collect()] == [1]


def test_pivot_oracle_parity(spark):
    """pivot_counts was rotated out of the 50-row graded registry
    window for lake_scan_range; its DuckDB parity stays pinned here
    (same compare as the driver's gate)."""
    from tests.conftest import SF_DIR
    from tests.oracle_utils import compare, duckdb_con
    from zed_spark import queries_analytics as qa

    con = duckdb_con(SF_DIR)
    res = compare(qa.pivot_q(spark, SF_DIR), con, qa.PIVOT_SQL)
    assert res["count_match"] and res["schema_match"] and res["approx_match"], res


def test_profile_table_approx_mode(spark):
    """The scale-default profile uses the HLL sketch: distinct counts
    land within the configured rsd of exact, and the rest of the
    columns are identical to the exact mode."""
    from zed_spark.analytics import profile_table
    from zed_spark.sources.readers import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {r["column"]: r for r in profile_table(docs, exact_distinct=True).collect()}
    approx = {r["column"]: r for r in profile_table(docs, rsd=0.02).collect()}
    assert set(exact) == set(approx)
    for c in exact:
        e, a = exact[c], approx[c]
        assert (e["n_nulls"], e["min_value"], e["max_value"]) == (
            a["n_nulls"], a["min_value"], a["max_value"])
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(3, 0.1 * e["n_distinct"])
