"""Core relational query battery: one entry per reference operator
(SURVEY §2), each with a DuckDB oracle. These are what the round
driver grades (CORRECTNESS_r{N}) and what bench.py times.

Float determinism rules (so Spark and DuckDB value-hashes match):
  - SUM over doubles → sum exact DECIMAL(38,4) then cast double
    (associative, engine-independent)
  - per-row double arithmetic → emitted raw (IEEE ops are identical)
  - AVG → decimal-sum / count in double
  - no ROUND on aggregated doubles (rounding modes differ)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zed_spark import operators as ops
from zed_spark.operators.combine import switch
from zed_spark.operators.fuse import fuse_dataframes
from zed_spark.sources.readers import read_table


def _dec(c):
    return c.cast("decimal(38,4)")


def _dsum(c, alias):
    return F.sum(_dec(c)).cast("double").alias(alias)


# --------------------------------------------------------------------------
# each query: (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship (SURVEY §7.1): scan → filter → groupBy → multi-agg →
    sort. Exercises pushdown, partial aggs, whole-stage codegen."""
    li = read_table(spark, sf, "lineitem")
    return (
        ops.where(li, F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)/COUNT(*) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def where_filter(spark, sf):
    od = read_table(spark, sf, "orders")
    return ops.where(
        od, (F.col("o_totalprice") > 200000) & (F.col("o_orderstatus") == "O")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


WHERE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_totalprice > 200000 AND o_orderstatus = 'O'
"""


def cut_project(spark, sf):
    li = read_table(spark, sf, "lineitem")
    return ops.cut(li, "l_orderkey", "l_linenumber", "qty:=l_quantity")


CUT_SQL = "SELECT l_orderkey, l_linenumber, l_quantity AS qty FROM lineitem"


def put_derived(spark, sf):
    li = read_table(spark, sf, "lineitem")
    out = ops.put(
        li,
        revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")),
        charged=F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
    )
    return out.select("l_orderkey", "l_linenumber", "revenue", "charged")


PUT_SQL = """
SELECT l_orderkey, l_linenumber,
  l_extendedprice*(1-l_discount) AS revenue,
  l_extendedprice*(1-l_discount)*(1+l_tax) AS charged
FROM lineitem
"""


def drop_rename(spark, sf):
    na = read_table(spark, sf, "nation")
    out = ops.drop(na, "n_regionkey")
    return ops.rename(out, nation_name="n_name")


DROP_RENAME_SQL = "SELECT n_nationkey, n_name AS nation_name FROM nation"


def head_tail(spark, sf):
    """head AND tail (§2.7) in one graded query — the driver grades at
    most 50 registry entries, so single-operator demos that share a
    table are merged, with a marker column telling the legs apart."""
    od = read_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    h = ops.head(ops.sort(od, "o_orderkey"), 5).withColumn("end", F.lit("head"))
    t = ops.tail(od, 5, order_by=["o_orderkey"]).withColumn("end", F.lit("tail"))
    return h.unionAll(t)


HEAD_TAIL_SQL = """
SELECT * FROM (SELECT o_orderkey, o_totalprice, 'head' AS "end" FROM orders
               ORDER BY o_orderkey LIMIT 5)
UNION ALL BY NAME
SELECT * FROM (SELECT o_orderkey, o_totalprice, 'tail' AS "end" FROM orders
               ORDER BY o_orderkey DESC LIMIT 5)
"""


def top_k(spark, sf):
    """top-k (§2.7) — also carries the §2.8 math-function coverage
    formerly in `math_funcs` (merged to stay within the driver's
    50-query grading cap; functions are per-row, so computing them
    over top's output loses no coverage)."""
    od = read_table(spark, sf, "orders")
    t = ops.top(od, 10, "o_totalprice").select("o_orderkey", "o_totalprice")
    bal = F.col("o_totalprice")
    return t.select(
        "o_orderkey",
        "o_totalprice",
        F.abs(bal).alias("abs_p"),
        F.ceil(bal).alias("ceil_p"),
        F.floor(bal).alias("floor_p"),
        F.sqrt(F.abs(bal)).alias("sqrt_p"),
        F.log(F.abs(bal) + 1.0).alias("log_p"),
        F.pow(bal, F.lit(2.0)).alias("sq_p"),
        F.greatest(bal, F.lit(0.0)).alias("clamped"),
        F.least(bal, F.lit(100000.0)).alias("capped"),
    )


TOP_SQL = """
SELECT o_orderkey, o_totalprice,
  abs(o_totalprice) AS abs_p,
  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_p,
  CAST(floor(o_totalprice) AS BIGINT) AS floor_p,
  sqrt(abs(o_totalprice)) AS sqrt_p,
  ln(abs(o_totalprice) + 1.0) AS log_p,
  pow(o_totalprice, 2.0) AS sq_p,
  greatest(o_totalprice, 0.0) AS clamped,
  least(o_totalprice, 100000.0) AS capped
FROM orders ORDER BY o_totalprice DESC LIMIT 10
"""


def sort_nulls(spark, sf):
    cu = read_table(spark, sf, "customer")
    top20 = ops.head(ops.sort(cu, "-c_acctbal", "c_custkey"), 20)
    return top20.select("c_custkey", "c_acctbal")


SORT_SQL = """
SELECT c_custkey, c_acctbal FROM customer
ORDER BY c_acctbal DESC NULLS FIRST, c_custkey LIMIT 20
"""


def uniq_runs(spark, sf):
    from zed_spark.sources.readers import table_scan_partitions

    ev = read_table(spark, sf, "events")
    # split count comes from the per-(application, dir) memo, so the
    # timed path plans no RDD probe (round-12; plan-shape decision
    # only — both uniq paths are output-identical, test-pinned)
    return ops.uniq(
        ev,
        order_by=["ts"],
        compare_cols=["event_type"],
        count=True,
        input_partitions=table_scan_partitions(spark, sf, "events"),
    )


UNIQ_SQL = """
WITH s AS (SELECT event_type, ts, lag(event_type) OVER (ORDER BY ts) AS p FROM events),
r AS (SELECT event_type,
        SUM(CASE WHEN p IS NULL OR p<>event_type THEN 1 ELSE 0 END)
          OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS run
      FROM s)
SELECT event_type, COUNT(*) AS count FROM r GROUP BY run, event_type
"""


def join_inner_agg(spark, sf):
    li = read_table(spark, sf, "lineitem")
    od = read_table(spark, sf, "orders")
    j = ops.join(li, od, "l_orderkey", "o_orderkey", "inner",
                 cut={"o_orderpriority": "o_orderpriority"})
    return (
        j.groupBy("o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
             F.count(F.lit(1)).alias("n"))
    )


JOIN_INNER_SQL = """
SELECT o_orderpriority,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def join_left_count(spark, sf):
    cu = read_table(spark, sf, "customer")
    od = read_table(spark, sf, "orders")
    j = ops.join(cu, od, "c_custkey", "o_custkey", "left", cut={"o_orderkey": "o_orderkey"})
    return j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("n_orders"))


JOIN_LEFT_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def join_anti(spark, sf):
    """Customers with no high-value order (anti join against a
    filtered leg — at sf≥0.01 every customer has SOME order, so the
    unfiltered anti would be vacuously empty)."""
    cu = read_table(spark, sf, "customer")
    od = ops.where(read_table(spark, sf, "orders"), F.col("o_totalprice") > 300000)
    return ops.join(cu, od, "c_custkey", "o_custkey", "anti").select("c_custkey", "c_name")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def join_right(spark, sf):
    od = read_table(spark, sf, "orders")
    cu = read_table(spark, sf, "customer")
    j = ops.join(od, cu, "o_custkey", "c_custkey", "right",
                 cut={"c_custkey": "c_custkey", "c_mktsegment": "c_mktsegment"})
    return j.groupBy("c_mktsegment").agg(F.count("o_orderkey").alias("n_orders"))


JOIN_RIGHT_SQL = """
SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def agg_global(spark, sf):
    li = read_table(spark, sf, "lineitem")
    return ops.summarize(
        li,
        aggs={
            "n": F.count(F.lit(1)),
            "total_qty": F.sum(_dec(F.col("l_quantity"))).cast("double"),
            "min_price": F.min("l_extendedprice"),
            "max_price": F.max("l_extendedprice"),
        },
    )


AGG_GLOBAL_SQL = """
SELECT COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS total_qty,
  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
FROM lineitem
"""


def agg_where(spark, sf):
    """Per-agg where clauses (reference: semantic/op.go:1102) — also
    carries the and()/or() boolean aggregates formerly in `bool_aggs`
    (same table and grouping; merged for the 50-query grading cap)."""
    li = read_table(spark, sf, "lineitem")
    from zed_spark.operators.summarize import agg_expr

    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") > 0.05, _dec(F.col("l_quantity"))))
        .cast("double").alias("qty_highdisc"),
        agg_expr("count", None, F.col("l_tax") > 0.04).alias("n_hightax"),
        F.count(F.lit(1)).alias("n"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_bigdisc"),
    )


AGG_WHERE_SQL = """
SELECT l_returnflag,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_highdisc,
  COUNT(*) FILTER (WHERE l_tax > 0.04) AS n_hightax,
  COUNT(*) AS n,
  bool_and(l_quantity > 0) AS all_positive,
  bool_or(l_discount > 0.09) AS any_bigdisc
FROM lineitem GROUP BY l_returnflag
"""


def dcount_exact(spark, sf):
    """Exact distinct count — also carries the union (collect_set)
    aggregate formerly in `union_set` (same table and grouping;
    merged for the 50-query grading cap)."""
    od = read_table(spark, sf, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
    )


DCOUNT_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
FROM orders GROUP BY o_orderstatus
"""


def dcount_approx(spark, sf):
    """approx HLL distinct (reference dcount.go) — no SQL oracle
    (sketch internals differ); driver records rows-only."""
    od = read_table(spark, sf, "orders")
    return od.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("n_customers_approx")
    )


def every_hour(spark, sf):
    """every(1h) bucketing — also carries the year()/month()/day()
    time-function coverage formerly in `time_funcs` (merged for the
    50-query grading cap; derived from the same bucket column)."""
    ev = read_table(spark, sf, "events")
    out = ops.summarize(
        ev,
        by=None,
        aggs={
            "n": F.count(F.lit(1)),
            "total_value": F.sum(_dec(F.col("value"))).cast("double"),
        },
        every=("ts", "1 hour"),
    )
    return out.select(
        F.unix_timestamp("ts").alias("hour_epoch"),
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("dy"),
        F.hour("ts").alias("hr"),
        "n",
        "total_value",
    )


EVERY_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
  CAST(year(date_trunc('hour', ts)) AS INT) AS yr,
  CAST(month(date_trunc('hour', ts)) AS INT) AS mo,
  CAST(day(date_trunc('hour', ts)) AS INT) AS dy,
  CAST(hour(date_trunc('hour', ts)) AS INT) AS hr,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2, 3, 4, 5
"""


def collect_sorted(spark, sf):
    na = read_table(spark, sf, "nation")
    re = read_table(spark, sf, "region")
    j = ops.join(na, re, "n_regionkey", "r_regionkey", "inner",
                 cut={"r_name": "r_name"}, broadcast_right=True)
    return j.groupBy("r_name").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


COLLECT_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def switch_routing(spark, sf):
    ev = read_table(spark, sf, "events")
    legs = switch(ev, [F.col("value") >= 150, F.col("value") >= 50], default=True)
    tagged = [
        legs[0].withColumn("tier", F.lit("high")),
        legs[1].withColumn("tier", F.lit("mid")),
        legs[2].withColumn("tier", F.lit("low")),
    ]
    return fuse_dataframes(tagged).groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("value"))).cast("double").alias("total"),
    )


SWITCH_SQL = """
SELECT CASE WHEN value >= 150 THEN 'high' WHEN value >= 50 THEN 'mid' ELSE 'low' END AS tier,
  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total
FROM events GROUP BY 1
"""


def merge_streams(spark, sf):
    """combine/merge of two filtered legs (reference combine.go /
    merge.go) — ordered output re-expressed as explicit sort."""
    ev = read_table(spark, sf, "events")
    errors = ops.where(ev, F.col("event_type") == "error")
    purchases = ops.where(ev, F.col("event_type") == "purchase")
    merged = ops.merge([errors, purchases], "ts")
    return merged.select("event_id", "event_type", F.unix_timestamp("ts").alias("ts_epoch"))


MERGE_SQL = """
SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM events WHERE event_type IN ('error', 'purchase')
"""


def fuse_shapes(spark, sf):
    """fuse of two different shapes → superset schema with nulls."""
    ev = read_table(spark, sf, "events")
    shape_a = ev.select("event_id", "event_type")
    shape_b = ev.select("event_id", "value")
    fused = fuse_dataframes([shape_a, shape_b])
    return fused.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("event_type").alias("n_type"),
        F.count("value").alias("n_value"),
    )


# fixture paths already materialized by THIS process (fuse_hetero)
_FUSE_HETERO_READY: set = set()

FUSE_SQL = """
SELECT COUNT(*) AS n_rows, COUNT(event_type) AS n_type, COUNT(value) AS n_value
FROM (SELECT event_id, event_type, NULL::DOUBLE AS value FROM events
      UNION ALL BY NAME
      SELECT event_id, NULL::VARCHAR AS event_type, value FROM events)
"""


def fuse_hetero(spark, sf):
    """Heterogeneous-STREAM proof (round-5 VERDICT item 7): the core
    zed data model — each value carries its own type (docs/formats/
    zng.md:12-17, SURVEY §1.1) — graded end-to-end. Two genuinely
    different record shapes are written into ONE mixed ndjson stream
    (Spark's JSON writer omits absent fields, so the lines really are
    heterogeneous), read back through the shape-discovery reader
    (sources/shapes.py: per-row shape keys → per-shape typed frames),
    then fused to the superset schema with numeric widening
    (long x ⊔ double x → double, runtime/sam/op/fuse) and nulls for
    absent fields. The oracle computes the same superset straight
    from parquet, so shape discovery, JSON round-trip fidelity, the
    schema merge, and null-filling must ALL be exact for this row to
    be green."""
    import os
    import tempfile

    from zed_spark.sources.shapes import fuse_shape_groups, shape_groups

    ev = read_table(spark, sf, "events")
    # shape A: {event_id, event_type, x: long}
    shape_a = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", F.col("user_id").alias("x")
    )
    # shape B: {event_id, x: double, tags: array<string>}
    shape_b = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        F.col("value").alias("x"),
        F.array(F.col("event_type"), F.lit("b")).alias("tags"),
    )
    tag = os.path.basename(sf.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), f"fuse_hetero_{tag}")
    # the mixed-stream fixture is INPUT, not query work: write it
    # once per process (round-8 verdict item 7 — the bench key must
    # measure the shape-discovery read + fuse, not tempfile I/O)
    if path not in _FUSE_HETERO_READY:
        shape_a.write.mode("overwrite").json(path)
        shape_b.write.mode("append").json(path)
        _FUSE_HETERO_READY.add(path)
    fused = fuse_shape_groups(shape_groups(spark, path))
    return fused.select(
        "event_id",
        "event_type",
        "x",
        F.array_join(F.col("tags"), ",").alias("tags"),
    )


FUSE_HETERO_SQL = """
SELECT event_id, event_type, CAST(user_id AS DOUBLE) AS x, NULL::VARCHAR AS tags
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, NULL::VARCHAR AS event_type, value AS x, event_type || ',b' AS tags
FROM events WHERE event_id % 2 = 1
"""


def fuse_union(spark, sf):
    """Union-typed fuse, graded (round-6 VERDICT item 8): two shapes
    whose shared column has IRRECONCILABLE types (string vs long —
    no widening exists) fuse into a first-class tagged union
    (runtime/sam/op/fuse/fuser.go:10-38 semantics; union type
    complex.go:290-330), and the union column is then dispatched
    PER ROW downstream — the member kind and a member-aware text
    projection are computed from the tag, exactly how a zed pipeline
    consumes a union value. The oracle re-expresses the dispatch as
    the two legs it must equal."""
    from zed_spark.operators.fuse import fuse_dataframes

    docs = read_table(spark, sf, "documents")
    a = docs.select("doc_id", F.col("source").alias("v"))
    b = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.length("text").cast("long").alias("v"),
    )
    fused = fuse_dataframes([a, b], unions="tagged")
    v = F.col("v")
    vdt = fused.schema["v"].dataType
    zname = {"string": "string", "bigint": "int64"}
    kind = None
    for pos, f in enumerate(vdt.fields[1:]):
        w = F.when(
            v.getField("tag") == pos,
            F.lit(zname[f.dataType.simpleString()]),
        )
        kind = w if kind is None else F.coalesce(kind, w)
    text = F.coalesce(
        *[v.getField(f.name).cast("string") for f in vdt.fields[1:]]
    )
    return fused.select(
        "doc_id", kind.alias("v_kind"), text.alias("v_text")
    )


FUSE_UNION_SQL = """
SELECT doc_id, 'string' AS v_kind, source AS v_text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, 'int64' AS v_kind,
       CAST(length(text) AS VARCHAR) AS v_text
FROM documents
"""


def string_funcs(spark, sf):
    """String functions — also carries the regexp_extract /
    regexp_replace coverage formerly in `regexp_funcs` (same table;
    merged for the 50-query grading cap)."""
    pa = read_table(spark, sf, "part")
    return pa.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.length(F.col("p_name")).alias("name_len"),
        F.size(F.split(F.col("p_type"), " ")).alias("type_words"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.regexp_extract(F.col("p_type"), r"(\w+)$", 1).alias("last_word"),
        F.regexp_replace(F.col("p_name"), r"[aeiou]", "_").alias("devoweled"),
        F.regexp_extract(F.col("p_brand"), r"(\d+)", 1).alias("brand_num"),
    )


STRING_SQL = """
SELECT p_partkey, upper(p_brand) AS brand_upper,
  replace(p_name, ' ', '_') AS name_snake,
  length(p_name) AS name_len,
  len(string_split(p_type, ' ')) AS type_words,
  substr(p_name, 1, 8) AS name_prefix,
  regexp_extract(p_type, '(\\w+)$', 1) AS last_word,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
  regexp_extract(p_brand, '(\\d+)', 1) AS brand_num
FROM part
"""


def json_props(spark, sf):
    """JSON access (analog of the reference's parse_zson / nested
    expression access on dynamic values)."""
    ev = read_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


JSON_SQL = """
SELECT event_type, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k, COUNT(*) AS n
FROM events GROUP BY event_type
"""


def over_words(spark, sf):
    """Lateral iteration (reference over.go): explode words, count,
    top 10 — `over split(text) | count() by this | top 10`."""
    docs = read_table(spark, sf, "documents")
    from zed_spark.textops.dedup import normalize_text

    words = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word")
    )
    counted = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return counted.orderBy(F.col("n").desc(), F.col("word")).limit(10)


OVER_SQL = """
SELECT word, COUNT(*) AS n FROM (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
  FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 10
"""


def grep_docs(spark, sf):
    """Search-expression analog: substring match (grep) on a column."""
    from zed_spark.functions.grep import grep

    docs = read_table(spark, sf, "documents")
    return docs.filter(grep("spark", F.col("text"))).select("doc_id")


# grep is case-insensitive like zed search terms (grep.py)
GREP_SQL = "SELECT doc_id FROM documents WHERE lower(text) LIKE '%spark%'"


def cidr_filter(spark, sf):
    """cidr_match on synthesized IPv4s (events carry no IPs, so
    derive one deterministically from user_id — both engines use the
    same formula)."""
    ev = read_table(spark, sf, "events")
    from zed_spark.functions.ip import cidr_match

    ip = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("user_id") % 256).cast("string"),
        (F.floor(F.col("user_id") / 256) % 256).cast("string"),
        F.lit("7"),
    )
    out = ev.withColumn("ip", ip)
    return out.filter(cidr_match("10.3.0.0/16", F.col("ip"))).groupBy("ip").agg(
        F.count(F.lit(1)).alias("n")
    )


CIDR_SQL = """
SELECT ip, COUNT(*) AS n FROM (
  SELECT '10.' || CAST(user_id % 256 AS VARCHAR) || '.' ||
         CAST((user_id // 256) % 256 AS VARCHAR) || '.7' AS ip
  FROM events)
WHERE ip LIKE '10.3.%' GROUP BY ip
"""


def misc_funcs(spark, sf):
    """Remaining scalar-function coverage: levenshtein, base64/hex,
    compare, coalesce (SURVEY §2.8)."""
    from zed_spark.functions.misc import compare, from_base64, to_base64, to_hex

    na = read_table(spark, sf, "nation")
    return na.select(
        "n_nationkey",
        F.levenshtein(F.col("n_name"), F.lit("NATION_1")).alias("lev"),
        to_base64(F.col("n_name")).alias("b64"),
        F.decode(from_base64(to_base64(F.col("n_name"))), "utf-8").alias("roundtrip"),
        to_hex(F.col("n_regionkey").cast("long")).alias("hexed"),
        compare(F.col("n_regionkey"), F.lit(2)).alias("cmp"),
        F.coalesce(F.lit(None).cast("string"), F.col("n_name")).alias("co"),
    )


MISC_FUNCS_SQL = """
SELECT n_nationkey,
  levenshtein(n_name, 'NATION_1') AS lev,
  to_base64(CAST(n_name AS BLOB)) AS b64,
  n_name AS roundtrip,
  upper(printf('%x', n_regionkey)) AS hexed,
  CASE WHEN n_regionkey < 2 THEN -1 WHEN n_regionkey > 2 THEN 1 ELSE 0 END AS cmp,
  COALESCE(NULL, n_name) AS co
FROM nation
"""


def grok_parse(spark, sf):
    """grok pattern compilation (SURVEY §2.8 grok.go): parse a
    synthesized log line into typed fields. Also carries the
    JSON-access coverage formerly graded by `json_props` (same events
    table; merged when json_props rotated out of the 50-row graded
    window for zson_read — round-5 VERDICT item 1): the `k` column is
    the parse_zson-analog dynamic property extraction."""
    from zed_spark.functions.parse import grok

    ev = read_table(spark, sf, "events")
    line = F.concat_ws(
        " ",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        F.upper("event_type"),
        F.concat(F.lit("user="), F.col("user_id").cast("string")),
    )
    g = grok("%{TIMESTAMP_ISO8601:when} %{WORD:level} user=%{INT:uid}", line)
    return ev.select("event_id", g.getField("when").alias("when"),
                     g.getField("level").alias("level"),
                     g.getField("uid").cast("long").alias("uid"),
                     F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"))


GROK_SQL = """
SELECT event_id,
  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS when,
  upper(event_type) AS level,
  user_id AS uid,
  CAST(props->>'$.k' AS BIGINT) AS k
FROM events
"""


def zson_read(spark, sf):
    """Native-format on-ramp proof: write nation + derived typed
    columns as ZSON text (docs/formats/zson.md; zio/zsonio), read it
    back with the distributed ZSON reader, round-trip THAT through
    ZNG binary (docs/formats/zng.md; zio/zngio) — the reference's
    default at-rest format — and finally through VNG columnar
    (docs/formats/vng.md; vng/) before grading against the oracle
    computing the same columns straight from parquet. All three
    readers/writers must preserve int, string, float, bool and array
    values exactly for this row to be green."""
    import os
    import tempfile

    from zed_spark.sources.vng import read_vng, write_vng
    from zed_spark.sources.zng import read_zng_fused, write_zng
    from zed_spark.sources.zson import read_zson_fused, write_zson

    na = read_table(spark, sf, "nation")
    src = na.select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        (F.col("n_regionkey") + 0.5).alias("fval"),
        (F.col("n_nationkey") % 2 == 0).alias("even"),
        F.array(F.col("n_nationkey"), F.col("n_regionkey")).alias("arr"),
    )
    tag = os.path.basename(sf.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), f"zson_roundtrip_{tag}")
    write_zson(src, path, single_file=True)
    back = read_zson_fused(spark, path)
    zng_path = os.path.join(tempfile.gettempdir(), f"zng_roundtrip_{tag}.zng")
    write_zng(back, zng_path, single_file=True)
    back = read_zng_fused(spark, zng_path)
    vng_path = os.path.join(tempfile.gettempdir(), f"vng_roundtrip_{tag}.vng")
    write_vng(back, vng_path)
    back = read_vng(spark, vng_path)
    # The driver's canonicalizer (pandas sort over all columns) can't
    # hash raw list cells, so grade a string projection of the array;
    # the raw-array round-trip stays asserted in tests/test_zson.py.
    return back.select(
        "n_nationkey", "n_name", "n_regionkey", "fval", "even",
        F.array_join(
            F.transform(F.col("arr"), lambda x: x.cast("string")), ","
        ).alias("arr"),
    )


ZSON_READ_SQL = """
SELECT n_nationkey, n_name, n_regionkey,
  n_regionkey + 0.5 AS fval,
  n_nationkey % 2 = 0 AS even,
  array_to_string([n_nationkey, n_regionkey], ',') AS arr
FROM nation
"""


# --- zed-language text queries (the reference's primary UX: a query
# string through parse → compile → run, SURVEY §3.1) ------------------

def _zq(text: str):
    from zed_spark.session import ZedSession

    def run(spark, sf):
        return ZedSession(spark).query(text, sf_dir=sf).df

    return run


zq_filter_agg = _zq("from events | where value > 100 | count() by event_type")

ZQ_FILTER_AGG_SQL = """
SELECT event_type, COUNT(*) AS count FROM events WHERE value > 100 GROUP BY event_type
"""

zq_summary = _zq(
    "from lineitem | n:=count(), mx:=max(l_extendedprice), mn:=min(l_quantity) by l_returnflag"
)

ZQ_SUMMARY_SQL = """
SELECT l_returnflag, COUNT(*) AS n, MAX(l_extendedprice) AS mx, MIN(l_quantity) AS mn
FROM lineitem GROUP BY l_returnflag
"""

zq_join = _zq(
    "from lineitem | join (from orders) on l_orderkey=o_orderkey "
    "priority:=o_orderpriority | count() by priority"
)

ZQ_JOIN_SQL = """
SELECT o_orderpriority AS priority, COUNT(*) AS count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

zq_every = _zq("from events | count() by every(1h), event_type | put h:=int64(ts) | drop ts")

# runtime-RECURSIVE user function (reference interprets calls at
# runtime — runtime/sam/expr/ztests/udf.yaml): the call graph reaches
# itself, so the call compiles to the row-level AST interpreter
# (lang/interp.py) instead of inline macro expansion
zq_recursive_fn = _zq(
    "func fib(x): ( x <= 1 ? x : fib(x-1) + fib(x-2) ) "
    "from events | put k:=user_id % 12 | n:=count() by k "
    "| put f:=fib(k) | sort k"
)

ZQ_RECURSIVE_SQL = """
WITH RECURSIVE fib(i, a, b) AS (
  SELECT 0, 0::BIGINT, 1::BIGINT
  UNION ALL
  SELECT i + 1, b, a + b FROM fib WHERE i < 11
),
grp AS (
  SELECT user_id % 12 AS k, COUNT(*) AS n FROM events GROUP BY user_id % 12
)
SELECT g.k AS k, g.n AS n, f.a AS f
FROM grp g JOIN fib f ON f.i = g.k
ORDER BY k
"""

ZQ_EVERY_SQL = """
SELECT event_type, COUNT(*) AS count,
  CAST(epoch_ns(date_trunc('hour', ts)) AS BIGINT) AS h
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def lake_scan_range(spark: SparkSession, sf: str) -> DataFrame:
    """Graded lake query (round-4 VERDICT item 8): load the orders
    table into a pool keyed on o_orderdate (Pool.load range-
    partitions + sorts by key, so every object file covers a
    disjoint key range), then scan a half-year key range. The filter
    reaches the parquet footers of the pool objects, so out-of-range
    files are skipped — the reference's seek-index object pruning
    (lake/pool.go Lister/Slicer) expressed as parquet min/max stats.
    The pool is built once per sf under /tmp and reused."""
    import os
    import re as _re2
    from datetime import datetime

    from zed_spark.sources.lake import Lake

    tag = _re2.sub(r"\W", "_", sf)
    lake = Lake(spark, f"/tmp/zed_spark_lake_grade{tag}")
    if "orders" in lake.pools():
        pool = lake.pool("orders")
    else:
        pool = lake.create_pool("orders", "o_orderdate")
        pool.load(read_table(spark, sf, "orders"), message="grade fixture")
    lo = datetime(1995, 1, 1)
    hi = datetime(1995, 6, 30, 23, 59, 59)
    return pool.scan_range(lo, hi).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


LAKE_SCAN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <= TIMESTAMP '1995-06-30 23:59:59'
"""
